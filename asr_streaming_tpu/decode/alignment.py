"""CTC forced alignment: trellis DP as a jit-able lax.scan + host backtrack.

Re-design of the reference's Python-loop trellis (reference:
streaming_decoder/lightspeech/utils/alignment.py:26-153): the O(T*N)
forward DP runs as one ``lax.scan`` over frames (vectorized over tokens —
MXU/VPU friendly, batched if needed), while the O(T) backtrack and the
token/word merge stay host-side (tiny, sequential by nature).
"""

from __future__ import annotations

import dataclasses
from typing import List, Sequence

import numpy as np
import jax
import jax.numpy as jnp


@dataclasses.dataclass
class Segment:
    label: str
    start: float
    end: float
    score: float

    @property
    def length(self) -> float:
        return self.end - self.start


def ctc_trellis(emission: jax.Array, tokens: jax.Array,
                blank: int = 0) -> jax.Array:
    """Forward max-trellis [T+1, N+1] (reference get_trellis semantics).

    trellis[t+1, j+1] = max(trellis[t, j+1] + em[t, blank],     # stay
                            trellis[t, j]   + em[t, tokens[j]]) # advance
    """
    T = emission.shape[0]
    N = tokens.shape[0]
    em_tok = emission[:, tokens]            # [T, N]
    em_blank = emission[:, blank]           # [T]

    row0 = jnp.concatenate([jnp.zeros(1), jnp.full((N,), -jnp.inf)])

    def step(prev, inputs):
        et, eb = inputs                     # [N], scalar
        stay = prev[1:] + eb
        change = prev[:-1] + et
        new_tail = jnp.maximum(stay, change)
        head = prev[0] + eb                 # all-blank prefix
        row = jnp.concatenate([head[None], new_tail])
        return row, row

    _, rows = jax.lax.scan(step, row0, (em_tok, em_blank))
    trellis = jnp.concatenate([row0[None], rows], axis=0)
    # Force the path to consume all tokens: the all-blank column is +inf in
    # the last N rows (reference alignment.py:44 ``trellis[-N:, 0] = inf``),
    # making 'advance' win at the boundary during backtrack.
    rows_idx = jnp.arange(T + 1)
    col0 = jnp.where(rows_idx > T - N, jnp.inf, trellis[:, 0])
    return trellis.at[:, 0].set(col0)


def backtrack(trellis: np.ndarray, emission: np.ndarray,
              tokens: Sequence[int], blank: int = 0) -> List[tuple]:
    """Host backtrack -> [(token_index, time_index, prob)] (reference
    backtrack, alignment.py:57-97)."""
    trellis = np.asarray(trellis)
    emission = np.asarray(emission)
    j = trellis.shape[1] - 1
    t_start = int(np.argmax(trellis[:, j]))

    path = []
    for t in range(t_start, 0, -1):
        stayed = trellis[t - 1, j] + emission[t - 1, blank]
        changed = trellis[t - 1, j - 1] + emission[t - 1, tokens[j - 1]]
        prob = float(np.exp(
            emission[t - 1, tokens[j - 1] if changed > stayed else blank]))
        path.append((j - 1, t - 1, prob))
        if changed > stayed:
            j -= 1
            if j == 0:
                break
    else:
        raise ValueError("Failed to align")
    return path[::-1]


def merge_tokens(path: List[tuple], tokens: Sequence[str],
                 feature_length: int, audio_length: float) -> List[Segment]:
    """Collapse path points into per-token segments (alignment.py:100-127)."""
    segments, i1 = [], 0
    while i1 < len(path):
        i2 = i1
        while i2 < len(path) and path[i1][0] == path[i2][0]:
            i2 += 1
        score = sum(p[2] for p in path[i1:i2]) / (i2 - i1)
        start = path[i1][1] / feature_length * audio_length
        end = (path[i2 - 1][1] + 1) / feature_length * audio_length
        segments.append(Segment(tokens[path[i1][0]], start, end, score))
        i1 = i2
    return segments


def merge_words(segments: List[Segment], silence: str = "|") -> List[Segment]:
    """Group token segments into words at silence boundaries
    (alignment.py:130-153)."""
    words, i1, i2 = [], 0, 0
    while i1 < len(segments):
        if i2 >= len(segments) or segments[i2].label == silence:
            if i1 != i2:
                segs = segments[i1:i2]
                word = "".join(s.label for s in segs)
                total = sum(s.length for s in segs)
                score = (sum(s.score * s.length for s in segs) / total
                         if total > 0 else 0.0)
                words.append(Segment(word, segs[0].start, segs[-1].end,
                                     score))
            i1 = i2 + 1
            i2 = i1
        else:
            i2 += 1
    return words


def force_align(emission: np.ndarray, token_ids: Sequence[int],
                token_labels: Sequence[str], audio_seconds: float,
                blank: int = 0, silence: str = "|"):
    """Full pipeline (reference LightningASR.force_alignment,
    recognition.py:162-189): returns (token_segments, word_segments)."""
    tokens = jnp.asarray(np.asarray(token_ids, np.int32))
    trellis = np.asarray(ctc_trellis(jnp.asarray(emission), tokens, blank))
    path = backtrack(trellis, emission, list(token_ids), blank)
    token_segments = merge_tokens(path, list(token_labels),
                                  emission.shape[0], audio_seconds)
    word_segments = merge_words(token_segments, silence)
    return token_segments, word_segments
