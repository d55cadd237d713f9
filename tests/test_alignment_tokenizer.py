"""Forced alignment + tokenizer tests."""

import numpy as np
import pytest

from asr_streaming_tpu.decode.alignment import (
    ctc_trellis, backtrack, force_align, merge_words, Segment,
)
from asr_streaming_tpu.text.tokenizer import refactor_tone_mark, tokenize


def _peaky(path, V=6, hot=-0.1, cold=-8.0):
    em = np.full((len(path), V), cold, np.float32)
    for t, tok in enumerate(path):
        em[t, tok] = hot
    return em


def test_force_align_recovers_obvious_path():
    # NB the reference trellis scores 'stay' with the blank probability
    # (alignment.py:44-51), so the clean test path interleaves blanks.
    # frames:   x - - y | -      tokens: x y |
    em = _peaky([2, 0, 0, 3, 1, 0], V=4)
    token_ids = [2, 3, 1]
    toks, words = force_align(em, token_ids, ["x", "y", "|"],
                              audio_seconds=0.6)
    labels = [t.label for t in toks]
    assert labels == ["x", "y", "|"]
    starts = [t.start for t in toks]
    assert starts == sorted(starts)
    assert toks[0].start == pytest.approx(0.0)
    # y's span begins at frame 3 of 6 (0.3 s)
    assert toks[1].start == pytest.approx(3 / 6 * 0.6)
    assert len(words) == 1 and words[0].label == "xy"


def test_trellis_monotone_and_shapes():
    em = np.log(np.random.default_rng(0).dirichlet(
        np.ones(5), size=12).astype(np.float32))
    import jax.numpy as jnp
    tr = np.asarray(ctc_trellis(jnp.asarray(em), jnp.asarray([2, 3])))
    assert tr.shape == (13, 3)
    assert np.isinf(tr[0, 1]) and tr[0, 1] < 0     # -inf top-right corner
    assert np.isinf(tr[-1, 0]) and tr[-1, 0] > 0   # +inf forced consume


def test_merge_words_weighted_score():
    segs = [Segment("a", 0, 1, 1.0), Segment("b", 1, 3, 0.5),
            Segment("|", 3, 4, 0.9)]
    words = merge_words(segs)
    assert len(words) == 1
    assert words[0].label == "ab"
    assert words[0].score == pytest.approx((1.0 * 1 + 0.5 * 2) / 3)


def test_refactor_tone_mark():
    # tone groups follow the reference TONE_CHARS table order:
    # huyền -> 1_, sắc -> 2_ (text.py:8-10)
    assert refactor_tone_mark("già") == "gia1_"
    assert refactor_tone_mark("quýt") == "quyt2_"
    assert refactor_tone_mark("abc") == "abc"


def test_tokenize_basic_and_oov():
    vocab = ["-", "|", "xin", "chào", "a", "b", "c", "<<", ">>", "▁"]
    lexicon = {"xin": ["xin", "|"], "chào": ["chào", "|"]}
    toks = tokenize("Xin chào", vocab, lexicon)
    assert toks == ["xin", "|", "chào"]
    # OOV word split into wrapped characters
    toks = tokenize("xin abc", vocab, lexicon)
    assert "<<" in toks and ">>" in toks
    assert toks.count("▁") == 2  # a▁b▁c


def test_tokenize_gi_qu_special():
    # 'gin' -> remainder 'in' is a special subword -> delimiter inserted
    vocab = ["-", "|", "g", "in", "gin", "▁", "<<", ">>"]
    lexicon = {"gin": ["g", "in", "|"]}
    toks = tokenize("gin", vocab, lexicon)
    assert toks == ["g", "▁", "in"]
