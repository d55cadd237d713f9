"""High-level model API.

The reference's model-facing surface is ``LightningASR`` (reference:
lightspeech/models/recognition.py:136-217): checkpoint load, batched
``stream(speeches, sr, states)``, ``init_state()``, and offline
``force_alignment``.  This wraps the functional pieces into the same
shape for library users; the serving path uses the functional API
directly (models/serving.py).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from asr_streaming_tpu.models.asr import (
    ASRConfig, asr_offline_logprobs, asr_stream_step, frame_waveform,
    init_asr_params, init_asr_state,
)
from asr_streaming_tpu.models.emformer import EmformerState
from asr_streaming_tpu.decode.alignment import force_align
from asr_streaming_tpu.decode.greedy import greedy_search_full
from asr_streaming_tpu.text.tokenizer import tokenize
from asr_streaming_tpu.text.vocab import placeholder_vocab
from asr_streaming_tpu.utils.checkpoint import load_params


class ASRModel:
    """Checkpoint-backed Vietnamese streaming/offline ASR."""

    def __init__(self, cfg: Optional[ASRConfig] = None,
                 checkpoint: Optional[str] = None,
                 vocab: Optional[Sequence[str]] = None,
                 lexicon: Optional[Dict[str, List[str]]] = None,
                 seed: int = 0, use_corpus: bool = True):
        import dataclasses

        from asr_streaming_tpu.text.corpus import load_corpus

        self.cfg = cfg or ASRConfig.vietnamese()
        if vocab is None and use_corpus:
            # resolve the production corpus (804-token vocab, reference
            # lightspeech/datas/text.py:27-38); the CTC head is sized by
            # the served vocab
            cvocab, clex = load_corpus()
            if cvocab is not None:
                vocab = cvocab
                lexicon = lexicon or clex
                if cfg is None:
                    self.cfg = dataclasses.replace(
                        self.cfg, encoder=dataclasses.replace(
                            self.cfg.encoder, vocab_size=len(cvocab)))
        self.params = init_asr_params(jax.random.PRNGKey(seed), self.cfg)
        if checkpoint:
            self.params = load_params(checkpoint, like=self.params)
        self.vocab = list(vocab) if vocab else placeholder_vocab(
            self.cfg.encoder.vocab_size)
        self.lexicon = lexicon or {}
        # params as explicit jit args (closure-captured arrays get
        # serialized into remote compile requests)
        self._stream_step = jax.jit(
            lambda p, w, s: asr_stream_step(p, self.cfg, w, s))

    # ------------------------------------------------------------ streaming

    def init_state(self, batch_size: int = 1) -> EmformerState:
        """(reference recognition.py:207-217)"""
        return init_asr_state(self.cfg, batch_size)

    def stream(self, chunks: np.ndarray, state: EmformerState
               ) -> Tuple[np.ndarray, EmformerState]:
        """One decode step over [B, chunk_length] audio windows ->
        (log_probs [B, U, V], new_state)  (reference recognition.py:191-204)
        """
        out = self._stream_step(self.params, jnp.asarray(chunks, jnp.float32),
                                state)
        return np.asarray(out.log_probs), out.state

    # -------------------------------------------------------------- offline

    def emissions(self, waveform: np.ndarray) -> np.ndarray:
        """Full-utterance CTC log-probs [T, V] via the chunk scan."""
        chunks = frame_waveform(np.asarray(waveform, np.float32),
                                self.cfg.audio)
        logp = asr_offline_logprobs(self.params, self.cfg,
                                    jnp.asarray(chunks)[:, None])
        return np.asarray(logp[0])

    def transcribe(self, waveform: np.ndarray) -> str:
        """Offline greedy transcription."""
        text, _ = greedy_search_full(self.emissions(waveform), self.vocab)
        return text

    def force_alignment(self, waveform: np.ndarray, transcript: str):
        """Token/word segments for a known transcript
        (reference recognition.py:162-189)."""
        emission = self.emissions(waveform)
        tokens = tokenize(transcript, self.vocab, self.lexicon)
        index = {t: i for i, t in enumerate(self.vocab)}
        token_ids = [index[t] for t in tokens if t in index]
        audio_seconds = len(waveform) / self.cfg.audio.sample_rate
        return force_align(emission, token_ids,
                           [self.vocab[i] for i in token_ids],
                           audio_seconds)
