"""Streaming-features RNNT training: the serving featurizer as a
training-time featurizer (train == serve by construction).

The EN serving tick computes mel PER CHUNK with center=True padding
(models/serving.py:353-391, parity with torchaudio's streaming pipeline);
training on the offline full-utterance featurizer therefore leaves a
chunk-edge feature skew (tests/test_en_frontend_chunks.py).  These tests
pin the training-side equivalents:

  - ``streaming_features`` must reproduce EXACTLY what a chunk-by-chunk
    serving-style loop computes (context carry, center padding, trim);
  - ``transcriber_forward_streaming`` must equal the DECODE path's
    encoder (rnnt_greedy_stream_step's encodings) frame for frame;
  - the loss path accepts the 4-D chunk features and trains.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import optax

from asr_streaming_tpu.models.rnnt import (
    RNNTConfig, init_rnnt_params, init_rnnt_state, rnnt_greedy_stream_step,
)
from asr_streaming_tpu.ops.frontend import MelConfig, log_mel, make_mel_params
from asr_streaming_tpu.train.rnnt import (
    RNNTBatch, make_rnnt_train_step, streaming_features,
    transcriber_forward_streaming,
)
from asr_streaming_tpu.utils.audio import EN_AUDIO

CFG = RNNTConfig.tiny()
MEL = dataclasses.replace(MelConfig.for_english(), n_mels=CFG.n_mels)
WANT = (CFG.emformer.segment_length
        + CFG.emformer.right_context_length) * 4
SEG = EN_AUDIO.segment_length
BUF = EN_AUDIO.buffer_length


def _waves(B=2, chunks=5, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((B, chunks * SEG)).astype(np.float32) * 0.1


def test_streaming_features_match_serving_assembly():
    """Reference loop with the serving tick's exact wave assembly
    (_assemble_wave semantics: ctx zeroed on new stream, then the tail of
    the previous segment) must match the vectorized featurizer."""
    mel_params = make_mel_params(MEL)
    waves = _waves()
    got = np.asarray(streaming_features(
        mel_params, MEL, jnp.asarray(waves), SEG, BUF, WANT))

    B, n = waves.shape
    for b in range(B):
        ctx = np.zeros(BUF, np.float32)
        for c in range(n // SEG):
            seg = waves[b, c * SEG:(c + 1) * SEG]
            wave = np.concatenate([ctx, seg])
            ctx = seg[-BUF:]
            ref = np.asarray(log_mel(mel_params, MEL,
                                     jnp.asarray(wave)[None]))[0, :WANT]
            np.testing.assert_allclose(got[b, c], ref, rtol=1e-5,
                                       atol=1e-5)


def test_streaming_forward_matches_decode_encoder():
    """transcriber_forward_streaming must equal the greedy decode step's
    encodings — the exact arrays the serving tick buffers for the host
    beam — chunk for chunk."""
    mel_params = make_mel_params(MEL)
    params = init_rnnt_params(jax.random.PRNGKey(0), CFG)
    waves = _waves(B=2, chunks=4, seed=1)
    feats = streaming_features(mel_params, MEL, jnp.asarray(waves),
                               SEG, BUF, WANT)
    enc_train = np.asarray(
        transcriber_forward_streaming(params, CFG, feats))

    state = init_rnnt_state(CFG, 2)
    encs = []
    for c in range(feats.shape[1]):
        out = rnnt_greedy_stream_step(params, CFG, feats[:, c], state,
                                      active=jnp.ones((2,), bool))
        state = out.state
        encs.append(np.asarray(out.encodings))
    enc_serve = np.concatenate(encs, axis=1)
    np.testing.assert_allclose(enc_train, enc_serve, rtol=2e-4, atol=2e-4)


def test_streaming_batch_trains():
    """4-D chunk features flow through rnnt_loss_fn/make_rnnt_train_step
    (feat_lens counts valid chunks) and the loss decreases."""
    mel_params = make_mel_params(MEL)
    params = init_rnnt_params(jax.random.PRNGKey(1), CFG)
    waves = _waves(B=2, chunks=4, seed=2)
    feats = streaming_features(mel_params, MEL, jnp.asarray(waves),
                               SEG, BUF, WANT)
    batch = RNNTBatch(
        feats=feats,
        feat_lens=jnp.full((2,), feats.shape[1], jnp.int32),
        targets=jnp.asarray([[0, 1], [2, 3]], jnp.int32),
        target_lens=jnp.full((2,), 2, jnp.int32))
    optimizer = optax.adam(2e-3)
    step = jax.jit(make_rnnt_train_step(CFG, optimizer))
    opt_state = optimizer.init(params)
    losses = []
    for _ in range(10):
        params, opt_state, loss = step(params, opt_state, batch)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.9
