"""Device-batched RNNT beam search vs the host oracle.

The host RNNTBeamDecoder (models/rnnt.py) replicates the reference's
torchaudio RNNTBeamSearch usage (reference recognition.py:122-133) and is
golden-tested end to end; the device beam (models/rnnt_beam.py) must make
the exact same decisions while batching all streams x hypotheses into one
jitted step.  These tests compare them chunk by chunk on random models —
best hypothesis, full beam contents, carried state across chunks, segment
resets, and the active-mask hold.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from asr_streaming_tpu.models.rnnt import (
    RNNTBeamDecoder, RNNTConfig, init_rnnt_params,
)
from asr_streaming_tpu.models.rnnt_beam import (
    VALID_FLOOR, init_beam_state, rnnt_beam_chunk_step,
)


def _setup(seed: int = 0, vocab: int = 32):
    cfg = RNNTConfig.tiny(vocab_size=vocab)
    params = init_rnnt_params(jax.random.PRNGKey(seed), cfg)
    return cfg, params


def _random_encodings(cfg, key, batch, chunks, frames=4, scale=1.0):
    return np.asarray(jax.random.normal(
        key, (batch, chunks, frames, cfg.encoding_dim)) * scale,
        np.float32)


def _host_tokens(hypos):
    return [tuple(h.tokens) for h in hypos]


def _device_valid(state, b):
    """(token tuple, score) per live beam slot of stream b."""
    out = []
    for w in range(state.scores.shape[1]):
        sc = float(state.scores[b, w])
        if sc > VALID_FLOOR:
            n = int(state.lengths[b, w])
            out.append((tuple(int(t) for t in state.tokens[b, w, :n]), sc))
    return out


@pytest.mark.parametrize("width", [1, 4])
def test_device_beam_matches_host_oracle(width):
    cfg, params = _setup(seed=0)
    B, chunks = 3, 4
    enc = _random_encodings(cfg, jax.random.PRNGKey(1), B, chunks)

    host = RNNTBeamDecoder(params, cfg, beam_width=width)
    host_hypos = [None] * B
    dstate = init_beam_state(cfg, B, width, cap=32)
    reset = jnp.ones((B,), bool)

    for c in range(chunks):
        dstate, best_toks, best_len = rnnt_beam_chunk_step(
            params, cfg, jnp.asarray(enc[:, c]), dstate, reset=reset)
        reset = jnp.zeros((B,), bool)
        for b in range(B):
            host_hypos[b] = host.step_chunk(enc[b, c], host_hypos[b])
            want = list(host_hypos[b][0].tokens)
            got = [int(t) for t in best_toks[b, :int(best_len[b])]]
            assert got == want, (c, b, got, want)
            # full beam: same hypothesis set, same scores
            dev = _device_valid(dstate, b)
            host_set = {t: h.score for t, h in
                        zip(_host_tokens(host_hypos[b]), host_hypos[b])}
            assert {t for t, _ in dev} == set(host_set), (c, b)
            for t, sc in dev:
                assert sc == pytest.approx(host_set[t], abs=1e-3), (c, b, t)


def test_reset_matches_fresh_host_beam():
    cfg, params = _setup(seed=2)
    B, chunks = 2, 3
    enc = _random_encodings(cfg, jax.random.PRNGKey(3), B, chunks)
    width = 4

    host = RNNTBeamDecoder(params, cfg, beam_width=width)
    dstate = init_beam_state(cfg, B, width, cap=32)
    dstate, _, _ = rnnt_beam_chunk_step(
        params, cfg, jnp.asarray(enc[:, 0]), dstate,
        reset=jnp.ones((B,), bool))
    # segment boundary on stream 0 only: its beam restarts, stream 1 carries
    reset = jnp.asarray([True, False])
    h0 = None                                          # fresh (stream 0)
    h1 = host.step_chunk(enc[1, 0], None)              # carried (stream 1)
    for c in range(1, chunks):
        dstate, best_toks, best_len = rnnt_beam_chunk_step(
            params, cfg, jnp.asarray(enc[:, c]), dstate, reset=reset)
        reset = jnp.zeros((B,), bool)
        h0 = host.step_chunk(enc[0, c], h0)
        h1 = host.step_chunk(enc[1, c], h1)
        for b, h in ((0, h0), (1, h1)):
            want = list(h[0].tokens)
            got = [int(t) for t in best_toks[b, :int(best_len[b])]]
            assert got == want, (c, b, got, want)


def test_active_mask_holds_state():
    cfg, params = _setup(seed=4)
    B = 2
    enc = _random_encodings(cfg, jax.random.PRNGKey(5), B, 3)
    width = 3

    host = RNNTBeamDecoder(params, cfg, beam_width=width)
    dstate = init_beam_state(cfg, B, width, cap=32)
    dstate, _, _ = rnnt_beam_chunk_step(
        params, cfg, jnp.asarray(enc[:, 0]), dstate,
        reset=jnp.ones((B,), bool))
    before = jax.tree.map(np.asarray, dstate)

    # stream 1 inactive: garbage encodings must not perturb it
    dstate, best_toks, best_len = rnnt_beam_chunk_step(
        params, cfg, jnp.asarray(enc[:, 1]), dstate,
        active=jnp.asarray([True, False]))
    h0 = host.step_chunk(enc[0, 0], None)
    h0 = host.step_chunk(enc[0, 1], h0)
    got = [int(t) for t in best_toks[0, :int(best_len[0])]]
    assert got == list(h0[0].tokens)
    for name, new, old in zip(before._fields,
                              jax.tree.map(np.asarray, dstate), before):
        axis = 1 if name in ("pred_h", "pred_c") else 0
        np.testing.assert_array_equal(
            np.take(new, 1, axis=axis), np.take(old, 1, axis=axis),
            err_msg=name)


def test_token_capacity_clamps():
    """Overflowing the CAP token buffer drops tokens but never corrupts."""
    cfg, params = _setup(seed=6)
    dstate = init_beam_state(cfg, 1, 2, cap=4)
    enc = _random_encodings(cfg, jax.random.PRNGKey(7), 1, 8, scale=3.0)
    reset = jnp.ones((1,), bool)
    for c in range(8):
        dstate, best_toks, best_len = rnnt_beam_chunk_step(
            params, cfg, jnp.asarray(enc[:, c]), dstate, reset=reset)
        reset = jnp.zeros((1,), bool)
    assert int(best_len[0]) <= 4
    assert np.all(np.asarray(best_toks) >= 0)
    assert np.all(np.asarray(best_toks) < cfg.vocab_size)
