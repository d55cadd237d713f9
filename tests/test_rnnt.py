"""RNNT model: shapes, streaming invariants, greedy vs beam consistency."""

import numpy as np
import jax
import jax.numpy as jnp

from asr_streaming_tpu.models.rnnt import (
    RNNTConfig, RNNTBeamDecoder, detokenize_pieces, init_rnnt_params,
    init_rnnt_state, predictor_step, rnnt_greedy_stream_step,
    transcriber_step, joiner,
)

CFG = RNNTConfig.tiny()


def _feats(B, seed=0):
    # chunk reducing to segment(4) + rc(1) frames: T_mel = 20
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal((B, 20, CFG.n_mels)),
                       dtype=jnp.float32)


def test_transcriber_shapes_and_streaming():
    params = init_rnnt_params(jax.random.PRNGKey(0), CFG)
    state = init_rnnt_state(CFG, 2)
    enc, enc_state = transcriber_step(params, CFG, _feats(2), state.encoder)
    assert enc.shape == (2, 4, CFG.encoding_dim)
    enc2, _ = transcriber_step(params, CFG, _feats(2, 1), enc_state)
    assert not np.allclose(np.asarray(enc), np.asarray(enc2))


def test_greedy_decode_runs_and_masks_inactive():
    params = init_rnnt_params(jax.random.PRNGKey(1), CFG)
    state = init_rnnt_state(CFG, 3)
    active = jnp.asarray([True, True, False])
    out = rnnt_greedy_stream_step(params, CFG, _feats(3), state, active)
    assert out.tokens.shape == (3, 4 * CFG.max_symbols_per_frame)
    # inactive stream: untouched state, no emissions
    assert int(out.n_emitted[2]) == 0
    np.testing.assert_array_equal(np.asarray(out.state.predictor.h[:, 2]),
                                  np.asarray(state.predictor.h[:, 2]))
    np.testing.assert_array_equal(
        np.asarray(out.state.encoder.lc_k[:, 2]),
        np.asarray(state.encoder.lc_k[:, 2]))


def test_greedy_cross_chunk_matches_oracle():
    """Device greedy over SEVERAL chunks must equal a per-frame Python
    oracle that carries the predictor the torchaudio way (state + cached
    output per consumed token).  Regression: the step used to store the
    predictor state from AFTER consuming last_token and then re-consume
    it at the next chunk start, conditioning the joiner on
    [..., last, last] — emissions died after the first chunk that
    produced a token (invisible to single-chunk tests, and to random-
    weight multi-chunk runs only checking that SOMETHING is emitted)."""
    params = init_rnnt_params(jax.random.PRNGKey(3), CFG)
    chunks = [_feats(1, seed=10 + c) for c in range(3)]

    # device path
    state = init_rnnt_state(CFG, 1)
    device_toks = []
    encs = []
    for f in chunks:
        out = rnnt_greedy_stream_step(params, CFG, f, state)
        state = out.state
        device_toks += [int(t) for t in np.asarray(out.tokens)[0]
                        if t != CFG.blank]
        encs.append(np.asarray(out.encodings)[0])

    # oracle: frame loop with (state-after-consume, cached out) carry
    from asr_streaming_tpu.models.rnnt import PredictorState
    pstate = PredictorState(
        h=jnp.zeros((CFG.pred_layers, 1, CFG.pred_hidden)),
        c=jnp.zeros((CFG.pred_layers, 1, CFG.pred_hidden)))
    pout, pstate = predictor_step(
        params, jnp.full((1,), CFG.blank, jnp.int32), pstate)
    oracle_toks = []
    for enc in np.concatenate(encs, axis=0):
        for _ in range(CFG.max_symbols_per_frame):
            logits = np.asarray(joiner(params, jnp.asarray(enc)[None],
                                       pout[:1] if pout.ndim == 2
                                       else pout))
            tok = int(logits[0].argmax())
            if tok == CFG.blank:
                break
            oracle_toks.append(tok)
            pout, pstate = predictor_step(
                params, jnp.asarray([tok], jnp.int32), pstate)

    assert device_toks == oracle_toks
    assert len(oracle_toks) > 0, "degenerate fixture: nothing emitted"


def test_greedy_batch_invariance():
    params = init_rnnt_params(jax.random.PRNGKey(2), CFG)
    f = _feats(3, seed=5)
    solo = rnnt_greedy_stream_step(params, CFG, f[:1],
                                   init_rnnt_state(CFG, 1))
    batch = rnnt_greedy_stream_step(params, CFG, f,
                                    init_rnnt_state(CFG, 3))
    np.testing.assert_array_equal(np.asarray(batch.tokens[0]),
                                  np.asarray(solo.tokens[0]))


def test_beam_contains_greedy_or_better():
    params = init_rnnt_params(jax.random.PRNGKey(3), CFG)
    state = init_rnnt_state(CFG, 1)
    f = _feats(1, seed=7)
    enc, _ = transcriber_step(params, CFG, f, state.encoder)

    beam = RNNTBeamDecoder(params, CFG, beam_width=4)
    hypos = beam.step_chunk(np.asarray(enc[0]))
    assert len(hypos) >= 1
    assert all(h.tokens is not None for h in hypos)
    # scores sorted descending
    scores = [h.score for h in hypos]
    assert scores == sorted(scores, reverse=True)
    # hypothesis carries across chunks (streaming semantics)
    hypos2 = beam.step_chunk(np.asarray(enc[0]), hypos)
    assert len(hypos2) >= 1


def test_detokenize_pieces():
    pieces = ["<blk>", "▁he", "llo", "▁world"]
    assert detokenize_pieces([1, 2, 3], pieces) == " hello world"
    assert detokenize_pieces([1, 2, 3], pieces, lstrip=True) == "hello world"
