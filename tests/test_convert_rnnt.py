"""EN (torchaudio emformer_rnnt_base) checkpoint converter.

Builds a synthetic torch state dict with the exact torchaudio module
names/shapes (reference loads the real one at recognition.py:112-115),
converts it, and verifies:

  * structural round-trip: the converted tree loads via
    utils.checkpoint.load_params(like=init_rnnt_params(cfg)),
  * numeric predictor parity against an independent NumPy oracle of
    torchaudio's _CustomLSTM equations (gates = g_norm(x2g+p2g); order
    i,f,g,o; carried cell is c_norm(c)) — this pins the gate order and
    LN placement the converter relies on,
  * the full greedy stream step runs with converted params.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from asr_streaming_tpu.models.emformer import EmformerConfig
from asr_streaming_tpu.models.rnnt import (
    PredictorState, RNNTConfig, init_rnnt_params, init_rnnt_state,
    predictor_step, rnnt_greedy_stream_step,
)
from asr_streaming_tpu.tools.convert_rnnt_checkpoint import (
    convert_rnnt_state_dict,
)

L, D, H, FFN = 2, 16, 4, 24
N_MELS, TRED_IN = 8, 4
V, EMB, HID, ENC, PL = 12, 8, 8, 16, 2
EPS = 1e-3

CFG = RNNTConfig(
    n_mels=N_MELS, input_linear_dim=TRED_IN, d_model=D, encoding_dim=ENC,
    vocab_size=V, blank=V - 1, pred_embed_dim=EMB, pred_hidden=HID,
    pred_layers=PL, lstm_layer_norm=True, lstm_ln_eps=EPS,
    emformer=EmformerConfig(
        d_model=D, num_heads=H, ffn_dim=FFN, num_layers=L,
        segment_length=4, left_context_length=8, right_context_length=1,
        max_memory_size=0))


@pytest.fixture(scope="module")
def synthetic_sd():
    g = torch.Generator().manual_seed(0)

    def t(*shape):
        return torch.randn(*shape, generator=g) * 0.3

    sd = {"transcriber.input_linear.weight": t(TRED_IN, N_MELS)}
    for i in range(L):
        p = f"transcriber.transformer.emformer_layers.{i}."
        sd.update({
            p + "attention.emb_to_key_value.weight": t(2 * D, D),
            p + "attention.emb_to_key_value.bias": t(2 * D),
            p + "attention.emb_to_query.weight": t(D, D),
            p + "attention.emb_to_query.bias": t(D),
            p + "attention.out_proj.weight": t(D, D),
            p + "attention.out_proj.bias": t(D),
            p + "layer_norm_input.weight": 1 + 0.1 * t(D),
            p + "layer_norm_input.bias": 0.1 * t(D),
            p + "pos_ff.0.weight": 1 + 0.1 * t(D),
            p + "pos_ff.0.bias": 0.1 * t(D),
            p + "pos_ff.1.weight": t(FFN, D),
            p + "pos_ff.1.bias": t(FFN),
            p + "pos_ff.4.weight": t(D, FFN),
            p + "pos_ff.4.bias": t(D),
            p + "layer_norm_output.weight": 1 + 0.1 * t(D),
            p + "layer_norm_output.bias": 0.1 * t(D),
        })
    sd.update({
        "transcriber.output_linear.weight": t(ENC, D),
        "transcriber.output_linear.bias": t(ENC),
        "transcriber.layer_norm.weight": 1 + 0.1 * t(ENC),
        "transcriber.layer_norm.bias": 0.1 * t(ENC),
        "predictor.embedding.weight": t(V, EMB),
        "predictor.input_layer_norm.weight": 1 + 0.1 * t(EMB),
        "predictor.input_layer_norm.bias": 0.1 * t(EMB),
        "predictor.linear.weight": t(ENC, HID),
        "predictor.linear.bias": t(ENC),
        "predictor.output_layer_norm.weight": 1 + 0.1 * t(ENC),
        "predictor.output_layer_norm.bias": 0.1 * t(ENC),
        "joiner.linear.weight": t(V, ENC),
        "joiner.linear.bias": t(V),
    })
    for i in range(PL):
        p = f"predictor.lstm_layers.{i}."
        in_dim = EMB if i == 0 else HID
        sd.update({
            p + "x2g.weight": t(4 * HID, in_dim),      # no bias under LN
            p + "p2g.weight": t(4 * HID, HID),         # never has bias
            p + "g_norm.weight": 1 + 0.1 * t(4 * HID),
            p + "g_norm.bias": 0.1 * t(4 * HID),
            p + "c_norm.weight": 1 + 0.1 * t(HID),
            p + "c_norm.bias": 0.1 * t(HID),
        })
    return sd


@pytest.fixture(scope="module")
def converted(synthetic_sd):
    return convert_rnnt_state_dict(synthetic_sd, num_layers=L,
                                   pred_layers=PL)


def test_structural_roundtrip(converted, tmp_path):
    from asr_streaming_tpu.utils.checkpoint import load_params, save_params

    like = init_rnnt_params(jax.random.PRNGKey(0), CFG)
    # save/load against the init tree: every leaf must exist with the
    # right shape
    p = tmp_path / "en.npz"
    save_params(str(p), converted)
    loaded = load_params(str(p), like=like)
    flat_like = jax.tree_util.tree_leaves_with_path(like)
    flat_loaded = {jax.tree_util.keystr(k): v for k, v
                   in jax.tree_util.tree_leaves_with_path(loaded)}
    for k, leaf in flat_like:
        ks = jax.tree_util.keystr(k)
        assert ks in flat_loaded
        assert flat_loaded[ks].shape == leaf.shape, ks


def _numpy_predictor_oracle(sd, tokens, h, c):
    """torchaudio _Predictor for one timestep, straight from the module
    equations (embedding -> input LN -> LN-LSTM stack -> linear -> LN)."""
    def ln(x, w, b, eps):
        mu = x.mean(-1, keepdims=True)
        var = ((x - mu) ** 2).mean(-1, keepdims=True)
        return (x - mu) / np.sqrt(var + eps) * w + b

    def sigmoid(x):
        return 1.0 / (1.0 + np.exp(-x))

    e = {k: v.numpy() for k, v in sd.items()}
    x = e["predictor.embedding.weight"][tokens]
    x = ln(x, e["predictor.input_layer_norm.weight"],
           e["predictor.input_layer_norm.bias"], 1e-5)
    new_h, new_c = [], []
    for i in range(PL):
        p = f"predictor.lstm_layers.{i}."
        gates = x @ e[p + "x2g.weight"].T + h[i] @ e[p + "p2g.weight"].T
        gates = ln(gates, e[p + "g_norm.weight"], e[p + "g_norm.bias"], EPS)
        ii, ff, gg, oo = np.split(gates, 4, axis=-1)
        ci = sigmoid(ff) * c[i] + sigmoid(ii) * np.tanh(gg)
        ci = ln(ci, e[p + "c_norm.weight"], e[p + "c_norm.bias"], EPS)
        hi = sigmoid(oo) * np.tanh(ci)
        new_h.append(hi)
        new_c.append(ci)
        x = hi
    out = x @ e["predictor.linear.weight"].T + e["predictor.linear.bias"]
    out = ln(out, e["predictor.output_layer_norm.weight"],
             e["predictor.output_layer_norm.bias"], 1e-5)
    return out, np.stack(new_h), np.stack(new_c)


def test_predictor_matches_torchaudio_equations(synthetic_sd, converted):
    B = 3
    rng = np.random.default_rng(1)
    h = np.zeros((PL, B, HID), np.float32)
    c = np.zeros((PL, B, HID), np.float32)
    state = PredictorState(h=jnp.asarray(h), c=jnp.asarray(c))
    params = jax.tree.map(jnp.asarray, converted)

    for step in range(4):
        tokens = rng.integers(0, V, size=B)
        want_out, h, c = _numpy_predictor_oracle(synthetic_sd, tokens, h, c)
        got_out, state = predictor_step(
            params, jnp.asarray(tokens, jnp.int32), state, CFG)
        np.testing.assert_allclose(np.asarray(got_out), want_out,
                                   rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(np.asarray(state.h), h,
                                   rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(np.asarray(state.c), c,
                                   rtol=2e-5, atol=2e-5)


def test_greedy_stream_step_runs_with_converted(converted):
    import dataclasses

    from asr_streaming_tpu.ops.frontend import MelConfig, make_mel_params

    mel_cfg = dataclasses.replace(MelConfig.for_english(), n_mels=N_MELS)
    params = {**jax.tree.map(jnp.asarray, converted),
              "en_frontend": make_mel_params(mel_cfg)}
    state = init_rnnt_state(CFG, 2)
    em = CFG.emformer
    feats = jnp.asarray(np.random.default_rng(0).standard_normal(
        (2, (em.segment_length + em.right_context_length) * 4, N_MELS)),
        jnp.float32)
    out = rnnt_greedy_stream_step(params, CFG, feats, state)
    assert out.tokens.shape == (2, em.segment_length *
                                CFG.max_symbols_per_frame)
    assert np.isfinite(np.asarray(out.encodings)).all()
