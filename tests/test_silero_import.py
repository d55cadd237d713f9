"""Silero-v5 weight import: name mapping, graph parity, real-file harness.

The reference serves silero_vad.onnx via onnxruntime (reference:
vad_silero.py:8-102); neither the file nor onnxruntime ship in this
image, so the import path is proven in three layers:

  1. a synthetic ONNX file carrying the REAL v5 initializer names/shapes
     round-trips through the raw-protobuf extractor + name mapping,
  2. the JAX graph matches an independent torch oracle (conv strides,
     reflect pad, LSTM gate order, decoder ReLU head) on those weights,
  3. a prob-parity harness against the real file + onnxruntime runs
     whenever ``ASR_SILERO_ONNX`` points at a real silero_vad.onnx
     (deploy-time validation; skipped here).
"""

import os

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from asr_streaming_tpu.models.vad import (
    SileroConfig, init_silero_params, silero_chunk_probs,
    silero_params_from_onnx, silero_window_step,
)
from asr_streaming_tpu.tools.onnx_weights import (
    encode_test_model, parse_onnx_initializers,
)

CFG = SileroConfig()


def _v5_initializers(seed=0):
    """Random tensors under the real silero_vad.onnx v5 names/shapes."""
    rng = np.random.default_rng(seed)

    def t(*shape):
        return (rng.standard_normal(shape) * 0.2).astype(np.float32)

    # real STFT basis (window-folded DFT), like the shipped buffer
    n = np.arange(CFG.n_fft)
    k = np.arange(CFG.n_freqs)
    angle = 2 * np.pi * np.outer(k, n) / CFG.n_fft
    win = 0.5 * (1 - np.cos(2 * np.pi * n / CFG.n_fft))
    basis = np.concatenate([np.cos(angle) * win, -np.sin(angle) * win]
                           ).astype(np.float32)[:, None, :]

    inits = {"_model.stft.forward_basis_buffer": basis}
    in_ch = CFG.n_freqs
    for i, out_ch in enumerate(CFG.encoder_channels):
        inits[f"_model.encoder.{i}.reparam_conv.weight"] = t(out_ch, in_ch, 3)
        inits[f"_model.encoder.{i}.reparam_conv.bias"] = t(out_ch)
        in_ch = out_ch
    H = CFG.lstm_hidden
    inits["_model.decoder.rnn.weight_ih"] = t(4 * H, CFG.encoder_dim)
    inits["_model.decoder.rnn.weight_hh"] = t(4 * H, H)
    inits["_model.decoder.rnn.bias_ih"] = t(4 * H)
    inits["_model.decoder.rnn.bias_hh"] = t(4 * H)
    inits["_model.decoder.decoder.2.weight"] = t(1, H, 1)
    inits["_model.decoder.decoder.2.bias"] = t(1)
    return inits


@pytest.fixture(scope="module")
def onnx_roundtrip():
    inits = _v5_initializers()
    blob = encode_test_model(inits)
    parsed = parse_onnx_initializers(blob)
    return inits, parsed


def test_extractor_roundtrip(onnx_roundtrip):
    inits, parsed = onnx_roundtrip
    assert set(parsed) == set(inits)
    for k in inits:
        np.testing.assert_array_equal(parsed[k], inits[k])


def test_name_mapping_shapes(onnx_roundtrip):
    _, parsed = onnx_roundtrip
    params = silero_params_from_onnx(parsed, CFG)
    like = init_silero_params(jax.random.PRNGKey(0), CFG)
    assert set(params) == set(like)
    for k in like:
        assert params[k].shape == like[k].shape, k


def _torch_oracle_probs(inits, wave):
    """Independent torch implementation of the v5 graph over a chunk
    (state reset at chunk start, 64-sample carried context)."""
    B, T = wave.shape
    n_win = -(-T // CFG.window)
    wave = np.pad(wave, ((0, 0), (CFG.context, n_win * CFG.window - T)))
    h = torch.zeros(B, CFG.lstm_hidden, dtype=torch.float64)
    c = torch.zeros(B, CFG.lstm_hidden, dtype=torch.float64)
    e = {k: torch.from_numpy(v).double() for k, v in inits.items()}
    probs = []
    for w in range(n_win):
        x = torch.from_numpy(
            wave[:, w * CFG.window:
                 w * CFG.window + CFG.context + CFG.window]).double()
        x = F.pad(x[:, None], (CFG.stft_pad_left, CFG.stft_pad_right),
                  mode="reflect")
        spec = F.conv1d(x, e["_model.stft.forward_basis_buffer"],
                        stride=CFG.hop)
        Fq = CFG.n_freqs
        feat = torch.sqrt(spec[:, :Fq] ** 2 + spec[:, Fq:] ** 2 + 1e-12)
        for i, s in enumerate(CFG.encoder_strides):
            feat = F.relu(F.conv1d(
                feat, e[f"_model.encoder.{i}.reparam_conv.weight"],
                e[f"_model.encoder.{i}.reparam_conv.bias"],
                stride=s, padding=1))
        feat = feat.mean(-1)
        gates = (feat @ e["_model.decoder.rnn.weight_ih"].T
                 + h @ e["_model.decoder.rnn.weight_hh"].T
                 + e["_model.decoder.rnn.bias_ih"]
                 + e["_model.decoder.rnn.bias_hh"])
        ii, ff, gg, oo = gates.chunk(4, dim=-1)
        c = torch.sigmoid(ff) * c + torch.sigmoid(ii) * torch.tanh(gg)
        h = torch.sigmoid(oo) * torch.tanh(c)
        head = F.relu(h) @ e["_model.decoder.decoder.2.weight"][0] \
            + e["_model.decoder.decoder.2.bias"]
        probs.append(torch.sigmoid(head)[:, 0])
    return torch.stack(probs, dim=1).numpy()


def test_jax_graph_matches_torch_oracle(onnx_roundtrip):
    inits, parsed = onnx_roundtrip
    params = silero_params_from_onnx(parsed, CFG)
    rng = np.random.default_rng(3)
    wave = (rng.standard_normal((2, 1600)) * 0.3).astype(np.float32)
    got = np.asarray(silero_chunk_probs(params, CFG, jnp.asarray(wave)))
    want = _torch_oracle_probs(inits, wave.astype(np.float64))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_window_step_state_contract():
    """State shape (2, B, 128) like the reference ONNX session
    (vad_silero.py:44); deterministic evolution."""
    params = init_silero_params(jax.random.PRNGKey(0), CFG)
    B = 3
    state = jnp.zeros((2, B, CFG.lstm_hidden))
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (B, CFG.context + CFG.window)), jnp.float32)
    prob, state2 = silero_window_step(params, CFG, x, state)
    assert prob.shape == (B,)
    assert state2.shape == (2, B, CFG.lstm_hidden)
    assert not np.allclose(np.asarray(state2), 0.0)


@pytest.mark.skipif(
    not os.environ.get("ASR_SILERO_ONNX"),
    reason="set ASR_SILERO_ONNX=/path/to/silero_vad.onnx for real parity")
def test_real_file_prob_parity():
    """Deploy-time harness: JAX probs vs onnxruntime on the real model."""
    onnxruntime = pytest.importorskip("onnxruntime")
    path = os.environ["ASR_SILERO_ONNX"]
    from asr_streaming_tpu.tools.onnx_weights import load_onnx_initializers

    params = silero_params_from_onnx(load_onnx_initializers(path), CFG)
    rng = np.random.default_rng(0)
    wave = (rng.standard_normal((1, 4096)) * 0.3).astype(np.float32)

    sess = onnxruntime.InferenceSession(path)
    state = np.zeros((2, 1, 128), np.float32)
    ref_probs = []
    ctx = np.zeros((1, CFG.context), np.float32)
    for w in range(wave.shape[1] // CFG.window):
        win = wave[:, w * CFG.window:(w + 1) * CFG.window]
        out, state = sess.run(
            None, {"input": np.concatenate([ctx, win], 1),
                   "state": state, "sr": np.asarray(16000, np.int64)})[:2]
        ctx = win[:, -CFG.context:]
        ref_probs.append(out[0, 0])
    got = np.asarray(silero_chunk_probs(params, CFG, jnp.asarray(wave)))[0]
    np.testing.assert_allclose(got[:len(ref_probs)], ref_probs, atol=5e-3)
