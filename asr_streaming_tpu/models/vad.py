"""Device-side VAD: Silero-v5-shaped neural VAD + energy first-stage gate.

TPU-native replacement for the reference's two-stage gating:

  * Stage 1 — webrtcvad (C extension, 30 ms frames, reference
    stream.py:166-188).  Here: a vectorized energy gate over 30 ms frames
    of the new-segment audio, evaluated on device inside the fused serving
    step.  Functional (permissive) equivalent, not a GMM port; its job is
    the same cheap "obviously silent?" early-exit, and the neural second
    stage remains the real decision maker.

  * Stage 2 — Silero v5 via onnxruntime (reference vad_silero.py:8-137).
    Here: a JAX re-implementation with the same I/O contract — 512-sample
    windows at 16 kHz, 64-sample carried context, LSTM state (2, B, 128),
    probabilities per window, states reset per chunk exactly like the
    reference's ``get_speech_probs`` (vad_silero.py:104-128, which calls
    ``reset_states`` per chunk, making VAD chunk-stateless).  The .onnx
    weights are not shipped in the reference repo, so parity is
    architectural: STFT-magnitude frontend -> conv encoder -> LSTM cell ->
    sigmoid head, shape-compatible with Silero's published state layout.
    ``silero_chunk_probs`` is a single scan, batched over streams.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class SileroConfig:
    """Silero-v5 16 kHz graph geometry.

    The network mirrors the silero_vad.onnx v5 structure (the reference
    runs that file via onnxruntime, vad_silero.py:12-23): a fixed STFT
    conv basis (shipped as the ``_model.stft.forward_basis_buffer``
    initializer), magnitude, a 4-block reparameterized conv encoder
    (129->128->64->64->128, strides 1,2,2,1 — 4 STFT frames reduce to
    one vector), one LSTM cell (2, B, 128 carried state), and a 1x1 conv
    head with sigmoid.  ``stft_pad_left`` reflects the STFT block's
    internal padding; its exact split is validated/calibrated by the
    real-file parity harness (tests/test_silero_import.py) since the
    .onnx ships neither in the reference repo nor in this image.
    """
    sample_rate: int = 16000
    window: int = 512            # samples per decision window
    context: int = 64            # carried samples prepended to each window
    n_fft: int = 256
    hop: int = 128
    encoder_channels: tuple = (128, 64, 64, 128)
    encoder_strides: tuple = (1, 2, 2, 1)
    lstm_hidden: int = 128
    threshold: float = 0.5
    stft_pad_left: int = 64
    stft_pad_right: int = 0

    @property
    def n_freqs(self) -> int:
        return self.n_fft // 2 + 1

    @property
    def encoder_dim(self) -> int:
        return self.encoder_channels[-1]

    @property
    def frames_per_window(self) -> int:
        return (self.context + self.window + self.stft_pad_left
                + self.stft_pad_right - self.n_fft) // self.hop + 1


def init_silero_params(key: jax.Array, cfg: SileroConfig = SileroConfig()) -> dict:
    """Random-initialized parameters in the v5 graph's shapes (the
    reference repo ships no VAD weights; real ones import via
    ``silero_params_from_onnx``)."""
    n_convs = len(cfg.encoder_channels)
    ks = jax.random.split(key, n_convs + 4)
    F, H = cfg.n_freqs, cfg.lstm_hidden

    def u(k, shape, fan_in):
        b = 1.0 / math.sqrt(fan_in)
        return jax.random.uniform(k, shape, minval=-b, maxval=b,
                                  dtype=jnp.float32)

    # fixed STFT basis (window folded in), like the ONNX graph's STFT block
    n = np.arange(cfg.n_fft)
    k_ = np.arange(cfg.n_freqs)
    angle = 2 * np.pi * np.outer(k_, n) / cfg.n_fft
    win = 0.5 * (1 - np.cos(2 * np.pi * n / cfg.n_fft))
    basis = np.concatenate([np.cos(angle) * win, -np.sin(angle) * win])

    params = {
        "stft_basis": jnp.asarray(basis[:, None, :], jnp.float32),  # [2F,1,nfft]
        "lstm_wi": u(ks[0], (cfg.encoder_dim, 4 * H), cfg.encoder_dim),
        "lstm_wh": u(ks[1], (H, 4 * H), H),
        "lstm_b": jnp.zeros(4 * H),
        "out_w": u(ks[2], (H, 1), H), "out_b": jnp.zeros(1),
    }
    in_ch = F
    for i, out_ch in enumerate(cfg.encoder_channels):
        params[f"conv{i}_w"] = u(ks[3 + i], (out_ch, in_ch, 3), in_ch * 3)
        params[f"conv{i}_b"] = jnp.zeros(out_ch)
        in_ch = out_ch
    return params


def silero_params_from_onnx(initializers: dict,
                            cfg: SileroConfig = SileroConfig()) -> dict:
    """Name-map silero_vad.onnx (v5) initializers onto framework params.

    Expected initializer names (16 kHz branch):
      _model.stft.forward_basis_buffer            [258, 1, 256]
      _model.encoder.{i}.reparam_conv.weight/bias i=0..3
      _model.decoder.rnn.weight_ih / weight_hh    [512, 128]
      _model.decoder.rnn.bias_ih / bias_hh        [512]
      _model.decoder.decoder.2.weight / bias      [1, 128, 1] / [1]

    torch LSTM gate order (i, f, g, o) matches silero_window_step's
    split; biases are summed (torch keeps ih+hh separately).
    """
    g = initializers

    def pick(*names):
        for n in names:
            if n in g:
                return np.asarray(g[n], np.float32)
        raise KeyError(f"none of {names} in ONNX initializers "
                       f"(have: {sorted(g)[:8]}...)")

    basis = pick("_model.stft.forward_basis_buffer")
    if basis.ndim == 2:
        basis = basis[:, None, :]
    assert basis.shape == (2 * cfg.n_freqs, 1, cfg.n_fft), basis.shape

    params = {"stft_basis": jnp.asarray(basis)}
    for i in range(len(cfg.encoder_channels)):
        w = pick(f"_model.encoder.{i}.reparam_conv.weight")
        b = pick(f"_model.encoder.{i}.reparam_conv.bias")
        assert w.shape[0] == cfg.encoder_channels[i], (i, w.shape)
        params[f"conv{i}_w"] = jnp.asarray(w)
        params[f"conv{i}_b"] = jnp.asarray(b)
    wi = pick("_model.decoder.rnn.weight_ih")
    wh = pick("_model.decoder.rnn.weight_hh")
    bi = pick("_model.decoder.rnn.bias_ih")
    bh = pick("_model.decoder.rnn.bias_hh")
    params["lstm_wi"] = jnp.asarray(wi.T)       # [E, 4H]
    params["lstm_wh"] = jnp.asarray(wh.T)       # [H, 4H]
    params["lstm_b"] = jnp.asarray(bi + bh)
    head_w = pick("_model.decoder.decoder.2.weight")     # [1, H, 1]
    head_b = pick("_model.decoder.decoder.2.bias")
    params["out_w"] = jnp.asarray(head_w.reshape(1, -1).T)   # [H, 1]
    params["out_b"] = jnp.asarray(head_b)
    return params


def _window_features(params: dict, cfg: SileroConfig, x: jax.Array) -> jax.Array:
    """x: [B, context + window] -> [B, encoder_dim] (one vector per
    window: the conv strides collapse the 4 STFT frames)."""
    if cfg.stft_pad_left or cfg.stft_pad_right:
        x = jnp.pad(x, ((0, 0), (cfg.stft_pad_left, cfg.stft_pad_right)),
                    mode="reflect")
    spec = jax.lax.conv_general_dilated(
        x[:, None, :], params["stft_basis"], window_strides=(cfg.hop,),
        padding="VALID", dimension_numbers=("NCW", "OIW", "NCW"))
    F = cfg.n_freqs
    mag = jnp.sqrt(spec[:, :F] ** 2 + spec[:, F:2 * F] ** 2 + 1e-12)
    h = mag                                                # [B, F, frames]
    for i, stride in enumerate(cfg.encoder_strides):
        h = jax.lax.conv_general_dilated(
            h, params[f"conv{i}_w"], (stride,), [(1, 1)],
            dimension_numbers=("NCW", "OIW", "NCW")) \
            + params[f"conv{i}_b"][:, None]
        h = jax.nn.relu(h)
    return jnp.mean(h, axis=-1)                            # [B, E]


def silero_window_step(params: dict, cfg: SileroConfig, x: jax.Array,
                       state: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """One 512-sample window.  state: [2, B, H] (h, c) like the reference's
    (2, B, 128) ONNX state (vad_silero.py:44)."""
    feats = _window_features(params, cfg, x)
    h, c = state[0], state[1]
    gates = feats @ params["lstm_wi"] + h @ params["lstm_wh"] + params["lstm_b"]
    i, f, g, o = jnp.split(gates, 4, axis=-1)   # torch LSTM gate order
    c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    h = jax.nn.sigmoid(o) * jnp.tanh(c)
    # v5 decoder head: Sequential(Dropout, ReLU, Conv1d(H,1,1), Sigmoid)
    prob = jax.nn.sigmoid(
        jax.nn.relu(h) @ params["out_w"] + params["out_b"])[:, 0]
    return prob, jnp.stack([h, c])


def silero_chunk_probs(params: dict, cfg: SileroConfig,
                       wave: jax.Array) -> jax.Array:
    """Per-window speech probabilities for a chunk, state reset at chunk
    start (matches reference get_speech_probs).  wave: [B, T] ->
    [B, ceil(T / window)]."""
    B, T = wave.shape
    n_win = -(-T // cfg.window)
    pad = n_win * cfg.window - T
    wave = jnp.pad(wave, ((0, 0), (cfg.context, pad)))
    # windows with leading context: [n_win, B, context + window]
    idx = (jnp.arange(n_win)[:, None] * cfg.window
           + jnp.arange(cfg.context + cfg.window)[None, :])
    windows = wave[:, idx].transpose(1, 0, 2)

    # The conv encoder has no cross-window state — run it for ALL windows
    # as one big batch (one conv stack launch instead of n_win scan steps;
    # v5e @512 slots: 3.5 -> ~1 ms).  Only the LSTM cell is sequential.
    feats = _window_features(
        params, cfg,
        windows.reshape(n_win * B, -1)).reshape(n_win, B, -1)

    state0 = jnp.zeros((2, B, cfg.lstm_hidden), jnp.float32)

    def body(state, f):
        h, c = state[0], state[1]
        gates = (f @ params["lstm_wi"] + h @ params["lstm_wh"]
                 + params["lstm_b"])
        i, fg, g, o = jnp.split(gates, 4, axis=-1)
        c = jax.nn.sigmoid(fg) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h = jax.nn.sigmoid(o) * jnp.tanh(c)
        prob = jax.nn.sigmoid(
            jax.nn.relu(h) @ params["out_w"] + params["out_b"])[:, 0]
        return jnp.stack([h, c]), prob

    _, probs = jax.lax.scan(body, state0, feats)
    return probs.T                                         # [B, n_win]


def silence_runs(speech: jax.Array, window_seconds: float
                 ) -> Tuple[jax.Array, jax.Array]:
    """Leading/trailing silent-window runs in seconds, per stream
    (vectorized equivalent of reference count_consecutive_zeros,
    vad_silero.py:130-137).  speech: [B, n_win] bool."""
    not_speech = ~speech
    lead = jnp.sum(jnp.cumprod(not_speech, axis=1), axis=1)
    trail = jnp.sum(jnp.cumprod(not_speech[:, ::-1], axis=1), axis=1)
    return lead * window_seconds, trail * window_seconds


def energy_gate(wave: jax.Array, sample_rate: int = 16000,
                frame_seconds: float = 0.03,
                threshold_db: float = -55.0) -> jax.Array:
    """First-stage gate: any 30 ms frame above an absolute dBFS floor
    (device-side, vectorized).  wave: [B, T] -> [B] bool."""
    frame = int(frame_seconds * sample_rate)
    n = (wave.shape[1] // frame) * frame
    frames = wave[:, :n].reshape(wave.shape[0], -1, frame)
    power = jnp.mean(frames ** 2, axis=-1)
    db = 10.0 * jnp.log10(power + 1e-12)
    return jnp.any(db > threshold_db, axis=1)
