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
    sample_rate: int = 16000
    window: int = 512            # samples per decision window
    context: int = 64            # carried samples prepended to each window
    n_fft: int = 256
    hop: int = 128
    encoder_dim: int = 128
    lstm_hidden: int = 128
    threshold: float = 0.5

    @property
    def n_freqs(self) -> int:
        return self.n_fft // 2 + 1

    @property
    def frames_per_window(self) -> int:
        # (context + window - n_fft) // hop + 1
        return (self.context + self.window - self.n_fft) // self.hop + 1


def init_silero_params(key: jax.Array, cfg: SileroConfig = SileroConfig()) -> dict:
    """Random-initialized parameters (the reference repo ships no VAD
    weights; real weights can be imported via ``load_weights``)."""
    ks = jax.random.split(key, 8)
    F, E, H = cfg.n_freqs, cfg.encoder_dim, cfg.lstm_hidden

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
    return {
        "stft_basis": jnp.asarray(basis[:, None, :], jnp.float32),  # [2F,1,nfft]
        "conv1_w": u(ks[0], (E, F, 3), F * 3), "conv1_b": jnp.zeros(E),
        "conv2_w": u(ks[1], (E, E, 3), E * 3), "conv2_b": jnp.zeros(E),
        "lstm_wi": u(ks[2], (E, 4 * H), E), "lstm_wh": u(ks[3], (H, 4 * H), H),
        "lstm_b": jnp.zeros(4 * H),
        "out_w": u(ks[4], (H, 1), H), "out_b": jnp.zeros(1),
    }


def _window_features(params: dict, cfg: SileroConfig, x: jax.Array) -> jax.Array:
    """x: [B, context + window] -> [B, encoder_dim]"""
    spec = jax.lax.conv_general_dilated(
        x[:, None, :], params["stft_basis"], window_strides=(cfg.hop,),
        padding="VALID", dimension_numbers=("NCW", "OIW", "NCW"))
    F = cfg.n_freqs
    mag = jnp.sqrt(spec[:, :F] ** 2 + spec[:, F:] ** 2 + 1e-12)
    feats = jnp.log1p(mag)                                 # [B, F, frames]
    h = jax.lax.conv_general_dilated(
        feats, params["conv1_w"], (1,), "SAME",
        dimension_numbers=("NCW", "OIW", "NCW")) + params["conv1_b"][:, None]
    h = jax.nn.relu(h)
    h = jax.lax.conv_general_dilated(
        h, params["conv2_w"], (1,), "SAME",
        dimension_numbers=("NCW", "OIW", "NCW")) + params["conv2_b"][:, None]
    h = jax.nn.relu(h)
    return jnp.mean(h, axis=-1)                            # [B, E]


def silero_window_step(params: dict, cfg: SileroConfig, x: jax.Array,
                       state: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """One 512-sample window.  state: [2, B, H] (h, c) like the reference's
    (2, B, 128) ONNX state (vad_silero.py:44)."""
    feats = _window_features(params, cfg, x)
    h, c = state[0], state[1]
    gates = feats @ params["lstm_wi"] + h @ params["lstm_wh"] + params["lstm_b"]
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    h = jax.nn.sigmoid(o) * jnp.tanh(c)
    prob = jax.nn.sigmoid(h @ params["out_w"] + params["out_b"])[:, 0]
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

    state0 = jnp.zeros((2, B, cfg.lstm_hidden), jnp.float32)

    def body(state, win):
        prob, state = silero_window_step(params, cfg, win, state)
        return state, prob

    _, probs = jax.lax.scan(body, state0, windows)
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
