"""Inverse STFT (overlap-add) in JAX.

Equivalent of torchaudio's InverseSpectrogram used by the reference
vocoder head (reference: lightspeech/modules/decoder.py:110-131,
datas/audio.py:47-64): synthesis by windowed IDFT + overlap-add with
squared-window normalization (center=True convention)."""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def inverse_stft(spec: jax.Array, n_fft: int, win_length: int,
                 hop_length: int) -> jax.Array:
    """spec: [B, n_fft//2+1, T] complex -> [B, (T-1)*hop] float32."""
    B, n_bins, T = spec.shape
    window = jnp.asarray(
        0.5 * (1 - np.cos(2 * np.pi * np.arange(win_length) / win_length)),
        jnp.float32)
    if win_length < n_fft:
        left = (n_fft - win_length) // 2
        window = jnp.pad(window, (left, n_fft - win_length - left))

    frames = jnp.fft.irfft(spec.transpose(0, 2, 1), n=n_fft, axis=-1)
    frames = frames * window[None, None, :]                # [B, T, n_fft]

    out_len = n_fft + hop_length * (T - 1)
    idx = jnp.arange(T)[:, None] * hop_length + jnp.arange(n_fft)[None, :]
    flat_idx = idx.reshape(-1)

    audio = jnp.zeros((B, out_len), jnp.float32)
    audio = audio.at[:, flat_idx].add(frames.reshape(B, -1))
    norm = jnp.zeros((out_len,), jnp.float32)
    norm = norm.at[flat_idx].add(
        jnp.broadcast_to(window ** 2, (T, n_fft)).reshape(-1))
    audio = audio / jnp.clip(norm, 1e-11, None)

    pad = n_fft // 2   # center=True trimming
    return audio[:, pad:out_len - pad]
