"""Sequence tensor utilities (JAX).

Re-implementations of the reference's tensor helpers (reference:
streaming_decoder/lightspeech/utils/common.py): padding masks, masked
statistics, length regulation (duration -> frame expansion via an
alignment matmul — MXU-friendly, no gather loops), word-level pooling via
segment-sum, and FFT convolution (utils/operation.py:7-140).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def make_padding_mask(lens: jax.Array, max_time: int) -> jax.Array:
    """[B, T] True = valid (reference common.py:47-57)."""
    return jnp.arange(max_time)[None, :] < lens[:, None]


def compute_statistic(x: jax.Array, lens: jax.Array
                      ) -> Tuple[jax.Array, jax.Array]:
    """Masked per-sequence mean/std over time (reference common.py:33-44)."""
    mask = make_padding_mask(lens, x.shape[1])[:, :, None]
    T = jnp.sum(mask, axis=1)
    mean = jnp.sum(x * mask, axis=1) / T
    var = jnp.sum(jnp.square(x - mean[:, None]) * mask, axis=1) / T
    return mean, jnp.sqrt(var)


def length_regulator(x: jax.Array, x_mask: jax.Array, durs: jax.Array,
                     max_out: Optional[int] = None
                     ) -> Tuple[jax.Array, jax.Array]:
    """Expand tokens by durations via a 0/1 alignment matrix matmul
    (reference common.py:60-81).  x: [B, Tx, D], durs: [B, Tx] int.

    max_out bounds the output length statically (jit-friendly); defaults
    to the dynamic max like the reference (then not jit-able).
    """
    y_lens = jnp.sum(durs, axis=1)
    t_y = int(max_out) if max_out is not None else int(jnp.max(y_lens))
    b, t_x = durs.shape

    cum = jnp.cumsum(durs, axis=1)                         # [B, Tx]
    # alignment[b, i, j] = 1 iff sum(durs[:i]) <= j < sum(durs[:i+1])
    j = jnp.arange(t_y)[None, None, :]
    upper = cum[:, :, None]
    lower = jnp.concatenate(
        [jnp.zeros((b, 1), durs.dtype), cum[:, :-1]], axis=1)[:, :, None]
    align = ((j >= lower) & (j < upper)).astype(x.dtype)
    align = align * x_mask[:, :, None]
    y = jnp.einsum("bxy,bxd->byd", align, x)
    return y, y_lens


def word_level_pooling(x: jax.Array, word_ids: jax.Array,
                       reduction: str = "sum",
                       num_words: Optional[int] = None) -> jax.Array:
    """Pool token features into word slots by segment-sum
    (reference common.py:84-105).  word_ids: [B, Tp] int (-1 = pad).
    Pass num_words (static) under jit; defaults to the dynamic max."""
    B, Tp, D = x.shape
    if num_words is not None:
        Tw = num_words
    else:
        Tw = int(jnp.max(word_ids)) + 1 if word_ids.size else 0
    ids = jnp.where(word_ids < 0, Tw, word_ids)
    onehot = jax.nn.one_hot(ids, Tw + 1, dtype=x.dtype)    # [B, Tp, Tw+1]
    pooled = jnp.einsum("btw,btd->bwd", onehot, x)[:, :-1]
    if reduction == "mean":
        counts = jnp.sum(onehot, axis=1)[:, :-1, None]
        pooled = pooled / jnp.clip(counts, 1, None)
    return pooled


def fft_convolution(signal: jax.Array, kernel: jax.Array,
                    mode: str = "full") -> jax.Array:
    """FFT-based 1-D convolution along the last axis (reference
    utils/operation.py:7-140, used for RIR augmentation)."""
    n = signal.shape[-1] + kernel.shape[-1] - 1
    n_fft = 1 << (n - 1).bit_length()
    S = jnp.fft.rfft(signal, n=n_fft)
    K = jnp.fft.rfft(kernel, n=n_fft)
    out = jnp.fft.irfft(S * K, n=n_fft)[..., :n]
    if mode == "full":
        return out
    if mode == "same":
        start = (kernel.shape[-1] - 1) // 2
        return out[..., start:start + signal.shape[-1]]
    if mode == "valid":
        length = signal.shape[-1] - kernel.shape[-1] + 1
        start = kernel.shape[-1] - 1
        return out[..., start:start + length]
    raise ValueError(mode)
