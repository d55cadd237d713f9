"""Squeezeformer building blocks (offline/training lineage) in JAX.

Functional re-implementations of the reference's neural building blocks
(reference: streaming_decoder/lightspeech/layers/):

  * ScaleBiasNorm                         (normalization.py:9-20)
  * grouped rel-pos multi-head attention  (attention.py:64-254)
    with relative sinusoidal encodings    (attention.py:6-62)
    and the rel->abs indexing trick       (attention.py:216-254)
  * FeedForward / Attention / Convolution blocks and the post-LN
    SqueezeformerBlock                    (block.py:9-171)
  * Conv2d subsampling (x4)               (sampling.py:10-76)
  * Adaptive / MixStyle norms             (normalization.py:23-78)

All params are plain dicts of jnp arrays; BatchNorm is functional — pass
``training=True`` with batch stats computed on the fly, or inference mode
using carried running stats stored in the params ("bn_mean"/"bn_var").
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from asr_streaming_tpu.models.emformer import _linear_init, _layer_norm


# ------------------------------------------------------------------ helpers

def scale_bias_norm(x, scale, bias):
    return x * scale + bias


def make_padding_mask(lens: jax.Array, max_time: int) -> jax.Array:
    """True for valid positions (reference utils/common.py:47-57)."""
    return jnp.arange(max_time)[None, :] < lens[:, None]


def _batch_norm(x, p, prefix: str, training: bool, axis=(0, 1), eps=1e-5):
    """x normalized over `axis`; scale/bias + running stats in params."""
    if training:
        mean = jnp.mean(x, axis=axis, keepdims=True)
        var = jnp.var(x, axis=axis, keepdims=True)
    else:
        mean = p[f"{prefix}_mean"]
        var = p[f"{prefix}_var"]
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    return y * p[f"{prefix}_scale"] + p[f"{prefix}_bias"]


# -------------------------------------------------- relative position encode

def rel_pos_encoding(max_len: int, d_model: int, group_size: int
                     ) -> np.ndarray:
    """Relative sinusoidal PE table [2*max_len - G%2, D]
    (reference attention.py:6-62)."""
    pos_left = np.arange(max_len - 1, group_size % 2 - 1, -1, dtype=np.float64)
    pos_right = np.arange(0, -max_len, -1, dtype=np.float64)
    pos = np.concatenate([pos_left, pos_right])[:, None]
    steps = np.arange(d_model // 2, dtype=np.float64)[None, :]
    angles = pos / 10000 ** (2 * steps / d_model)
    pe = np.zeros((pos.shape[0], d_model), np.float32)
    pe[:, 0::2] = np.sin(angles)
    pe[:, 1::2] = np.cos(angles)
    return pe


def _slice_pe(pe: jnp.ndarray, max_len: int, group_size: int, seq_len: int
              ) -> jnp.ndarray:
    left = max_len - seq_len + group_size // 2
    right = max_len - group_size % 2 + seq_len - group_size // 2
    return pe[left:right]


def _rel_to_abs(scores: jax.Array) -> jax.Array:
    """Relative->absolute indexing (Bello et al.; reference
    attention.py:216-254).  scores: [B, H, T, 2T-1] -> [B, H, T, T]."""
    B, H, T1, T2 = scores.shape
    s = jnp.pad(scores, ((0, 0), (0, 0), (0, 0), (0, 1)))
    s = s.reshape(B, H, -1)
    s = jnp.pad(s, ((0, 0), (0, 0), (0, T2 - T1)))
    s = s.reshape(B, H, 1 + T1, T2)
    return s[:, :, :T1, T1 - 1:]


# ------------------------------------------------------------ grouped MHSA

def init_mhsa_params(key, d_model: int, num_heads: int, group_size: int,
                     max_pos_encoding: int) -> dict:
    ks = jax.random.split(key, 7)
    wq, bq = _linear_init(ks[0], d_model, d_model)
    wk, bk = _linear_init(ks[1], d_model, d_model)
    wv, bv = _linear_init(ks[2], d_model, d_model)
    wo, bo = _linear_init(ks[3], d_model, d_model)
    wp, bp = _linear_init(ks[4], d_model, d_model)
    bound = math.sqrt(6.0 / (num_heads + d_model // num_heads))
    u = jax.random.uniform(ks[5], (d_model,), minval=-bound, maxval=bound)
    v = jax.random.uniform(ks[6], (d_model,), minval=-bound, maxval=bound)
    return {
        "wq": wq, "bq": bq, "wk": wk, "bk": bk, "wv": wv, "bv": bv,
        "wo": wo, "bo": bo, "wp": wp, "bp": bp, "u": u, "v": v,
        "pe": jnp.asarray(rel_pos_encoding(max_pos_encoding, d_model,
                                           group_size)),
    }


def grouped_mhsa(p: dict, x: jax.Array, mask: jax.Array, num_heads: int,
                 group_size: int, max_pos_encoding: int) -> jax.Array:
    """Grouped rel-pos MHSA (reference attention.py:115-188).

    Args:
      x: [B, T, D]; mask: [B, T, T] True = MASKED (reference convention).
    """
    B, T, D = x.shape
    G = group_size
    d_head = (G * D) // num_heads

    q = x @ p["wq"] + p["bq"]
    k = x @ p["wk"] + p["bk"]
    v = x @ p["wv"] + p["bv"]

    pad = (G - T % G) % G
    if pad:
        q = jnp.pad(q, ((0, 0), (0, pad), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, pad), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad), (0, 0)))
        mask = jnp.pad(mask, ((0, 0), (0, pad), (0, pad)),
                       constant_values=True)
    Tp = T + pad

    qu = (q + p["u"]).reshape(B, Tp // G, num_heads, d_head).transpose(
        0, 2, 1, 3)
    qv = (q + p["v"]).reshape(B, Tp // G, num_heads, d_head).transpose(
        0, 2, 1, 3)
    kh = k.reshape(B, Tp // G, num_heads, d_head).transpose(0, 2, 1, 3)
    vh = v.reshape(B, Tp // G, num_heads, d_head).transpose(0, 2, 1, 3)

    pe = _slice_pe(p["pe"], max_pos_encoding, G, Tp)
    e = (pe @ p["wp"] + p["bp"])
    e = jnp.broadcast_to(e[None], (B,) + e.shape)
    e = e.reshape(B, -1, num_heads, d_head).transpose(0, 2, 1, 3)

    scores_k = jnp.einsum("bhqd,bhkd->bhqk", qu, kh,
                          preferred_element_type=jnp.float32)
    scores_e = _rel_to_abs(jnp.einsum("bhqd,bhkd->bhqk", qv, e,
                                      preferred_element_type=jnp.float32))
    scores = (scores_k + scores_e) / math.sqrt(d_head)

    gmask = mask[:, ::G, ::G][:, None]
    scores = jnp.where(gmask, jnp.finfo(scores.dtype).min, scores)
    weights = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", weights, vh,
                     preferred_element_type=jnp.float32)
    out = out.transpose(0, 2, 1, 3).reshape(B, Tp, D)[:, :T]
    return out @ p["wo"] + p["bo"]


# ------------------------------------------------------------------- blocks

def init_ffn_params(key, d_model: int) -> dict:
    k1, k2 = jax.random.split(key)
    w1, b1 = _linear_init(k1, d_model, 4 * d_model)
    w2, b2 = _linear_init(k2, 4 * d_model, d_model)
    return {"w1": w1, "b1": b1, "w2": w2, "b2": b2,
            "pre_scale": jnp.ones(d_model), "pre_bias": jnp.zeros(d_model)}


def ffn_block(p: dict, x: jax.Array) -> jax.Array:
    x = scale_bias_norm(x, p["pre_scale"], p["pre_bias"])
    return jax.nn.silu(x @ p["w1"] + p["b1"]) @ p["w2"] + p["b2"]


def init_conv_block_params(key, d_model: int, kernel_size: int) -> dict:
    k1, k2, k3 = jax.random.split(key, 3)
    bound = 1.0 / math.sqrt(d_model)
    pw1 = jax.random.uniform(k1, (d_model, d_model), minval=-bound,
                             maxval=bound)
    pw2 = jax.random.uniform(k2, (d_model, d_model), minval=-bound,
                             maxval=bound)
    dwb = 1.0 / math.sqrt(kernel_size)
    dw = jax.random.uniform(k3, (d_model, 1, kernel_size), minval=-dwb,
                            maxval=dwb)
    return {
        "pw1_w": pw1, "pw1_b": jnp.zeros(d_model),
        "dw_w": dw, "dw_b": jnp.zeros(d_model),
        "pw2_w": pw2, "pw2_b": jnp.zeros(d_model),
        "bn_scale": jnp.ones(d_model), "bn_bias": jnp.zeros(d_model),
        "bn_mean": jnp.zeros(d_model), "bn_var": jnp.ones(d_model),
        "pre_scale": jnp.ones(d_model), "pre_bias": jnp.zeros(d_model),
    }


def conv_block(p: dict, x: jax.Array, conv_mask: jax.Array,
               training: bool = False) -> jax.Array:
    """Pointwise -> (mask) -> depthwise -> BN -> pointwise
    (reference block.py:127-171).  conv_mask: [B, T] True = MASKED."""
    x = scale_bias_norm(x, p["pre_scale"], p["pre_bias"])
    x = jax.nn.silu(x @ p["pw1_w"] + p["pw1_b"])
    x = jnp.where(conv_mask[:, :, None], 0.0, x)

    # depthwise conv over time: [B, T, D] -> NCW
    y = jax.lax.conv_general_dilated(
        x.transpose(0, 2, 1), p["dw_w"], (1,), "SAME",
        feature_group_count=x.shape[-1],
        dimension_numbers=("NCW", "OIW", "NCW"))
    y = (y + p["dw_b"][:, None]).transpose(0, 2, 1)
    y = _batch_norm(y, p, "bn", training)
    y = jax.nn.silu(y)
    return y @ p["pw2_w"] + p["pw2_b"]


def init_squeezeformer_block_params(key, d_model: int, num_heads: int,
                                    group_size: int, max_pos_encoding: int,
                                    conv_kernel_size: int) -> dict:
    ks = jax.random.split(key, 4)
    return {
        "attn": {**init_mhsa_params(ks[0], d_model, num_heads, group_size,
                                    max_pos_encoding),
                 "pre_scale": jnp.ones(d_model),
                 "pre_bias": jnp.zeros(d_model)},
        "norm_attn_scale": jnp.ones(d_model),
        "norm_attn_bias": jnp.zeros(d_model),
        "ffn1": init_ffn_params(ks[1], d_model),
        "norm_ffn1_scale": jnp.ones(d_model),
        "norm_ffn1_bias": jnp.zeros(d_model),
        "conv": init_conv_block_params(ks[2], d_model, conv_kernel_size),
        "norm_conv_scale": jnp.ones(d_model),
        "norm_conv_bias": jnp.zeros(d_model),
        "ffn2": init_ffn_params(ks[3], d_model),
        "norm_ffn2_scale": jnp.ones(d_model),
        "norm_ffn2_bias": jnp.zeros(d_model),
    }


def squeezeformer_block(p: dict, x: jax.Array, attn_mask: jax.Array,
                        conv_mask: jax.Array, num_heads: int,
                        group_size: int, max_pos_encoding: int,
                        training: bool = False) -> jax.Array:
    """MHSA + FFN + Conv + FFN, each post-LN with residual
    (reference block.py:51-77)."""
    a = p["attn"]
    h = scale_bias_norm(x, a["pre_scale"], a["pre_bias"])
    h = grouped_mhsa(a, h, attn_mask, num_heads, group_size,
                     max_pos_encoding)
    x = _layer_norm(x + h, p["norm_attn_scale"], p["norm_attn_bias"])

    x = _layer_norm(x + ffn_block(p["ffn1"], x),
                    p["norm_ffn1_scale"], p["norm_ffn1_bias"])
    x = _layer_norm(x + conv_block(p["conv"], x, conv_mask, training),
                    p["norm_conv_scale"], p["norm_conv_bias"])
    x = _layer_norm(x + ffn_block(p["ffn2"], x),
                    p["norm_ffn2_scale"], p["norm_ffn2_bias"])
    return x


# -------------------------------------------------------------- subsampling

def init_subsampling_params(key, input_dim: int, output_dim: int,
                            num_filters: int, kernel_size: int = 5) -> dict:
    k1, k2, k3 = jax.random.split(key, 3)
    fan1 = kernel_size * kernel_size
    c1 = jax.random.uniform(k1, (num_filters, 1, kernel_size, kernel_size),
                            minval=-1 / math.sqrt(fan1),
                            maxval=1 / math.sqrt(fan1))
    c2 = jax.random.uniform(k2, (num_filters, 1, kernel_size, kernel_size),
                            minval=-1 / math.sqrt(fan1),
                            maxval=1 / math.sqrt(fan1))
    proj_in = num_filters * math.ceil(input_dim / 4)
    pw, pb = _linear_init(k3, proj_in, output_dim)
    return {
        "c1_w": c1, "c1_b": jnp.zeros(num_filters),
        "bn_scale": jnp.ones((num_filters, 1, 1)),
        "bn_bias": jnp.zeros((num_filters, 1, 1)),
        "bn_mean": jnp.zeros((num_filters, 1, 1)),
        "bn_var": jnp.ones((num_filters, 1, 1)),
        "c2_w": c2, "c2_b": jnp.zeros(num_filters),
        "proj_w": pw, "proj_b": pb,
    }


def conv_subsampling(p: dict, x: jax.Array, x_lens: jax.Array,
                     training: bool = False
                     ) -> Tuple[jax.Array, jax.Array]:
    """2x Conv2d stride-2 (x4 in time) + projection
    (reference sampling.py:10-76).  x: [B, T, F]."""
    B, T, F = x.shape
    masks = make_padding_mask(x_lens, T)[:, None, :, None]   # [B,1,T,1]

    def conv2d(x, w, b, groups=1):
        y = jax.lax.conv_general_dilated(
            x, w, (2, 2), [(2, 2), (2, 2)],
            feature_group_count=groups,
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
        return y + b[None, :, None, None]

    h = x[:, None]                                            # [B,1,T,F]
    masks = masks[:, :, ::2, :]
    h = conv2d(h, p["c1_w"], p["c1_b"])
    h = _batch_norm(h, p, "bn", training, axis=(0, 2, 3))
    h = jax.nn.silu(h) * masks
    masks = masks[:, :, ::2, :]
    h = jax.nn.silu(conv2d(h, p["c2_w"], p["c2_b"],
                           groups=h.shape[1])) * masks

    b, c, t, f = h.shape
    h = h.transpose(0, 2, 1, 3).reshape(b, t, c * f)
    h = h @ p["proj_w"] + p["proj_b"]
    new_lens = (x_lens - 1) // 4 + 1
    return h, new_lens


# --------------------------------------------------------------- pixel ops

def init_downsampling_pixel_params(key, d_model: int, factor: int) -> dict:
    """Strided Conv1d downsampler (reference sampling.py:79-113)."""
    if factor <= 1:
        return {}
    k = int(2 * factor + 1)
    bound = 1.0 / math.sqrt(d_model * k)
    w = jax.random.uniform(key, (d_model, d_model, k), minval=-bound,
                           maxval=bound)
    return {"w": w, "b": jnp.zeros(d_model)}


def downsampling_pixel(p: dict, x: jax.Array, x_lens: jax.Array,
                       attn_mask: jax.Array, conv_mask: jax.Array,
                       factor: int):
    """[B, T, D] -> [B, ceil(T/factor), D] with mask subsampling."""
    if factor <= 1:
        return x, x_lens, attn_mask, conv_mask
    y = jax.lax.conv_general_dilated(
        x.transpose(0, 2, 1), p["w"], (factor,),
        [(factor, factor)], dimension_numbers=("NCW", "OIW", "NCW"))
    y = (y + p["b"][:, None]).transpose(0, 2, 1)
    new_lens = (x_lens - 1) // factor + 1
    return (y, new_lens, attn_mask[:, ::factor, ::factor],
            conv_mask[:, ::factor])


def upsampling_pixel(x: jax.Array, x_lens: jax.Array, attn_mask: jax.Array,
                     conv_mask: jax.Array, factor: int):
    """repeat_interleave upsampling (reference sampling.py:116-140)."""
    y = jnp.repeat(x, factor, axis=1)
    return (y, x_lens * factor,
            jnp.repeat(jnp.repeat(attn_mask, factor, axis=1), factor,
                       axis=2),
            jnp.repeat(conv_mask, factor, axis=1))


# ------------------------------------------------------- style-conditioned

def init_adaptive_norm_params(key, d_model: int, style_dim: int) -> dict:
    """Style-conditioned affine norm (reference normalization.py:23-42)."""
    bound = 1.0 / math.sqrt(style_dim)
    w = jax.random.uniform(key, (style_dim, 2 * d_model), minval=-bound,
                           maxval=bound)
    return {"w": w}


def adaptive_norm(p: dict, x: jax.Array, x_lens: jax.Array,
                  styles: jax.Array) -> jax.Array:
    """Instance-normalize over time, then apply style-derived scale/bias."""
    from asr_streaming_tpu.ops.sequence import compute_statistic
    d = x.shape[-1]
    coeff = styles @ p["w"]
    scale, bias = coeff[:, :d], coeff[:, d:]
    mean, std = compute_statistic(x, x_lens)
    x = (x - mean[:, None]) / (std[:, None] + 1e-5)
    return scale[:, None] * x + bias[:, None]


def mixstyle_norm(p: dict, key, x: jax.Array, x_lens: jax.Array,
                  styles: jax.Array, training: bool = True,
                  probability: float = 0.2) -> jax.Array:
    """MixStyle: blend style affine params across the batch (reference
    normalization.py:45-78); identity at inference."""
    if not training:
        return x
    from asr_streaming_tpu.ops.sequence import compute_statistic
    k1, k2, k3 = jax.random.split(key, 3)
    d = x.shape[-1]
    B = x.shape[0]
    coeff = styles @ p["w"]
    mu1, sig1 = coeff[:, :d], coeff[:, d:]
    perm = jax.random.permutation(k1, B)
    mu2, sig2 = mu1[perm], sig1[perm]
    weight = jax.random.beta(k2, 0.1, 0.1, (B, 1))
    scale = weight * mu1 + (1 - weight) * mu2
    bias = weight * sig1 + (1 - weight) * sig2
    mean, std = compute_statistic(x, x_lens)
    normed = (x - mean[:, None]) / (std[:, None] + 1e-5)
    mixed = scale[:, None] * normed + bias[:, None]
    apply = jax.random.uniform(k3, ()) <= probability
    return jnp.where(apply, mixed, x)
