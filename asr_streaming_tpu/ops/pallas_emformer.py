"""Pallas TPU kernel: one FUSED streaming-Emformer layer step.

The XLA path (models/emformer.py:_layer_step) lowers each layer into many
fusions whose intermediates ([B,Q,D] layer norms, [B,K,D] concatenated
K/V, [B,H,Q,K] masked logits, [B,R+U,F] FFN activations) round-trip
through HBM; at B=512 that traffic — not FLOPs — dominates the step
(measured 36 ms/step fully unrolled vs ~4 ms of MXU work).  This kernel
executes the ENTIRE layer in VMEM:

    LN -> summary -> Q/KV projections -> masked attention (fp32 softmax,
    memory/left-context validity + summary-row rule) -> out projection ->
    memory tanh -> residual FFN (gelu) -> output LN -> state roll

with a grid over batch tiles.  Weight blocks use constant index maps, so
Mosaic fetches them once and retains them in VMEM across the whole batch
sweep; per-tile traffic is exactly the carried state + activations.

Semantics mirror models/emformer.py:_layer_step line for line (reference:
streaming_decoder/lightspeech/modules/emformer.py:229-404); the XLA path
remains the oracle — tests/test_pallas_emformer.py checks both paths agree
on CPU (interpret mode) and the serving configs flip it on for TPU.
"""

from __future__ import annotations

import functools
import math
import os
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ln(x, scale, bias, eps=1e-5):
    x = x.astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * scale + bias


def _quantize_weight(w, axis=-2):
    """Per-output-channel symmetric int8: w ~= w8 * scale.
    axis: the CONTRACTION axis (reduced by the matmul)."""
    amax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=axis,
                   keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    w8 = jnp.round(w.astype(jnp.float32) / scale).astype(jnp.int8)
    return w8, scale


def _qdot(x2d, w8, wscale):
    """W8A8 matmul: dynamic per-row symmetric activation quant, int8 MXU
    dot (int32 accumulate — exact), f32 dequant.  x2d [rows, K] f32,
    w8 [K, N] int8, wscale [1, N] f32 -> [rows, N] f32."""
    amax = jnp.max(jnp.abs(x2d), axis=-1, keepdims=True)
    s = jnp.maximum(amax, 1e-8) * (1.0 / 127.0)
    xq = jnp.round(x2d * (1.0 / s)).astype(jnp.int8)
    acc = jnp.dot(xq, w8, preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * s * wscale


def _kernel_quant_names(quant) -> tuple:
    """Normalize a quant spec: False/"none" -> (); True/"int8" -> all five
    projection/FFN matmuls; "int8_ffn" -> the two FFN matmuls only (the
    ablated bottleneck — see NOTES_r2/r3 for the measured trade)."""
    if quant in (True, "int8"):
        return _QUANTIZED
    if quant == "int8_ffn":
        return ("ffw1", "ffw2")
    return ()


def _layer_math(
    utt, rc, mem_row, mem_state_in, lc_k_in, lc_v_in,
    length, reset2, advance2, w,
    *, U: int, R: int, M: int, Lc: int, H: int, use_mem: bool,
    tanh_on_mem: bool, neg_inf: float, activation: str, cdt,
    state_dtype, quant_names: tuple = (), ffn_slices: int = 1,
):
    """One Emformer layer step on VMEM-resident arrays.

    Shared by the per-layer kernel (_layer_kernel) and the whole-encoder
    stack kernel (_stack_kernel).  Inputs:
      utt [TB,U,D] f32, rc [TB,R,D] f32, mem_row [TB,1,D] f32 (or None),
      mem_state_in [TB,M_eff,D], lc_k_in/lc_v_in [TB,Lc,D],
      length/reset2/advance2 [TB,1] int32, w: dict of weight arrays.
    Returns (new_utt f32, new_rc f32, new_mem_row f32|None,
             new_mem_state, new_lc_k, new_lc_v) in state_dtype.
    """
    TB, _, D = utt.shape
    Dh = D // H
    K = M + R + Lc + U
    Q = R + U + (1 if use_mem else 0)

    # per-slot stream lifecycle masks (see emformer_stream_step): reset
    # zeroes the carried state in VMEM on load; advance gates the write-
    # back — this replaces two full-state jnp.where traversals in HBM
    reset3 = (reset2 > 0)[:, :, None]                   # [TB, 1, 1]
    adv3 = (advance2 > 0)[:, :, None]

    lnin_s = w["lnin_s"].astype(jnp.float32)
    lnin_b = w["lnin_b"].astype(jnp.float32)
    ln_rc = _ln(rc, lnin_s, lnin_b)
    ln_utt = _ln(utt, lnin_s, lnin_b)

    if use_mem:
        summary = jnp.mean(ln_utt, axis=1, keepdims=True)   # [TB, 1, D]
        q_in = jnp.concatenate([ln_rc, ln_utt, summary], axis=1)
    else:
        q_in = jnp.concatenate([ln_rc, ln_utt], axis=1)

    # ---- projections (2D dots on the MXU; rows = TB * tokens).
    # quant=True routes the five big matmuls through W8A8: per-output-
    # channel int8 weights (pre-quantized by the caller) x per-row
    # dynamically quantized int8 activations, int32 MXU accumulate
    # (2x bf16 peak on v5e), f32 dequant.  LN/softmax/attention-core/
    # state math keep the bf16/f32 pipeline unchanged.
    def _mm(x2d, name):
        if name in quant_names:
            return _qdot(x2d.astype(jnp.float32), w[name],
                         w[name + "_s"]).astype(cdt)
        return jnp.dot(x2d.astype(cdt), w[name],
                       preferred_element_type=jnp.float32).astype(cdt)

    q = (_mm(q_in.reshape(TB * Q, D), "wq")
         + w["bq"].astype(cdt)).reshape(TB, Q, D)

    mem_state = jnp.where(reset3, 0, mem_state_in)
    if use_mem:
        kv_in = jnp.concatenate(
            [mem_state.astype(cdt), ln_rc.astype(cdt),
             ln_utt.astype(cdt)], axis=1)                # [TB, M+R+U, D]
    else:
        kv_in = jnp.concatenate(
            [ln_rc.astype(cdt), ln_utt.astype(cdt)], axis=1)
    n_kv = M + R + U
    kv = (_mm(kv_in.reshape(TB * n_kv, D), "wkv")
          + w["bkv"].astype(cdt)).reshape(TB, n_kv, 2 * D)
    k_part = kv[:, :, :D]
    v_part = kv[:, :, D:]
    next_k = k_part[:, M + R:]                           # [TB, U, D]
    next_v = v_part[:, M + R:]

    lc_k = jnp.where(reset3, 0, lc_k_in).astype(cdt)
    lc_v = jnp.where(reset3, 0, lc_v_in).astype(cdt)
    full_k = jnp.concatenate([k_part[:, :M + R], lc_k, next_k], axis=1)
    full_v = jnp.concatenate([v_part[:, :M + R], lc_v, next_v], axis=1)

    # ---- key-validity mask from the per-stream fill counters
    m_kv = jnp.minimum(Lc, length)                       # [TB, 1]
    col = jax.lax.broadcasted_iota(jnp.int32, (TB, K), 1)
    valid = jnp.ones((TB, K), bool)
    lc_start = M + R
    valid &= ~((col >= lc_start) & (col < lc_start + (Lc - m_kv)))
    if use_mem:
        m_m = jnp.minimum(M, length // max(U, 1))
        valid &= ~((col < M) & (col < (M - m_m)))

    # ---- attention, one batched dot per head (fp32 logits/softmax)
    scaling = 1.0 / math.sqrt(Dh)
    dn = (((2,), (2,)), ((0,), (0,)))                    # contract D, batch B
    dn_pv = (((2,), (1,)), ((0,), (0,)))                 # probs @ values
    row = jax.lax.broadcasted_iota(jnp.int32, (Q, K), 0)
    colq = jax.lax.broadcasted_iota(jnp.int32, (Q, K), 1)
    if use_mem:
        summary_block = (row == Q - 1) & (colq < M)      # [Q, K]
    else:
        summary_block = jnp.zeros((Q, K), bool)
    mask = valid[:, None, :] & ~summary_block[None]      # [TB, Q, K]
    heads = []
    for h in range(H):
        sl = slice(h * Dh, (h + 1) * Dh)
        qh = q[:, :, sl] * scaling                       # cdt, like oracle
        logits = jax.lax.dot_general(
            qh, full_k[:, :, sl], dn,
            preferred_element_type=jnp.float32)          # [TB, Q, K]
        logits = jnp.where(mask, logits, neg_inf)
        probs = jax.nn.softmax(logits, axis=-1).astype(cdt)
        heads.append(jax.lax.dot_general(
            probs, full_v[:, :, sl], dn_pv,
            preferred_element_type=jnp.float32))
    attn = jnp.concatenate(heads, axis=2).astype(cdt)

    out = (_mm(attn.reshape(TB * Q, D), "wout")
           + w["bout"].astype(cdt)).reshape(TB, Q, D)

    rc_utt_out = out[:, :R + U].astype(jnp.float32)
    new_mem_row = None
    if use_mem:
        mem_out = out[:, R + U:].astype(jnp.float32)
        if tanh_on_mem:
            new_mem_row = jnp.tanh(mem_out)
        else:
            new_mem_row = jnp.clip(mem_out, -10.0, 10.0)

    # ---- residual FFN + output LN
    residual = rc_utt_out + jnp.concatenate([rc, utt], axis=1)
    ff = _ln(residual, w["ffln_s"].astype(jnp.float32),
             w["ffln_b"].astype(jnp.float32))
    act = {"relu": jax.nn.relu, "gelu": jax.nn.gelu,
           "silu": jax.nn.silu}[activation]
    T = R + U
    F = w["ffw1"].shape[-1]
    if ffn_slices > 1 and "ffw1" not in quant_names \
            and F % ffn_slices == 0:
        # Hidden-dim slicing: the plain FFN is a serial
        # MXU(ff@W1) -> VPU(act) -> MXU(h1@W2) chain — the MXU idles
        # through the activation.  S independent slices let Mosaic's
        # scheduler overlap slice s's first matmul with slice s-1's
        # activation (f32 partial-sum accumulate; bias added once).
        fs = F // ffn_slices
        ff2d = ff.reshape(TB * T, D).astype(cdt)
        acc = None
        for s in range(ffn_slices):
            w1s = w["ffw1"][:, s * fs:(s + 1) * fs]
            b1s = w["ffb1"][..., s * fs:(s + 1) * fs]
            h1s = act(jnp.dot(ff2d, w1s,
                              preferred_element_type=jnp.float32
                              ).astype(cdt) + b1s.astype(cdt))
            part = jnp.dot(h1s, w["ffw2"][s * fs:(s + 1) * fs],
                           preferred_element_type=jnp.float32)
            acc = part if acc is None else acc + part
        h2 = (acc + w["ffb2"].astype(jnp.float32)).astype(cdt).reshape(
            TB, T, D)
    else:
        h1 = act(_mm(ff.reshape(TB * T, D), "ffw1")
                 + w["ffb1"].astype(cdt))
        h2 = (_mm(h1, "ffw2")
              + w["ffb2"].astype(cdt)).reshape(TB, T, D)
    result = _ln(residual + h2.astype(jnp.float32),
                 w["lnout_s"].astype(jnp.float32),
                 w["lnout_b"].astype(jnp.float32))

    new_rc = result[:, :R]
    new_utt = result[:, R:]

    # ---- state roll (newest at the end), committed only where advance
    if use_mem:
        rolled = jnp.concatenate(
            [mem_state[:, 1:], mem_row.astype(mem_state.dtype)], axis=1)
        new_mem_state = jnp.where(adv3, rolled, mem_state)
    else:
        new_mem_state = mem_state
    keep = max(0, Lc - U)
    new_lc_k = jnp.concatenate(
        [lc_k[:, Lc - keep:], next_k[:, U - (Lc - keep):]],
        axis=1).astype(state_dtype)
    new_lc_v = jnp.concatenate(
        [lc_v[:, Lc - keep:], next_v[:, U - (Lc - keep):]],
        axis=1).astype(state_dtype)
    new_lc_k = jnp.where(adv3, new_lc_k, lc_k.astype(state_dtype))
    new_lc_v = jnp.where(adv3, new_lc_v, lc_v.astype(state_dtype))
    return (new_utt, new_rc, new_mem_row, new_mem_state.astype(state_dtype),
            new_lc_k, new_lc_v)


def _layer_kernel(
    # per-tile tensors
    utt_ref, rc_ref, mem_row_ref, mem_state_ref, lc_k_ref, lc_v_ref,
    len_ref, reset_ref, advance_ref,
    # layer weights (full arrays, fetched once); in quant mode five
    # per-channel scale arrays follow, then the six outputs
    *rest,
    U: int, R: int, M: int, Lc: int, H: int, use_mem: bool,
    tanh_on_mem: bool, neg_inf: float, activation: str, cdt,
    quant: bool = False,
):
    quant_names = _kernel_quant_names(quant)
    n_w = len(_WNAMES) + len(quant_names)
    w_refs = rest[:n_w]
    (out_utt_ref, out_rc_ref, out_mem_row_ref, out_mem_state_ref,
     out_lc_k_ref, out_lc_v_ref) = rest[n_w:]
    w = {name: ref[...] for name, ref in zip(_WNAMES, w_refs)}
    for name, ref in zip(quant_names, w_refs[len(_WNAMES):]):
        w[name + "_s"] = ref[...]
    (new_utt, new_rc, new_mem_row, new_mem_state, new_lc_k,
     new_lc_v) = _layer_math(
        utt_ref[...].astype(jnp.float32), rc_ref[...].astype(jnp.float32),
        mem_row_ref[...].astype(jnp.float32) if use_mem else None,
        mem_state_ref[...], lc_k_ref[...], lc_v_ref[...],
        len_ref[...], reset_ref[...], advance_ref[...], w,
        U=U, R=R, M=M, Lc=Lc, H=H, use_mem=use_mem,
        tanh_on_mem=tanh_on_mem, neg_inf=neg_inf, activation=activation,
        cdt=cdt, state_dtype=out_lc_k_ref.dtype, quant_names=quant_names)
    out_utt_ref[...] = new_utt
    out_rc_ref[...] = new_rc
    if use_mem:
        out_mem_row_ref[...] = new_mem_row
    out_mem_state_ref[...] = new_mem_state.astype(out_mem_state_ref.dtype)
    out_lc_k_ref[...] = new_lc_k
    out_lc_v_ref[...] = new_lc_v


@functools.partial(
    jax.jit, static_argnames=("U", "R", "M", "Lc", "H", "use_mem",
                              "tanh_on_mem", "neg_inf", "activation",
                              "cdt_name", "tile", "interpret", "quant"))
def fused_emformer_layer(p: dict, utt: jax.Array, rc: jax.Array,
                         mem_row, mem_state: jax.Array,
                         lc_k: jax.Array, lc_v: jax.Array,
                         length: jax.Array,
                         reset=None, advance=None, *,
                         U: int, R: int, M: int, Lc: int, H: int,
                         use_mem: bool, tanh_on_mem: bool, neg_inf: float,
                         activation: str, cdt_name: str = "bfloat16",
                         tile: int = 64, interpret: bool = False,
                         quant: bool = False) -> Tuple:
    """One fused Emformer layer step (signature mirrors _layer_step).

    p: this layer's parameter dict (unstacked, [D,...] shapes).
    utt [B,U,D] f32, rc [B,R,D] f32, mem_row [B,1,D] f32 (or None),
    mem_state [B,M,D], lc_k/lc_v [B,Lc,D] (compute dtype), length [B] i32
    (callers pass the RESET-EFFECTIVE length), reset/advance optional [B]
    bool lifecycle masks applied in VMEM (see emformer_stream_step).
    Returns (new_utt, new_rc, new_mem_row, new_mem_state, new_lc_k,
    new_lc_v) like models/emformer.py:_layer_step.
    """
    B, _, D = utt.shape
    if reset is None:
        reset = jnp.zeros((B,), bool)
    if advance is None:
        advance = jnp.ones((B,), bool)
    cdt = jnp.dtype(cdt_name)
    TB = min(tile, B)
    while B % TB:            # largest divisor of B not exceeding `tile`
        TB -= 1
    grid = (B // TB,)

    if mem_row is None:
        mem_row = jnp.zeros((B, 1, D), jnp.float32)
    if use_mem and mem_state.shape[1] == 0:
        raise ValueError("use_mem requires M > 0")
    # M == 0: pass 1-wide dummies so every block keeps a nonzero shape
    M_eff = max(M, 1)
    if M == 0:
        mem_state = jnp.zeros((B, 1, D), mem_state.dtype) \
            if mem_state.shape[1] == 0 else mem_state

    def tile_spec(rows):
        return pl.BlockSpec((TB, rows, D), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    def weight_spec(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda i, nd=nd: (0,) * nd,
                            memory_space=pltpu.VMEM)

    # 1D vectors become [1, N] (TPU VMEM blocks want >= 2 dims)
    def cast(w):
        w = w.astype(cdt)
        return w[None] if w.ndim == 1 else w

    def f32(w):
        w = w.astype(jnp.float32)
        return w[None] if w.ndim == 1 else w

    def big(w):
        return _quantize_weight(w, axis=-2)[0] if quant else cast(w)

    weights = [
        big(p["w_q"]), cast(p["b_q"]), big(p["w_kv"]), cast(p["b_kv"]),
        big(p["w_out"]), cast(p["b_out"]),
        f32(p["ln_in_scale"]), f32(p["ln_in_bias"]),
        f32(p["ff_ln_scale"]), f32(p["ff_ln_bias"]),
        big(p["ff_w1"]), cast(p["ff_b1"]), big(p["ff_w2"]),
        cast(p["ff_b2"]),
        f32(p["ln_out_scale"]), f32(p["ln_out_bias"]),
    ]
    if quant:
        weights += [_quantize_weight(p[n], axis=-2)[1]
                    for n in ("w_q", "w_kv", "w_out", "ff_w1", "ff_w2")]

    kernel = functools.partial(
        _layer_kernel, U=U, R=R, M=M, Lc=Lc, H=H, use_mem=use_mem,
        tanh_on_mem=tanh_on_mem, neg_inf=neg_inf, activation=activation,
        cdt=cdt, quant=quant)

    out_shapes = (
        jax.ShapeDtypeStruct((B, U, D), jnp.float32),        # utt
        jax.ShapeDtypeStruct((B, R, D), jnp.float32),        # rc
        jax.ShapeDtypeStruct((B, 1, D), jnp.float32),        # mem row
        jax.ShapeDtypeStruct((B, M_eff, D), mem_state.dtype),
        jax.ShapeDtypeStruct((B, Lc, D), lc_k.dtype),
        jax.ShapeDtypeStruct((B, Lc, D), lc_v.dtype),
    )
    out_specs = (tile_spec(U), tile_spec(R), tile_spec(1),
                 tile_spec(M_eff), tile_spec(Lc), tile_spec(Lc))
    mask_spec = pl.BlockSpec((TB, 1), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    in_specs = [
        tile_spec(utt.shape[1]), tile_spec(R), tile_spec(1),
        tile_spec(M_eff), tile_spec(Lc), tile_spec(Lc),
        mask_spec,                                           # length
        mask_spec,                                           # reset
        mask_spec,                                           # advance
    ] + [weight_spec(w.shape) for w in weights]

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        # the default scoped-vmem limit is 16 MB; the fused layer's live
        # set (weights + per-tile activations + FFN scratch) wants more,
        # and v5e has far more physical VMEM — let Mosaic use it
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(utt, rc, mem_row, mem_state, lc_k, lc_v,
      length.astype(jnp.int32).reshape(B, 1),
      reset.astype(jnp.int32).reshape(B, 1),
      advance.astype(jnp.int32).reshape(B, 1), *weights)

    new_utt, new_rc, new_mem_row, new_mem_state, new_lc_k, new_lc_v = outs
    if M == 0:
        new_mem_state = new_mem_state[:, :0]
        new_mem_row = None
    return (new_utt, new_rc, new_mem_row, new_mem_state, new_lc_k,
            new_lc_v)


# ---------------------------------------------------------------------------
# Whole-encoder megakernel: all L layers in ONE pallas_call.
#
# Grid (L, B/TB), layer-major: for each layer l, sweep the batch tiles.
# The inter-layer activations (utterance, right-context, carried memory
# row) live in full-batch VMEM scratch for the whole kernel — they never
# touch HBM between layers (the per-layer kernel round-trips ~45 MB of
# fp32 activations per layer boundary at 512 slots).  Each layer's
# weights are one grid-indexed block fetched exactly once per layer;
# Mosaic prefetches layer l+1's weights and the next tile's state while
# tile i of layer l computes.  This also collapses 20 kernel launches
# into one.
# ---------------------------------------------------------------------------

_WNAMES = ("wq", "bq", "wkv", "bkv", "wout", "bout", "lnin_s", "lnin_b",
           "ffln_s", "ffln_b", "ffw1", "ffb1", "ffw2", "ffb2",
           "lnout_s", "lnout_b")
# per-channel scale entries appended in quant (W8A8) mode, in this order
_QNAMES = ("wq_s", "wkv_s", "wout_s", "ffw1_s", "ffw2_s")
# the matmul weights replaced by int8 tensors in quant mode
_QUANTIZED = ("wq", "wkv", "wout", "ffw1", "ffw2")


def _stack_kernel(
    x_ref, len_ref, reset_ref, advance_ref,
    mem_ref, lc_k_ref, lc_v_ref,
    # stacked weights (one layer's block per grid step), then — in quant
    # mode — five per-channel scale blocks, then outputs and scratch
    *rest,
    U: int, R: int, M: int, Lc: int, H: int, TB: int, use_mem: bool,
    tanh_on_mem: bool, neg_inf: float, activation: str, cdt,
    quant: bool = False, ffn_slices: int = 1, layers_per_step: int = 1,
):
    quant_names = _kernel_quant_names(quant)
    n_w = len(_WNAMES) + len(quant_names)
    w_refs = rest[:n_w]
    (y_ref, out_mem_ref, out_lc_k_ref, out_lc_v_ref,
     utt_s, rc_s, memrow_s) = rest[n_w:]

    l = pl.program_id(0)
    i = pl.program_id(1)
    ts = pl.ds(pl.multiple_of(i * TB, TB), TB)

    @pl.when(l == 0)
    def _():
        # Layer 0 input: the chunk itself.  Initial memory row = mean of
        # the RAW utterance (reference emformer.py:442).
        xf = x_ref[...].astype(jnp.float32)
        utt_s[ts] = xf[:, :U]
        rc_s[ts] = xf[:, U:U + R]
        if use_mem:
            memrow_s[ts] = jnp.mean(xf[:, :U], axis=1, keepdims=True)

    # layers_per_step consecutive layers run back-to-back per grid step
    # (blocks carry that many layers' weights/state; sub indexes within)
    for sub in range(layers_per_step):
        # every stacked weight block has a leading layer dim of
        # layers_per_step; vectors arrive as [P, 1, N] blocks -> [1, N]
        w = {name: ref[sub] for name, ref in zip(_WNAMES, w_refs)}
        for name, ref in zip(quant_names, w_refs[len(_WNAMES):]):
            w[name + "_s"] = ref[sub]

        (new_utt, new_rc, new_mem_row, new_mem_state, new_lc_k,
         new_lc_v) = _layer_math(
            utt_s[ts], rc_s[ts], memrow_s[ts] if use_mem else None,
            mem_ref[sub], lc_k_ref[sub], lc_v_ref[sub],
            len_ref[...], reset_ref[...], advance_ref[...], w,
            U=U, R=R, M=M, Lc=Lc, H=H, use_mem=use_mem,
            tanh_on_mem=tanh_on_mem, neg_inf=neg_inf,
            activation=activation, cdt=cdt,
            state_dtype=out_lc_k_ref.dtype, quant_names=quant_names,
            ffn_slices=ffn_slices)

        utt_s[ts] = new_utt
        rc_s[ts] = new_rc
        if use_mem:
            memrow_s[ts] = new_mem_row
        out_mem_ref[sub] = new_mem_state.astype(out_mem_ref.dtype)
        out_lc_k_ref[sub] = new_lc_k
        out_lc_v_ref[sub] = new_lc_v
    # y maps to batch tile i for every l; the last layer's write wins.
    y_ref[...] = new_utt


@functools.partial(
    jax.jit, static_argnames=("U", "R", "M", "Lc", "H", "use_mem",
                              "tanh_on_mem", "neg_inf", "activation",
                              "cdt_name", "tile", "interpret", "quant",
                              "ffn_slices", "layers_per_step"))
def fused_emformer_stack(params: dict, x: jax.Array, mem: jax.Array,
                         lc_k: jax.Array, lc_v: jax.Array,
                         length: jax.Array, reset=None, advance=None, *,
                         U: int, R: int, M: int, Lc: int, H: int,
                         use_mem: bool, tanh_on_mem: bool, neg_inf: float,
                         activation: str, cdt_name: str = "bfloat16",
                         tile: int = 64, interpret: bool = False,
                         quant: bool = False, ffn_slices: int = 1,
                         layers_per_step: int = 1):
    """All-layer streaming Emformer step as one Pallas kernel.

    params: stacked layer params ([L, ...] leaves, as init_emformer_params
    builds them).  x [B, U+R, D] f32 (utterance then right-context);
    mem [L,B,M,D] / lc_k / lc_v [L,B,Lc,D] carried state; length [B] i32
    RESET-EFFECTIVE frame counters; reset/advance optional [B] bool slot
    lifecycle masks.  Returns (y [B,U,D] f32, new_mem, new_lc_k, new_lc_v).

    quant=True: W8A8 — the five projection/FFN weight stacks are
    quantized to per-output-channel int8 (re-derived from the f32 params
    inside this jit, which keeps the params pytree, checkpoints, and
    converters dtype-unchanged) and the matmuls run on the int8 MXU path
    (2x bf16 peak); activations are per-row dynamically quantized
    in-kernel.  MEASURED NEUTRAL at the production geometry (D=512,
    v5e @512 slots: 13.6 ms int8 vs 12.7 ms bf16) — this kernel is
    VPU/sequencing-bound, not MXU-bound, so the dynamic-quant VPU work
    costs more than the faster matmuls save.  Kept as an opt-in because
    the trade flips at larger d_model/ffn_dim where the MXU share
    dominates.  bf16 stays the default and the oracle.
    """
    L = params["w_q"].shape[0]
    B = x.shape[0]
    D = x.shape[2]
    if L % layers_per_step:
        raise ValueError(
            f"layers_per_step={layers_per_step} must divide L={L}")
    if reset is None:
        reset = jnp.zeros((B,), bool)
    if advance is None:
        advance = jnp.ones((B,), bool)
    cdt = jnp.dtype(cdt_name)
    TB = min(tile, B)
    while B % TB:
        TB -= 1
    NT = B // TB

    M_eff = max(M, 1)
    if M == 0:
        mem = jnp.zeros((L, B, 1, D), mem.dtype)

    def _shape(w):
        # stacked vectors [L, N] -> [L, 1, N] so the (1, 1, N) block's
        # trailing dims match the array (a Mosaic block-shape requirement)
        return w[:, None, :] if w.ndim == 2 else w

    def cast(name):
        return _shape(params[name].astype(cdt))

    def f32(name):
        return _shape(params[name].astype(jnp.float32))

    def q8(name):
        w8, _ = _quantize_weight(params[name], axis=-2)
        return w8

    def qs(name):
        _, s = _quantize_weight(params[name], axis=-2)
        return s                                     # [L, 1, N] f32

    quant_names = _kernel_quant_names(quant)
    # kernel weight name <-> stacked param name ("wq" <-> "w_q" etc.)
    pname = {"wq": "w_q", "wkv": "w_kv", "wout": "w_out",
             "ffw1": "ff_w1", "ffw2": "ff_w2"}

    def big(kname):
        n = pname[kname]
        return q8(n) if kname in quant_names else cast(n)

    weights = [
        big("wq"), cast("b_q"), big("wkv"), cast("b_kv"),
        big("wout"), cast("b_out"),
        f32("ln_in_scale"), f32("ln_in_bias"),
        f32("ff_ln_scale"), f32("ff_ln_bias"),
        big("ffw1"), cast("ff_b1"), big("ffw2"), cast("ff_b2"),
        f32("ln_out_scale"), f32("ln_out_bias"),
    ]
    weights += [qs(pname[k]) for k in quant_names]

    def weight_spec(shape):
        # layers_per_step layers' block, indexed by the layer grid dim
        nd = len(shape)
        return pl.BlockSpec((layers_per_step,) + shape[1:],
                            lambda l, i, nd=nd: (l,) + (0,) * (nd - 1),
                            memory_space=pltpu.VMEM)

    def state_spec(rows, dt_unused=None):
        return pl.BlockSpec((layers_per_step, TB, rows, D),
                            lambda l, i: (l, i, 0, 0),
                            memory_space=pltpu.VMEM)

    mask_spec = pl.BlockSpec((TB, 1), lambda l, i: (i, 0),
                             memory_space=pltpu.VMEM)

    in_specs = [
        pl.BlockSpec((TB, x.shape[1], D), lambda l, i: (i, 0, 0),
                     memory_space=pltpu.VMEM),           # x
        mask_spec, mask_spec, mask_spec,                 # len/reset/advance
        state_spec(M_eff), state_spec(Lc), state_spec(Lc),
    ] + [weight_spec(w.shape) for w in weights]

    out_shapes = (
        jax.ShapeDtypeStruct((B, U, D), jnp.float32),            # y
        jax.ShapeDtypeStruct((L, B, M_eff, D), mem.dtype),
        jax.ShapeDtypeStruct((L, B, Lc, D), lc_k.dtype),
        jax.ShapeDtypeStruct((L, B, Lc, D), lc_v.dtype),
    )
    out_specs = (
        pl.BlockSpec((TB, U, D), lambda l, i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        state_spec(M_eff), state_spec(Lc), state_spec(Lc),
    )

    kernel = functools.partial(
        _stack_kernel, U=U, R=R, M=M, Lc=Lc, H=H, TB=TB, use_mem=use_mem,
        tanh_on_mem=tanh_on_mem, neg_inf=neg_inf, activation=activation,
        cdt=cdt, quant=quant, ffn_slices=ffn_slices,
        layers_per_step=layers_per_step)

    outs = pl.pallas_call(
        kernel,
        grid=(L // layers_per_step, NT),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((B, U, D), jnp.float32),    # utterance carry
            pltpu.VMEM((B, R, D), jnp.float32),    # right-context carry
            pltpu.VMEM((B, 1, D), jnp.float32),    # memory-row carry
        ],
        compiler_params=pltpu.CompilerParams(
            # default 110 MB; ASR_PALLAS_VMEM_MB overrides for tile/P
            # sweeps pressing toward v5e's physical ~128 MB
            vmem_limit_bytes=int(os.environ.get(
                "ASR_PALLAS_VMEM_MB", "110")) * 1024 * 1024,
            # layer dim: sequential (inter-layer activations flow through
            # the VMEM scratch); tile dim: independent — lets Mosaic
            # overlap tile i+1's state DMA with tile i's compute
            dimension_semantics=("arbitrary", "parallel")),
        interpret=interpret,
    )(x.astype(jnp.float32), length.astype(jnp.int32).reshape(B, 1),
      reset.astype(jnp.int32).reshape(B, 1),
      advance.astype(jnp.int32).reshape(B, 1),
      mem, lc_k, lc_v, *weights)

    y, new_mem, new_lc_k, new_lc_v = outs
    if M == 0:
        new_mem = new_mem[:, :, :0]
    return y, new_mem, new_lc_k, new_lc_v
