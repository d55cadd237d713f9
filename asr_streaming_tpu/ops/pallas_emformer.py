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


def _layer_kernel(
    # per-tile tensors
    utt_ref, rc_ref, mem_row_ref, mem_state_ref, lc_k_ref, lc_v_ref,
    len_ref, reset_ref, advance_ref,
    # layer weights (full arrays, fetched once)
    wq_ref, bq_ref, wkv_ref, bkv_ref, wout_ref, bout_ref,
    lnin_s_ref, lnin_b_ref, ffln_s_ref, ffln_b_ref,
    ffw1_ref, ffb1_ref, ffw2_ref, ffb2_ref, lnout_s_ref, lnout_b_ref,
    # outputs
    out_utt_ref, out_rc_ref, out_mem_row_ref, out_mem_state_ref,
    out_lc_k_ref, out_lc_v_ref,
    *, U: int, R: int, M: int, Lc: int, H: int, use_mem: bool,
    tanh_on_mem: bool, neg_inf: float, activation: str, cdt,
):
    TB = utt_ref.shape[0]
    D = utt_ref.shape[2]
    Dh = D // H
    K = M + R + Lc + U
    Q = R + U + (1 if use_mem else 0)

    utt = utt_ref[...].astype(jnp.float32)              # [TB, U, D]
    rc = rc_ref[...].astype(jnp.float32)                # [TB, R, D]

    # per-slot stream lifecycle masks (see emformer_stream_step): reset
    # zeroes the carried state in VMEM on load; advance gates the write-
    # back — this replaces two full-state jnp.where traversals in HBM
    reset3 = (reset_ref[...] > 0)[:, :, None]           # [TB, 1, 1]
    adv3 = (advance_ref[...] > 0)[:, :, None]

    lnin_s = lnin_s_ref[...].astype(jnp.float32)
    lnin_b = lnin_b_ref[...].astype(jnp.float32)
    ln_rc = _ln(rc, lnin_s, lnin_b)
    ln_utt = _ln(utt, lnin_s, lnin_b)

    if use_mem:
        summary = jnp.mean(ln_utt, axis=1, keepdims=True)   # [TB, 1, D]
        q_in = jnp.concatenate([ln_rc, ln_utt, summary], axis=1)
    else:
        q_in = jnp.concatenate([ln_rc, ln_utt], axis=1)

    # ---- projections (2D dots on the MXU; rows = TB * tokens)
    wq = wq_ref[...]
    q = (jnp.dot(q_in.reshape(TB * Q, D).astype(cdt), wq,
                 preferred_element_type=jnp.float32).astype(cdt)
         + bq_ref[...].astype(cdt)).reshape(TB, Q, D)

    mem_state = jnp.where(reset3, 0, mem_state_ref[...])
    if use_mem:
        kv_in = jnp.concatenate(
            [mem_state.astype(cdt), ln_rc.astype(cdt),
             ln_utt.astype(cdt)], axis=1)                # [TB, M+R+U, D]
    else:
        kv_in = jnp.concatenate(
            [ln_rc.astype(cdt), ln_utt.astype(cdt)], axis=1)
    n_kv = M + R + U
    kv = (jnp.dot(kv_in.reshape(TB * n_kv, D), wkv_ref[...],
                  preferred_element_type=jnp.float32).astype(cdt)
          + bkv_ref[...].astype(cdt)).reshape(TB, n_kv, 2 * D)
    k_part = kv[:, :, :D]
    v_part = kv[:, :, D:]
    next_k = k_part[:, M + R:]                           # [TB, U, D]
    next_v = v_part[:, M + R:]

    lc_k = jnp.where(reset3, 0, lc_k_ref[...]).astype(cdt)
    lc_v = jnp.where(reset3, 0, lc_v_ref[...]).astype(cdt)
    full_k = jnp.concatenate([k_part[:, :M + R], lc_k, next_k], axis=1)
    full_v = jnp.concatenate([v_part[:, :M + R], lc_v, next_v], axis=1)

    # ---- key-validity mask from the per-stream fill counters
    length = len_ref[...]                                # [TB, 1] int32
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

    out = (jnp.dot(attn.reshape(TB * Q, D), wout_ref[...],
                   preferred_element_type=jnp.float32).astype(cdt)
           + bout_ref[...].astype(cdt)).reshape(TB, Q, D)

    rc_utt_out = out[:, :R + U].astype(jnp.float32)
    if use_mem:
        mem_out = out[:, R + U:].astype(jnp.float32)
        if tanh_on_mem:
            new_mem_row = jnp.tanh(mem_out)
        else:
            new_mem_row = jnp.clip(mem_out, -10.0, 10.0)
        out_mem_row_ref[...] = new_mem_row

    # ---- residual FFN + output LN
    residual = rc_utt_out + jnp.concatenate([rc, utt], axis=1)
    ff = _ln(residual, ffln_s_ref[...].astype(jnp.float32),
             ffln_b_ref[...].astype(jnp.float32))
    act = {"relu": jax.nn.relu, "gelu": jax.nn.gelu,
           "silu": jax.nn.silu}[activation]
    T = R + U
    h1 = act(jnp.dot(ff.reshape(TB * T, D).astype(cdt), ffw1_ref[...],
                     preferred_element_type=jnp.float32).astype(cdt)
             + ffb1_ref[...].astype(cdt))
    h2 = (jnp.dot(h1, ffw2_ref[...],
                  preferred_element_type=jnp.float32).astype(cdt)
          + ffb2_ref[...].astype(cdt)).reshape(TB, T, D)
    result = _ln(residual + h2.astype(jnp.float32),
                 lnout_s_ref[...].astype(jnp.float32),
                 lnout_b_ref[...].astype(jnp.float32))

    out_rc_ref[...] = result[:, :R]
    out_utt_ref[...] = result[:, R:]

    # ---- state roll (newest at the end), committed only where advance
    if use_mem:
        rolled = jnp.concatenate(
            [mem_state[:, 1:],
             mem_row_ref[...].astype(mem_state.dtype)], axis=1)
        out_mem_state_ref[...] = jnp.where(adv3, rolled, mem_state)
    else:
        out_mem_state_ref[...] = mem_state
    keep = max(0, Lc - U)
    new_lc_k = jnp.concatenate(
        [lc_k[:, Lc - keep:], next_k[:, U - (Lc - keep):]],
        axis=1).astype(out_lc_k_ref.dtype)
    new_lc_v = jnp.concatenate(
        [lc_v[:, Lc - keep:], next_v[:, U - (Lc - keep):]],
        axis=1).astype(out_lc_v_ref.dtype)
    out_lc_k_ref[...] = jnp.where(adv3, new_lc_k,
                                  lc_k.astype(out_lc_k_ref.dtype))
    out_lc_v_ref[...] = jnp.where(adv3, new_lc_v,
                                  lc_v.astype(out_lc_v_ref.dtype))


@functools.partial(
    jax.jit, static_argnames=("U", "R", "M", "Lc", "H", "use_mem",
                              "tanh_on_mem", "neg_inf", "activation",
                              "cdt_name", "tile", "interpret"))
def fused_emformer_layer(p: dict, utt: jax.Array, rc: jax.Array,
                         mem_row, mem_state: jax.Array,
                         lc_k: jax.Array, lc_v: jax.Array,
                         length: jax.Array,
                         reset=None, advance=None, *,
                         U: int, R: int, M: int, Lc: int, H: int,
                         use_mem: bool, tanh_on_mem: bool, neg_inf: float,
                         activation: str, cdt_name: str = "bfloat16",
                         tile: int = 64, interpret: bool = False
                         ) -> Tuple:
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

    weights = [
        cast(p["w_q"]), cast(p["b_q"]), cast(p["w_kv"]), cast(p["b_kv"]),
        cast(p["w_out"]), cast(p["b_out"]),
        f32(p["ln_in_scale"]), f32(p["ln_in_bias"]),
        f32(p["ff_ln_scale"]), f32(p["ff_ln_bias"]),
        cast(p["ff_w1"]), cast(p["ff_b1"]), cast(p["ff_w2"]),
        cast(p["ff_b2"]),
        f32(p["ln_out_scale"]), f32(p["ln_out_bias"]),
    ]

    kernel = functools.partial(
        _layer_kernel, U=U, R=R, M=M, Lc=Lc, H=H, use_mem=use_mem,
        tanh_on_mem=tanh_on_mem, neg_inf=neg_inf, activation=activation,
        cdt=cdt)

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
