"""Pallas TPU kernel: fused Emformer streaming-attention core.

The Emformer step's attention is many small per-stream attentions
(Q = R+U+1 = 21 queries, K = M+R+Lc+U = 56 keys at the vi geometry).
XLA materializes the masked [B, H, Q, K] logits and softmax through HBM;
this kernel keeps the whole per-stream attention — logits, validity
masking (memory/left-context fill counts + the summary-row rule,
reference emformer.py:199-211), fp32 softmax, and the value contraction —
in VMEM, one grid step per stream.

Used by the serving step when ``EmformerConfig.use_pallas_attention`` is
set (TPU only); the XLA einsum path remains the default and the
correctness oracle (tests run the kernel in interpreter mode on CPU).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _attention_kernel(mm_ref, mkv_ref, q_ref, k_ref, v_ref, o_ref, *,
                      num_heads: int, head_dim: int, M: int, R: int,
                      Lc: int, U: int, Q: int, K: int, q_pad: int,
                      k_pad: int, use_mem: bool, neg_inf: float):
    b = pl.program_id(0)
    m_m = mm_ref[b]
    m_kv = mkv_ref[b]

    q = q_ref[0].astype(jnp.float32)         # [q_pad, D]
    k = k_ref[0].astype(jnp.float32)         # [k_pad, D]
    v = v_ref[0].astype(jnp.float32)

    H, Dh = num_heads, head_dim
    scaling = 1.0 / math.sqrt(Dh)

    # key validity (column mask), shared across heads/queries
    col = jax.lax.broadcasted_iota(jnp.int32, (1, k_pad), 1)
    valid = col < K
    if use_mem:
        # memory slots: first M - m_m invalid
        valid &= ~((col < M) & (col < (M - m_m)))
    # left-context slots [M+R, M+R+Lc): first Lc - m_kv invalid
    lc_start = M + R
    valid &= ~((col >= lc_start) & (col < lc_start + (Lc - m_kv)))

    row = jax.lax.broadcasted_iota(jnp.int32, (q_pad, 1), 0)
    # summary query = row Q-1 (when use_mem): never attends memory cols
    if use_mem:
        summary_block = (row == (Q - 1)) & (col < M)
    else:
        summary_block = jnp.zeros((q_pad, k_pad), bool)
    mask = valid & ~summary_block             # [q_pad, k_pad]

    outs = []
    for h in range(H):
        qh = q[:, h * Dh:(h + 1) * Dh] * scaling
        kh = k[:, h * Dh:(h + 1) * Dh]
        vh = v[:, h * Dh:(h + 1) * Dh]
        logits = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)            # [q_pad, k_pad]
        logits = jnp.where(mask, logits, neg_inf)
        probs = jax.nn.softmax(logits, axis=-1)
        outs.append(jax.lax.dot_general(
            probs, vh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))           # [q_pad, Dh]

    o_ref[0] = jnp.concatenate(outs, axis=1).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=(
    "num_heads", "M", "R", "Lc", "U", "use_mem", "neg_inf", "interpret"))
def fused_emformer_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                             m_m: jax.Array, m_kv: jax.Array, *,
                             num_heads: int, M: int, R: int, Lc: int,
                             U: int, use_mem: bool = True,
                             neg_inf: float = -1e8,
                             interpret: bool = False) -> jax.Array:
    """q: [B, Q, D]; k/v: [B, K, D]; m_m/m_kv: [B] int32 fill counts.
    Returns [B, Q, D] attention output (pre-out-projection)."""
    B, Q, D = q.shape
    K = k.shape[1]
    Dh = D // num_heads
    q_pad = _round_up(Q, 8)
    k_pad = _round_up(K, 8)
    qp = jnp.pad(q, ((0, 0), (0, q_pad - Q), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, k_pad - K), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, k_pad - K), (0, 0)))

    kernel = functools.partial(
        _attention_kernel, num_heads=num_heads, head_dim=Dh, M=M, R=R,
        Lc=Lc, U=U, Q=Q, K=K, q_pad=q_pad, k_pad=k_pad, use_mem=use_mem,
        neg_inf=neg_inf)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, q_pad, D), lambda b, mm, mkv: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k_pad, D), lambda b, mm, mkv: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k_pad, D), lambda b, mm, mkv: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, q_pad, D), lambda b, mm, mkv: (b, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, q_pad, D), q.dtype),
        interpret=interpret,
    )(m_m.astype(jnp.int32), m_kv.astype(jnp.int32), qp, kp, vp)
    return out[:, :Q]
