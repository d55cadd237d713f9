"""Pallas row-wise top-k: the beam's per-hypothesis candidate preselect.

``iter_topk`` (ops/topk.py) already avoids lax.top_k's full batched sort,
but its k unrolled XLA selection rounds (block gathers + masked
reductions) cost ~3.9 ms at the beam's [5120, 4097] row shape (NOTES_r5)
— so this kernel runs the WHOLE selection as one Pallas program: each
grid step loads a [TILE, N] row block into VMEM and performs k (max,
first-index, knockout) rounds entirely on-chip.

MEASURED (v5e, [5120, 4097] k=10, forced-drain timing): 2.12 ms vs
iter_topk's 2.95 ms standalone — but WIRED INTO the beam frame it
DOUBLED the frame cost (24.5 -> 52.5 ms): a pallas_call is a fusion
barrier, while XLA fuses iter_topk's first block-max pass into the
joiner/log_softmax producers.  The beam therefore keeps iter_topk
(models/rnnt_beam.py) and this kernel stays as a standalone op for
callers whose input is already materialized.

Contract: equals ``jax.lax.top_k`` (descending values, ties resolve to
the lowest index) for FINITE f32 inputs.  NaNs are unsupported; -inf is
reserved as the kernel's knockout/padding sentinel (the RNNT beam's
sentinels are ~-1e30 and log_softmax outputs are finite, so the beam is
inside the domain; ops/topk.py::iter_topk remains the general fallback
and the CPU path).

Reference for what this replaces: torchaudio's RNNTBeamSearch does this
preselect per hypothesis on host (reference recognition.py:122-133); the
rebuild batches it as [B*W, V] rows on the MXU/VPU.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128


def _topk_kernel(x_ref, vals_ref, idx_ref, *, k: int, n_valid: int):
    x = x_ref[:]                                   # [T, NP] f32, VMEM
    T, NP = x.shape
    iota = jax.lax.broadcasted_iota(jnp.int32, (T, NP), 1)
    # positions beyond the caller's N can never win: domain is finite
    # and pads are -inf, but guard positionally anyway (costs nothing —
    # it fuses into the first round's masked max)
    x = jnp.where(iota < n_valid, x, -jnp.inf)

    vcols, icols = [], []
    for _ in range(k):
        m = jnp.max(x, axis=1, keepdims=True)                   # [T, 1]
        widx = jnp.min(jnp.where(x == m, iota, NP),
                       axis=1, keepdims=True)                   # [T, 1]
        vcols.append(m)
        icols.append(widx)
        # knockout by POSITION: finite-domain inputs can never tie the
        # -inf sentinel, so the picked lane is dead from round j+1 on
        x = jnp.where(iota == widx, -jnp.inf, x)

    pad = _LANE - k
    vals_ref[:] = jnp.concatenate(
        vcols + [jnp.zeros((T, pad), jnp.float32)], axis=1)
    idx_ref[:] = jnp.concatenate(
        icols + [jnp.zeros((T, pad), jnp.int32)], axis=1)


def _pallas_topk_2d(x: jax.Array, k: int, tile: int,
                    interpret: bool = False) -> Tuple[jax.Array,
                                                      jax.Array]:
    # NOTE: deliberately not @jax.jit — callers (the beam step) are
    # already jitted; a nested pjit here would only add dispatch layers.
    R, N = x.shape
    NP = -(-N // _LANE) * _LANE
    RP = -(-R // tile) * tile
    if NP != N or RP != R:
        x = jnp.pad(x, ((0, RP - R), (0, NP - N)),
                    constant_values=-jnp.inf)
    grid = (RP // tile,)
    vals, idx = pl.pallas_call(
        functools.partial(_topk_kernel, k=k, n_valid=N),
        grid=grid,
        in_specs=[pl.BlockSpec((tile, NP), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((tile, _LANE), lambda i: (i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((tile, _LANE), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((RP, _LANE), jnp.float32),
                   jax.ShapeDtypeStruct((RP, _LANE), jnp.int32)],
        interpret=interpret,
    )(x)
    return vals[:R, :k], idx[:R, :k]


def pallas_row_topk(x: jax.Array, k: int, tile: int = 128,
                    interpret: bool = False) -> Tuple[jax.Array,
                                                      jax.Array]:
    """Top-k along the last axis (finite f32 domain, k <= 128).

    Returns (values [..., k] f32, indices [..., k] int32), descending,
    ties to the lowest index — lax.top_k's contract."""
    if k > _LANE:
        raise ValueError(f"pallas_row_topk: k={k} > {_LANE}")
    lead = x.shape[:-1]
    N = x.shape[-1]
    if N < k:
        raise ValueError(f"pallas_row_topk: N={N} < k={k}")
    R = 1
    for d in lead:
        R *= d
    v, i = _pallas_topk_2d(x.reshape(R, N).astype(jnp.float32), k, tile,
                           interpret=interpret)
    return (v.reshape(*lead, k).astype(x.dtype),
            i.reshape(*lead, k))

