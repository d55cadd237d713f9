"""Exact iterative top-k without the full batched sort.

``jax.lax.top_k`` on TPU lowers wide rows to a full batched sort: over
the beam step's [512, 10, 4097] log-prob tensor one call was measured at
16.8 ms (NOTES_r4), repeated (max_symbols+1) times per frame x 4 frames
per chunk — the dominant term of the device RNNT beam's 702 ms first cut.
The beam only ever needs k = beam_width (10) winners.

``iter_topk`` returns bit-identical values AND indices to lax.top_k
(ties resolve to the lowest index) in one block-max pass over the row
plus k tiny selection rounds:

  1. reduce the row to NB = ceil(N/128) block maxima (the only pass over
     the full tensor — and XLA fuses the caller's elementwise candidate
     construction into it);
  2. each round: pick the winning block from the tiny [R, NB] bm array
     (first block on ties -> lowest global index), gather that single
     128-wide block, take its first-occurrence max, then knock the pick
     out by recomputing just that block's max (previous picks are
     re-masked in the gathered copy — the big tensor is never written).

Used by models/rnnt_beam.py; oracle-tested against lax.top_k (including
tie, all-equal, -inf and below--3e38 rows) in tests/test_topk.py.

Input domain: any finite f32 values and -inf (padding and knockout are
masked by POSITION, not by value sentinel, so pathological magnitudes
cannot beat real candidates).  NaN inputs are NOT supported (equality
selection would return index N for the affected rows); lax.top_k's own
NaN ordering is backend-defined, so no parity target exists there.
Rows containing -inf additionally require k <= 128 (one selection
block) — beam callers use k = beam_width <= 50.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

_BLOCK = 128
_NEG_INF = jnp.float32(-jnp.inf)


def iter_topk(x: jax.Array, k: int) -> Tuple[jax.Array, jax.Array]:
    """Top-k along the last axis; equals jax.lax.top_k(x, k) exactly.

    x: [..., N] floating point, N >= k.  Returns (values [..., k] x.dtype,
    indices [..., k] int32), descending, ties to the lowest index.
    """
    if x.ndim == 1:
        v, i = iter_topk(x[None], k)
        return v[0], i[0]
    lead = x.shape[:-1]
    N = x.shape[-1]
    if N < k:
        raise ValueError(f"iter_topk: N={N} < k={k}")
    R = 1
    for d in lead:
        R *= d
    xf = x.reshape(R, N).astype(jnp.float32)
    NB = -(-N // _BLOCK)
    pad = NB * _BLOCK - N
    if pad:
        xf = jnp.pad(xf, ((0, 0), (0, pad)), constant_values=-jnp.inf)
    xb = xf.reshape(R, NB, _BLOCK)
    bm = jnp.max(xb, axis=-1)                                  # [R, NB]

    iota_nb = jax.lax.broadcasted_iota(jnp.int32, (R, NB), 1)
    iota_bk = jax.lax.broadcasted_iota(jnp.int32, (R, _BLOCK), 1)

    vals, idxs, picks = [], [], []
    for _ in range(k):
        m = jnp.max(bm, axis=-1)                               # [R]
        # winning block: first block holding the max (ties -> lower idx)
        bidx = jnp.min(jnp.where(bm == m[:, None], iota_nb, NB),
                       axis=-1).astype(jnp.int32)
        block = jnp.take_along_axis(
            xb, bidx[:, None, None], axis=1)[:, 0]             # [R, 128]
        # eligibility is POSITIONAL (no value sentinel): in-range lanes
        # of this block that were not picked in a previous round.  Value
        # masking here would break on rows whose real candidates equal
        # the sentinel (-inf rows re-pick their own knockouts).
        elig = (bidx[:, None] * _BLOCK + iota_bk) < N
        for pb, pw in picks:
            elig &= ~((pb == bidx)[:, None] & (iota_bk == pw[:, None]))
        widx = jnp.min(
            jnp.where((block == m[:, None]) & elig, iota_bk, _BLOCK),
            axis=-1).astype(jnp.int32)
        vals.append(m)
        idxs.append(bidx * _BLOCK + widx)
        picks.append((bidx, widx))
        # knock the pick out of the bm cache: recompute this block's max
        # over the remaining eligible lanes (xb itself is never written)
        rem = elig & (iota_bk != widx[:, None])
        new_bm = jnp.max(jnp.where(rem, block, _NEG_INF), axis=-1)
        bm = jnp.where(iota_nb == bidx[:, None], new_bm[:, None], bm)

    v = jnp.stack(vals, axis=-1).astype(x.dtype).reshape(*lead, k)
    i = jnp.stack(idxs, axis=-1).reshape(*lead, k)
    return v, i


def iter_topk_values(x: jax.Array, k: int) -> jax.Array:
    """Values-only top-k (same contract as iter_topk[0])."""
    return iter_topk(x, k)[0]
