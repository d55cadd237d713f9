"""In-place per-slot emission-buffer append (Pallas TPU kernel).

Every serving tick appends each decoding slot's U new emission frames to
its device-resident ring buffer at that slot's own length offset
(models/serving.py).  Expressed as a vmapped ``dynamic_update_slice`` XLA
lowers this to a scatter over the whole [B, MAX_T, V] buffer — measured
at **30 ms/step** at 512 slots (842 MB f16 buffer), i.e. 1.5x the entire
20-layer Emformer step.  The update actually touches only
B x U x V = 13 MB.

This kernel writes exactly those rows: grid over slots, the block index
for both the aliased buffer operand and the output is scalar-prefetched
from the per-slot positions (always multiples of U — lengths advance by
U per decode and reset to 0), and ``input_output_aliases`` keeps the
buffer in place so untouched rows are never copied.

TPU lowering constraints handled here:
  - blocks need sublane counts divisible by 8, so the block spans
    ``lcm(U, 8)`` rows and the in-block offset (a multiple of U) is
    resolved by a statically unrolled ``pl.when`` ladder;
  - Mosaic has no f16 lanes; f16 payloads are stored by the caller as
    packed f32 bit-pairs (models/serving.py) so this kernel only ever
    sees f32/bf16 (a genuine f16 buffer falls back to the XLA oracle).

Reference semantics being replaced: per-stream
``stream.emission = cat(...)`` accumulation on host
(streaming_decoder/streaming_server.py:431-433).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _append_kernel(block_pos, off, decode, rows_ref, buf_ref, out_ref, *,
                   U: int, U_blk: int):
    b = pl.program_id(0)
    out_ref[0] = buf_ref[0]
    for o in range(0, U_blk, U):
        @pl.when((decode[b] != 0) & (off[b] == o))
        def _write(o=o):
            out_ref[0, o:o + U] = rows_ref[0, :U].astype(out_ref.dtype)


def append_supported(max_t: int, U: int) -> bool:
    """Whether the Pallas kernel can serve this buffer geometry."""
    u_blk = math.lcm(U, 8)
    return max_t % u_blk == 0


@functools.partial(jax.jit, static_argnames=("interpret",))
def emission_append(buf: jax.Array, rows: jax.Array, pos: jax.Array,
                    decode: jax.Array, *,
                    interpret: bool = False) -> jax.Array:
    """Write ``rows[b]`` into ``buf[b, pos[b]:pos[b]+U]`` where ``decode[b]``.

    Args:
      buf:    [B, MAX_T, V] device-resident accumulator (donated by the
              caller's jit; aliased in place here).
      rows:   [B, U, V] this tick's new frames.
      pos:    [B] int32 row offsets; each must be a multiple of U in
              [0, MAX_T - U] (the serving step clips and lengths only
              ever advance in U-frame steps).
      decode: [B] bool — slots that actually decoded this tick.

    Returns the updated buffer (same storage as ``buf``).
    """
    B, max_t, V = buf.shape
    U = rows.shape[1]
    U_blk = math.lcm(U, 8)
    assert max_t % U_blk == 0, (max_t, U)

    # NOTE: f16 buffers are not supported on the TPU path (no f16 lanes in
    # Mosaic, and bitcasting the whole buffer forces a full relayout copy
    # — measured ~28 ms at 512 slots).  models/serving.py stores f16 rows
    # packed into f32 words instead; callers with genuine f16 buffers
    # must use the XLA fallback.
    if buf.dtype == jnp.float16 and not interpret:
        return emission_append_xla(buf, rows, pos, decode)

    if U_blk != U:
        rows = jnp.pad(rows, ((0, 0), (0, U_blk - U), (0, 0)))

    block_pos = (pos // U_blk).astype(jnp.int32)
    off = (pos % U_blk).astype(jnp.int32)
    decode_i32 = decode.astype(jnp.int32)

    kernel = functools.partial(_append_kernel, U=U, U_blk=U_blk)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, U_blk, V), lambda b, bp, off, dec: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, U_blk, V),
                         lambda b, bp, off, dec: (b, bp[b], 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, U_blk, V),
                               lambda b, bp, off, dec: (b, bp[b], 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(buf.shape, buf.dtype),
        # operand order: (block_pos, off, decode, rows, buf) -> buf is 4
        input_output_aliases={4: 0},
        interpret=interpret,
    )(block_pos, off, decode_i32, rows, buf)


def emission_append_xla(buf: jax.Array, rows: jax.Array, pos: jax.Array,
                        decode: jax.Array) -> jax.Array:
    """XLA oracle (vmapped dynamic_update_slice -> scatter): used by the
    equivalence tests and as the non-TPU fallback."""
    U = rows.shape[1]
    V = buf.shape[2]
    existing = jax.vmap(
        lambda b, p: jax.lax.dynamic_slice(b, (p, 0), (U, V))
    )(buf, pos)
    new_rows = jnp.where(decode[:, None, None], rows.astype(buf.dtype),
                         existing)
    return jax.vmap(
        lambda b, r, p: jax.lax.dynamic_update_slice(b, r, (p, 0))
    )(buf, new_rows, pos)
