"""pallas_row_topk vs lax.top_k (interpret mode on the CPU backend)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from asr_streaming_tpu.ops.pallas_topk import pallas_row_topk


def _check(x, k, tile=128):
    ev, ei = jax.lax.top_k(x, k)
    av, ai = pallas_row_topk(x, k, tile=tile, interpret=True)
    np.testing.assert_array_equal(np.asarray(ev), np.asarray(av))
    np.testing.assert_array_equal(np.asarray(ei), np.asarray(ai))


@pytest.mark.parametrize("shape,k", [
    ((7, 130), 5),           # unaligned rows AND columns
    ((3, 128), 10),          # exactly one lane block
    ((16, 4097), 10),        # the beam's per-hypothesis vocab row
    ((2, 5, 517), 10),       # leading batch dims
])
def test_matches_lax_topk_random(shape, k):
    x = jax.random.normal(jax.random.PRNGKey(0), shape, jnp.float32)
    _check(x, k)


def test_ties_resolve_to_lowest_index():
    x = np.zeros((3, 300), np.float32)
    x[0, [5, 133, 299]] = 7.0        # ties spanning lane blocks
    x[1, [40, 41, 42]] = 2.5         # ties inside one block
    x[2, :] = 1.0                    # fully degenerate row
    _check(jnp.asarray(x), 6)


def test_sentinel_heavy_rows():
    # beam-like rows: mostly -1e30 sentinels, few live entries
    x = np.full((4, 4097), -1.0e30, np.float32)
    x[0, 17] = -3.2
    x[1, [100, 200]] = [-1.0, -1.0]
    _check(jnp.asarray(x), 10)


def test_small_tile_multiple_grid_steps():
    x = jax.random.normal(jax.random.PRNGKey(3), (33, 260), jnp.float32)
    _check(x, 4, tile=8)


def test_beam_shape_smoke():
    # [B, W, V] at a reduced B: the rnnt_beam call pattern
    x = jax.random.normal(jax.random.PRNGKey(4), (8, 10, 4097),
                          jnp.float32)
    _check(x, 10)
