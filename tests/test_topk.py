"""iter_topk oracle tests: bit-equal to jax.lax.top_k, including ties."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from asr_streaming_tpu.ops.topk import iter_topk


def _check(x, k):
    ev, ei = jax.lax.top_k(x, k)
    av, ai = iter_topk(x, k)
    np.testing.assert_array_equal(np.asarray(ev), np.asarray(av))
    np.testing.assert_array_equal(np.asarray(ei), np.asarray(ai))


@pytest.mark.parametrize("shape,k", [
    ((7, 130), 5),          # just past one block
    ((3, 128), 10),         # exactly one block
    ((4, 4097), 10),        # the beam's per-hypothesis vocab row
    ((2, 5, 4097), 10),     # leading batch dims
    ((2, 40970), 10),       # the beam's flattened W*V row
])
def test_matches_lax_topk_random(shape, k):
    x = jax.random.normal(jax.random.PRNGKey(0), shape, jnp.float32)
    _check(x, k)


def test_ties_resolve_to_lowest_index():
    # duplicate the max across blocks and within a block
    x = np.zeros((3, 300), np.float32)
    x[0, [5, 133, 299]] = 7.0        # ties spanning three blocks
    x[1, [40, 41, 42]] = 2.5         # ties inside one block
    x[2, :] = 1.0                    # fully degenerate row
    _check(jnp.asarray(x), 6)


def test_sentinel_heavy_rows():
    # beam-like rows: mostly -1e30 sentinels, few live entries
    x = np.full((4, 4097), -1.0e30, np.float32)
    x[0, 17] = -3.2
    x[1, [100, 200]] = [-1.0, -1.0]
    _check(jnp.asarray(x), 10)


def test_bfloat16_dtype():
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 515), jnp.bfloat16)
    ev, _ = jax.lax.top_k(x, 4)
    av, _ = iter_topk(x, 4)
    assert av.dtype == ev.dtype
    np.testing.assert_array_equal(
        np.asarray(ev, np.float32), np.asarray(av, np.float32))


def test_under_jit_and_1d():
    x = jax.random.normal(jax.random.PRNGKey(2), (600,), jnp.float32)
    f = jax.jit(lambda a: iter_topk(a, 8))
    ev, ei = jax.lax.top_k(x, 8)
    av, ai = f(x)
    np.testing.assert_array_equal(np.asarray(ev), np.asarray(av))
    np.testing.assert_array_equal(np.asarray(ei), np.asarray(ai))


def test_neg_inf_and_below_sentinel_rows():
    # ADVICE r4: value-sentinel padding let pads win on -inf / <-3e38
    # rows (out-of-range indices).  Masking is positional now.
    x = np.full((5, 300), -np.inf, np.float32)
    x[0, [2, 250]] = [-3.1e38, -3.3e38]   # below the old -3.0e38 sentinel
    x[1, 7] = -1.0                        # one live entry, rest -inf
    x[2, :] = -np.inf                     # fully -inf row
    x[3, 299] = 0.5                       # live entry in the padded block
    x[4, [0, 128, 256]] = -3.2e38         # ties below the old sentinel
    v, i = iter_topk(jnp.asarray(x), 6)
    iv = np.asarray(i)
    assert iv.max() < 300 and iv.min() >= 0
    ev, ei = jax.lax.top_k(jnp.asarray(x), 6)
    np.testing.assert_array_equal(np.asarray(ev), np.asarray(v))
    np.testing.assert_array_equal(np.asarray(ei), iv)


def test_all_neg_inf_indices_are_a_permutation():
    # every value equal: lax.top_k returns ascending indices; so must we
    x = jnp.full((2, 130), -jnp.inf, jnp.float32)
    _check(x, 5)
