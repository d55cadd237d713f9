"""RNNT training: forward shapes + loss decreases."""

import numpy as np
import jax
import jax.numpy as jnp
import optax

from asr_streaming_tpu.models.rnnt import RNNTConfig, init_rnnt_params
from asr_streaming_tpu.train.rnnt import (
    RNNTBatch, make_rnnt_train_step, rnnt_loss_fn, transcriber_forward,
)

CFG = RNNTConfig.tiny()


def _batch(B=2, T_mel=40, U=4, seed=0):
    rng = np.random.default_rng(seed)
    return RNNTBatch(
        feats=jnp.asarray(rng.standard_normal((B, T_mel, CFG.n_mels)),
                          dtype=jnp.float32),
        feat_lens=jnp.full((B,), T_mel, jnp.int32),
        targets=jnp.asarray(rng.integers(0, CFG.blank, (B, U)),
                            dtype=jnp.int32),
        target_lens=jnp.full((B,), U, jnp.int32))


def test_transcriber_forward_shapes():
    params = init_rnnt_params(jax.random.PRNGKey(0), CFG)
    batch = _batch()
    enc = transcriber_forward(params, CFG, batch.feats)
    assert enc.shape == (2, 10, CFG.encoding_dim)
    loss = float(rnnt_loss_fn(params, CFG, batch))
    assert np.isfinite(loss) and loss > 0


def test_rnnt_training_reduces_loss():
    params = init_rnnt_params(jax.random.PRNGKey(1), CFG)
    optimizer = optax.adam(2e-3)
    step = jax.jit(make_rnnt_train_step(CFG, optimizer))
    opt_state = optimizer.init(params)
    batch = _batch(seed=3)
    losses = []
    for _ in range(10):
        params, opt_state, loss = step(params, opt_state, batch)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.9
    assert np.isfinite(losses).all()
