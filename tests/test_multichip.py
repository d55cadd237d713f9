"""Multi-chip sharding: serving step + training step over a device mesh.

Runs on the virtual 8-device CPU mesh (conftest).  The serving design
shards stream slots over the 'data' axis — each chip serves its slice
with zero per-tick collectives; training shards batch over 'data' and
the Emformer FFN/attention over 'model' (GSPMD inserts the reductions).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from asr_streaming_tpu.models.asr import ASRConfig
from asr_streaming_tpu.models.serving import (
    ServingConfig, init_audio_context, init_emission_buffer,
    init_serving_params, init_serving_state, serving_step,
)
from asr_streaming_tpu.parallel.mesh import make_mesh, shard_params
from asr_streaming_tpu.train.ctc import Batch, make_optimizer, make_train_step

VOCAB_SIZE = 24


def _cfg():
    return ServingConfig(asr=ASRConfig.tiny(vocab_size=VOCAB_SIZE),
                         use_silero=False)


def test_serving_step_shards_over_streams():
    """Slots sharded over 8 devices must produce the same results as a
    single-device run (data-parallel serving)."""
    assert len(jax.devices()) >= 8
    cfg = _cfg()
    params = init_serving_params(jax.random.PRNGKey(0), cfg)
    B = 16
    rng = np.random.default_rng(0)
    seg = (rng.standard_normal((B, cfg.asr.audio.segment_length))
           * 8000).astype(np.int16)
    flags0 = np.zeros(B, bool)
    active = np.ones(B, bool)

    def run(sharding=None):
        state = init_serving_state(cfg, B)
        ctx = init_audio_context(cfg, B)
        emission = init_emission_buffer(cfg, B)
        args = [jnp.asarray(seg), jnp.asarray(flags0), jnp.asarray(active),
                jnp.asarray(flags0), jnp.asarray(flags0)]
        if sharding is not None:
            mesh = sharding.mesh

            def shard_state_leaf(x):
                # EmformerState: [L, B, ...] tensors shard on axis 1
                # (streams); the [B] length vector shards on axis 0.
                spec = P("data") if x.ndim == 1 else \
                    P(None, "data", *([None] * (x.ndim - 2)))
                return jax.device_put(x, NamedSharding(mesh, spec))

            args = [jax.device_put(a, sharding) for a in args]
            state = jax.tree.map(shard_state_leaf, state)
            ctx = jax.device_put(ctx, sharding)
            emission = jax.device_put(emission, sharding)
        step = jax.jit(lambda *a: serving_step(params, cfg, *a))
        out = step(*args, state, ctx, emission)
        out2 = step(jnp.asarray(seg), jnp.asarray(flags0),
                    jnp.asarray(active), jnp.asarray(flags0),
                    jnp.asarray(flags0), out.state, out.ctx, out.emission)
        return np.asarray(out2.pack)

    mesh = make_mesh(8, model_parallel=1)
    sharded = run(NamedSharding(mesh, P("data")))
    single = run(None)
    np.testing.assert_allclose(sharded, single, rtol=1e-4, atol=1e-4)


def test_training_step_dp_tp_loss_matches_replicated():
    """(data=4, model=2) sharded training step == unsharded loss."""
    from asr_streaming_tpu.models.emformer import EmformerConfig
    from asr_streaming_tpu.models.encoder import EncoderConfig
    from asr_streaming_tpu.models.asr import init_asr_params

    emf = EmformerConfig(d_model=32, num_heads=4, ffn_dim=64, num_layers=2)
    cfg = ASRConfig(encoder=EncoderConfig(
        input_dim=128, d_model=32, vocab_size=VOCAB_SIZE, ctc_hidden_dim=32,
        emformer=emf))
    params = init_asr_params(jax.random.PRNGKey(0), cfg)
    optimizer = make_optimizer(cfg, warmup_steps=10)
    train_step = make_train_step(cfg, optimizer)

    rng = np.random.default_rng(1)
    batch = Batch(
        feats=jnp.asarray(rng.standard_normal((8, 160, 128)),
                          dtype=jnp.float32),
        feat_lens=jnp.full((8,), 160, jnp.int32),
        labels=jnp.asarray(rng.integers(2, VOCAB_SIZE, (8, 10)),
                           dtype=jnp.int32),
        label_lens=jnp.full((8,), 10, jnp.int32))

    # unsharded
    opt_state = optimizer.init(params["encoder"])
    _, _, loss_ref = jax.jit(train_step)(params, opt_state, batch)

    # sharded
    mesh = make_mesh(8, model_parallel=2)
    with mesh:
        sp = shard_params(params, mesh)
        opt_state_s = optimizer.init(sp["encoder"])
        batch_s = jax.tree.map(
            lambda x: jax.device_put(x, NamedSharding(mesh, P("data"))),
            batch)
        _, _, loss_sharded = jax.jit(train_step)(sp, opt_state_s, batch_s)

    assert float(loss_sharded) == pytest.approx(float(loss_ref), rel=1e-4)


def test_multiprocess_dryrun(capfd):
    """The DCN story has an executable artifact: 2 jax.distributed
    processes x 2 virtual CPU devices form one global mesh; a
    data-parallel training step's gradient all-reduce and a sharded
    serving tick's slot axis both cross the process boundary
    (__graft_entry__._dryrun_multiprocess; the driver runs the same
    path at 2x4 from dryrun_multichip)."""
    import sys
    sys.path.insert(0, ".")
    import __graft_entry__
    __graft_entry__._dryrun_multiprocess(4)
    out = capfd.readouterr().out
    assert "dryrun_multichip multiprocess: 2 procs x 2 devices" in out
    assert "spanning the process boundary OK" in out


def test_train_loss_decreases():
    """Few steps of CTC training on a tiny model reduce the loss."""
    from asr_streaming_tpu.models.emformer import EmformerConfig
    from asr_streaming_tpu.models.encoder import EncoderConfig
    from asr_streaming_tpu.models.asr import init_asr_params
    import optax

    emf = EmformerConfig(d_model=32, num_heads=4, ffn_dim=64, num_layers=2)
    cfg = ASRConfig(encoder=EncoderConfig(
        input_dim=16, d_model=32, vocab_size=8, ctc_hidden_dim=32,
        emformer=emf))
    params = init_asr_params(jax.random.PRNGKey(0), cfg)
    optimizer = optax.adam(3e-3)
    train_step = jax.jit(make_train_step(cfg, optimizer))
    opt_state = optimizer.init(params["encoder"])

    rng = np.random.default_rng(2)
    batch = Batch(
        feats=jnp.asarray(rng.standard_normal((4, 80, 16)),
                          dtype=jnp.float32),
        feat_lens=jnp.full((4,), 80, jnp.int32),
        labels=jnp.asarray(rng.integers(2, 8, (4, 5)), dtype=jnp.int32),
        label_lens=jnp.full((4,), 5, jnp.int32))

    losses = []
    for _ in range(12):
        params, opt_state, loss = train_step(params, opt_state, batch)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.8
    assert np.isfinite(losses).all()
