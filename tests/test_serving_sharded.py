"""Multi-chip data-parallel serving (parallel/serving.py) on the virtual
8-device CPU mesh: sharded step == unsharded step, and the full scheduler
produces identical events either way."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from asr_streaming_tpu.models.asr import ASRConfig
from asr_streaming_tpu.models.serving import (
    ServingConfig, init_audio_context, init_emission_buffer,
    init_serving_params, init_serving_state, make_serving_step,
)
from asr_streaming_tpu.parallel.serving import (
    make_serving_mesh, make_sharded_stepper, shard_serving_arrays,
)
from asr_streaming_tpu.streaming.scheduler import Scheduler
from asr_streaming_tpu.text.vocab import placeholder_vocab


def _tiny_cfg(**kw):
    return ServingConfig(asr=ASRConfig.tiny(), use_silero=False,
                         max_emission_frames=64, **kw)


def _tree_allclose(a, b, **kw):
    jax.tree.map(
        lambda x, y: np.testing.assert_allclose(
            np.asarray(x, np.float32), np.asarray(y, np.float32), **kw),
        a, b)


def test_sharded_step_matches_unsharded():
    cfg = _tiny_cfg()
    params = init_serving_params(jax.random.PRNGKey(0), cfg)
    mesh = make_serving_mesh(8)
    B = 16

    rng = np.random.default_rng(0)
    seg = jnp.asarray(rng.integers(-3000, 3000,
                                   (B, cfg.asr.audio.segment_length)),
                      jnp.int16)
    contain = jnp.asarray(rng.integers(0, 2, B).astype(bool))
    active = jnp.ones((B,), bool)
    new = jnp.zeros((B,), bool)
    reset = jnp.asarray([i == 3 for i in range(B)])

    def fresh():
        return (init_serving_state(cfg, B), init_audio_context(cfg, B),
                init_emission_buffer(cfg, B))

    step_fn = make_serving_step(cfg)
    ref_state, ref_ctx, ref_em = fresh()
    ref = jax.jit(lambda *a: step_fn(params, cfg, *a))(
        seg, contain, active, new, reset, ref_state, ref_ctx, ref_em)

    sh_step = make_sharded_stepper(cfg, mesh, params, donate_state=False)
    st, ctx, em = shard_serving_arrays(cfg, mesh, *fresh())
    got = sh_step(params, seg, contain, active, new, reset, st, ctx, em)

    _tree_allclose(got.state, ref.state, rtol=1e-5, atol=1e-5)
    _tree_allclose(got.pack, ref.pack, rtol=1e-5, atol=1e-5)
    _tree_allclose(got.ctx, ref.ctx, rtol=0, atol=0)
    _tree_allclose(got.emission, ref.emission, rtol=1e-5, atol=1e-5)

    # second tick carries the sharded state forward (no reshard needed)
    ref2 = jax.jit(lambda *a: step_fn(params, cfg, *a))(
        seg, contain, active, new, jnp.zeros((B,), bool),
        ref.state, ref.ctx, ref.emission)
    got2 = sh_step(params, seg, contain, active, new,
                   jnp.zeros((B,), bool), got.state, got.ctx, got.emission)
    _tree_allclose(got2.pack, ref2.pack, rtol=1e-5, atol=1e-5)


def test_scheduler_with_mesh_same_events():
    cfg = _tiny_cfg()
    params = init_serving_params(jax.random.PRNGKey(0), cfg)
    vocab = placeholder_vocab(cfg.asr.encoder.vocab_size)
    mesh = make_serving_mesh(8)

    rng = np.random.default_rng(1)
    audio = (rng.standard_normal(16000 * 3) * 0.2).astype(np.float32)

    def run(mesh_arg):
        sched = Scheduler(params, cfg, vocab, max_slots=8, mesh=mesh_arg,
                          donate_state=mesh_arg is None)
        streams = [sched.admit(f"s{i}") for i in range(3)]
        for s in streams:
            s.accept_waveform(audio)
        events = []
        for _ in range(60):
            events.extend(sched.tick())
            if not sched.has_work():
                break
        events.extend(sched.drain())
        return sorted((e.stream_id, e.kind, e.text) for e in events)

    assert run(mesh) == run(None)
    # and the mesh run actually placed state sharded
    sched = Scheduler(params, cfg, vocab, max_slots=8, mesh=mesh,
                      donate_state=False)
    shd = sched.device_state.mem.sharding
    assert getattr(shd, "mesh", None) is not None
    assert not shd.is_fully_replicated


def test_mesh_requires_divisible_slots():
    cfg = _tiny_cfg()
    params = init_serving_params(jax.random.PRNGKey(0), cfg)
    vocab = placeholder_vocab(cfg.asr.encoder.vocab_size)
    mesh = make_serving_mesh(8)
    with pytest.raises(AssertionError):
        Scheduler(params, cfg, vocab, max_slots=6, mesh=mesh)


def test_sharded_rnnt_step_matches():
    from asr_streaming_tpu.models.rnnt import RNNTConfig
    from asr_streaming_tpu.utils.audio import EN_AUDIO
    asr = dataclasses.replace(ASRConfig.tiny(), audio=EN_AUDIO)
    cfg = ServingConfig(asr=asr, model_kind="rnnt", rnnt=RNNTConfig.tiny(),
                        use_silero=False, max_emission_frames=64)
    params = init_serving_params(jax.random.PRNGKey(0), cfg)
    mesh = make_serving_mesh(8)
    B = 8
    rng = np.random.default_rng(2)
    seg_len = cfg.asr.audio.segment_length
    seg = jnp.asarray(rng.integers(-3000, 3000, (B, seg_len)), jnp.int16)
    flags0 = jnp.zeros((B,), bool)
    active = jnp.ones((B,), bool)

    step_fn = make_serving_step(cfg)
    state = init_serving_state(cfg, B)
    ctx = init_audio_context(cfg, B)
    em = init_emission_buffer(cfg, B)
    ref = jax.jit(lambda *a: step_fn(params, cfg, *a))(
        seg, flags0, active, flags0, flags0, state, ctx, em)

    sh_step = make_sharded_stepper(cfg, mesh, params, donate_state=False)
    st, sctx, sem = shard_serving_arrays(
        cfg, mesh, init_serving_state(cfg, B), init_audio_context(cfg, B),
        init_emission_buffer(cfg, B))
    got = sh_step(params, seg, flags0, active, flags0, flags0, st, sctx, sem)
    _tree_allclose(got.pack, ref.pack, rtol=1e-5, atol=1e-5)
    _tree_allclose(got.state, ref.state, rtol=1e-5, atol=1e-5)


def test_sharded_rnnt_beam_step_matches():
    """EN device-beam mode (en_beam_width_device) shards: every BeamState
    leaf rides the slot axis (parallel/serving.py pspecs), and the
    sharded tick's pack equals the unsharded one."""
    from asr_streaming_tpu.models.rnnt import RNNTConfig
    from asr_streaming_tpu.utils.audio import EN_AUDIO
    asr = dataclasses.replace(ASRConfig.tiny(), audio=EN_AUDIO)
    cfg = ServingConfig(asr=asr, model_kind="rnnt", rnnt=RNNTConfig.tiny(),
                        use_silero=False, max_emission_frames=64,
                        en_beam_width_device=4, en_beam_cap=32)
    params = init_serving_params(jax.random.PRNGKey(0), cfg)
    mesh = make_serving_mesh(8)
    B = 8
    rng = np.random.default_rng(3)
    seg_len = cfg.asr.audio.segment_length
    seg = jnp.asarray(rng.integers(-3000, 3000, (B, seg_len)), jnp.int16)
    flags0 = jnp.zeros((B,), bool)
    active = jnp.ones((B,), bool)
    reset = jnp.ones((B,), bool)     # first tick: fresh beams

    step_fn = make_serving_step(cfg)
    state = init_serving_state(cfg, B)
    ctx = init_audio_context(cfg, B)
    em = init_emission_buffer(cfg, B)
    ref = jax.jit(lambda *a: step_fn(params, cfg, *a))(
        seg, flags0, active, flags0, reset, state, ctx, em)

    sh_step = make_sharded_stepper(cfg, mesh, params, donate_state=False)
    st, sctx, sem = shard_serving_arrays(
        cfg, mesh, init_serving_state(cfg, B), init_audio_context(cfg, B),
        init_emission_buffer(cfg, B))
    got = sh_step(params, seg, flags0, active, flags0, reset, st, sctx, sem)
    _tree_allclose(got.pack, ref.pack, rtol=1e-5, atol=1e-5)
    _tree_allclose(got.state, ref.state, rtol=1e-5, atol=1e-5)


def test_server_settings_data_parallel(tmp_path):
    """data_parallel flows YAML -> ServerSettings -> scheduler mesh."""
    from asr_streaming_tpu.server.config import ServerSettings
    p = tmp_path / "s.yaml"
    p.write_text("language: vi\ndata_parallel: 8\nuse_silero: false\n")
    s = ServerSettings.load(str(p), env={})
    assert s.data_parallel == 8
    assert ServerSettings.load(None, env={}).data_parallel == 1


def test_grouped_scheduler_with_mesh_rounds_group_size():
    """groups x data_parallel combinations must not crash: per-group
    slots round up to a multiple of the mesh's data size."""
    from asr_streaming_tpu.streaming.scheduler import GroupedScheduler
    cfg = _tiny_cfg()
    params = init_serving_params(jax.random.PRNGKey(0), cfg)
    vocab = placeholder_vocab(cfg.asr.encoder.vocab_size)
    mesh = make_serving_mesh(8)
    g = GroupedScheduler(params, cfg, vocab, max_slots=20, groups=3,
                         mesh=mesh)
    assert all(grp.max_slots % 8 == 0 for grp in g.groups)
    assert g.max_slots >= 20


def test_make_serving_mesh_validates_device_count():
    with pytest.raises(ValueError, match="chips requested"):
        make_serving_mesh(999)
