"""Multi-chip data-parallel serving: the slot axis sharded over a mesh.

The reference scales serving by running N single-GPU docker workers
behind nginx (reference: README.md:26-38, docker-compose.yml:1-63) —
N processes, N model copies, N connection pools.  The TPU-native
equivalent is one scheduler whose fixed slot array is sharded over the
``data`` axis of a ``jax.sharding.Mesh``: every tick is ONE jitted
``shard_map`` step in which each chip serves its own slice of slots
(weights replicated, per-slot Emformer/RNNT state resident on the chip
that owns the slot).  There are ZERO per-tick collectives — the slot
axis is embarrassingly parallel, so ICI stays idle and tick time is flat
in the number of chips while capacity scales linearly.

``shard_map`` (rather than bare GSPMD sharding annotations) is the right
spelling here because the hot step contains Pallas kernels
(ops/pallas_emformer.py, ops/pallas_append.py): custom calls cannot be
auto-partitioned by GSPMD, but under shard_map each device runs the
whole per-shard program — kernels included — on its [B/n, ...] slice.

Used by ``streaming/scheduler.py`` via ``Scheduler(..., mesh=mesh)`` and
exercised on the virtual 8-device CPU mesh in tests/test_serving_sharded.py.
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from asr_streaming_tpu.models.serving import (
    ServingConfig, ServingTickOutput, make_serving_step,
)


def serving_state_pspecs(cfg: ServingConfig):
    """PartitionSpec pytree for the carried per-slot model state.

    EmformerState leaves are [L, B, ...] (slot axis second); lengths and
    tokens are [B]; RNNT predictor h/c are [layers, B, H].
    """
    from asr_streaming_tpu.models.emformer import EmformerState
    from asr_streaming_tpu.models.rnnt import PredictorState, RNNTStreamState

    enc = EmformerState(mem=P(None, "data"), lc_k=P(None, "data"),
                        lc_v=P(None, "data"), length=P("data"))
    if cfg.model_kind == "rnnt":
        if cfg.en_beam_width_device:
            # EN device-beam mode: hypotheses are per-slot, so every
            # BeamState leaf shards along the slot axis (axis 0 except
            # pred_h/pred_c's [L, B, W, H] axis 1)
            from asr_streaming_tpu.models.rnnt_beam import BeamState
            from asr_streaming_tpu.models.serving import BeamServingState
            return BeamServingState(
                encoder=enc,
                beam=BeamState(
                    tokens=P("data"), lengths=P("data"),
                    scores=P("data"), h1=P("data"), h2=P("data"),
                    pred_h=P(None, "data"), pred_c=P(None, "data"),
                    pred_out=P("data")))
        return RNNTStreamState(
            encoder=enc,
            predictor=PredictorState(h=P(None, "data"), c=P(None, "data")),
            last_token=P("data"))
    return enc


def serving_arg_pspecs(cfg: ServingConfig, params: dict):
    """in_specs for the full stepper signature
    (params, segment, contain, active, new_stream, reset, state, ctx,
    emission)."""
    replicated = jax.tree.map(lambda _: P(), params)
    state = serving_state_pspecs(cfg)
    return (replicated, P("data"), P("data"), P("data"), P("data"),
            P("data"), state, P("data"), P("data"))


def serving_out_pspecs(cfg: ServingConfig):
    return ServingTickOutput(pack=P("data"),
                             state=serving_state_pspecs(cfg),
                             emission=P("data"), ctx=P("data"))


def data_parallel_size(mesh: Mesh) -> int:
    return mesh.shape["data"]


def make_sharded_stepper(cfg: ServingConfig, mesh: Mesh, params: dict,
                         donate_state: bool = True):
    """jit(shard_map(serving step)) over the mesh's 'data' axis.

    Signature matches the Scheduler's unsharded ``_stepper``:
    (params, segment, contain, active, new_stream, reset, state, ctx,
    emission) -> ServingTickOutput.  ``model`` axis must be 1 for serving
    (the 512-d/20-layer model fits one chip with room to spare; tensor
    parallelism is a training-side layout — parallel/mesh.py).
    """
    assert mesh.shape.get("model", 1) == 1, (
        "serving shards slots over 'data' only; use model=1 for serving "
        f"meshes (got {dict(mesh.shape)})")
    step_fn = make_serving_step(cfg)

    def _stepper(params, segment, contain, active, new_stream, reset,
                 state, ctx, emission):
        return step_fn(params, cfg, segment, contain, active, new_stream,
                       reset, state, ctx, emission)

    sharded = jax.shard_map(
        _stepper, mesh=mesh,
        in_specs=serving_arg_pspecs(cfg, params),
        out_specs=serving_out_pspecs(cfg),
        check_vma=False)
    donate = (6, 7, 8) if donate_state else ()
    return jax.jit(sharded, donate_argnums=donate)


def shard_serving_arrays(cfg: ServingConfig, mesh: Mesh, state, ctx,
                         emission):
    """Place the carried device arrays with their serving shardings so
    the first tick starts sharded (no implicit all-to-all on entry)."""
    state = jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        state, serving_state_pspecs(cfg))
    ctx = jax.device_put(ctx, NamedSharding(mesh, P("data")))
    emission = jax.device_put(emission, NamedSharding(mesh, P("data")))
    return state, ctx, emission


def make_serving_mesh(n_chips: Optional[int] = None) -> Mesh:
    """('data', 'model'=1) mesh over the local chips for serving."""
    from asr_streaming_tpu.parallel.mesh import make_mesh
    avail = len(jax.devices())
    n = n_chips or avail
    if n > avail:
        raise ValueError(
            f"data_parallel={n} chips requested but only {avail} "
            f"visible to jax ({jax.default_backend()})")
    return make_mesh(n, model_parallel=1)
