"""Fused Pallas Emformer layer kernel vs the XLA oracle.

The kernel (ops/pallas_emformer.py) must reproduce models/emformer.py's
_layer_step — including the validity masks driven by the per-stream
length counters, the summary-row rule, the memory tanh, and the state
roll — for both the vi geometry (memory on) and the EN geometry
(memory off).  Runs in interpreter mode on CPU; the TPU path is
exercised by the serving configs + bench.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from asr_streaming_tpu.models.emformer import (
    EmformerConfig, emformer_stream_step, init_emformer_params,
    init_emformer_state,
)

VI_CFG = EmformerConfig(
    d_model=64, num_heads=4, ffn_dim=96, num_layers=3, segment_length=8,
    left_context_length=16, right_context_length=2, max_memory_size=4)
EN_CFG = EmformerConfig(
    d_model=64, num_heads=4, ffn_dim=96, num_layers=3, segment_length=4,
    left_context_length=10, right_context_length=1, max_memory_size=0)


def _run_steps(cfg, n_steps=4, B=4, seed=0, dtype=jnp.float32):
    cfg = dataclasses.replace(cfg, compute_dtype=dtype)
    params = init_emformer_params(jax.random.PRNGKey(seed), cfg)
    state = init_emformer_state(cfg, B)
    rng = np.random.default_rng(seed)
    ys = []
    for _ in range(n_steps):
        x = jnp.asarray(rng.standard_normal(
            (B, cfg.segment_length + cfg.right_context_length,
             cfg.d_model)), jnp.float32)
        y, state = emformer_stream_step(params, cfg, x, state)
        ys.append(np.asarray(y, np.float32))
    return np.stack(ys), jax.tree.map(
        lambda a: np.asarray(a, np.float32), state)


def _fused(cfg, mode, tile):
    if mode == "stack":
        return dataclasses.replace(cfg, use_pallas_stack=True,
                                   pallas_stack_tile=tile)
    return dataclasses.replace(cfg, use_pallas_layer=True, pallas_tile=tile)


@pytest.mark.parametrize("mode", ["layer", "stack"])
@pytest.mark.parametrize("base", [VI_CFG, EN_CFG], ids=["vi_mem", "en_nomem"])
def test_fused_layer_matches_oracle_fp32(base, mode):
    """fp32: the kernel and the XLA path agree to numerical noise across
    multiple steps (masks evolve as length grows from 0)."""
    ys_ref, st_ref = _run_steps(base)
    fused = _fused(base, mode, 2)
    ys_ker, st_ker = _run_steps(fused)
    np.testing.assert_allclose(ys_ker, ys_ref, rtol=2e-5, atol=2e-5)
    for a, b, name in [(st_ker.mem, st_ref.mem, "mem"),
                       (st_ker.lc_k, st_ref.lc_k, "lc_k"),
                       (st_ker.lc_v, st_ref.lc_v, "lc_v")]:
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-5, err_msg=name)
    np.testing.assert_array_equal(st_ker.length, st_ref.length)


@pytest.mark.parametrize("mode", ["layer", "stack"])
def test_fused_layer_matches_oracle_bf16(mode):
    """bf16 (the serving dtype): same rounding decisions as the oracle up
    to bf16-scale tolerance."""
    ys_ref, _ = _run_steps(VI_CFG, dtype=jnp.bfloat16)
    fused = _fused(VI_CFG, mode, 4)
    ys_ker, _ = _run_steps(fused, dtype=jnp.bfloat16)
    np.testing.assert_allclose(ys_ker, ys_ref, rtol=3e-2, atol=3e-2)


@pytest.mark.parametrize("mode", ["layer", "stack"])
def test_fused_layer_uneven_batch_tile(mode):
    """B not a multiple of the tile: falls back to the largest divisor."""
    fused = _fused(VI_CFG, mode, 4)
    ys_ref, _ = _run_steps(VI_CFG, B=6)
    ys_ker, _ = _run_steps(fused, B=6)
    np.testing.assert_allclose(ys_ker, ys_ref, rtol=2e-5, atol=2e-5)


def test_stack_matches_per_layer_bitexact_bf16():
    """The megakernel shares _layer_math with the per-layer kernel, so in
    bf16 the two Pallas paths must agree BIT-exactly (the oracle
    comparison above allows bf16 rounding slack; this one does not)."""
    ysL, stL = _run_steps(_fused(VI_CFG, "layer", 2), dtype=jnp.bfloat16)
    ysS, stS = _run_steps(_fused(VI_CFG, "stack", 2), dtype=jnp.bfloat16)
    np.testing.assert_array_equal(ysS, ysL)
    np.testing.assert_array_equal(stS.lc_k, stL.lc_k)
    np.testing.assert_array_equal(stS.mem, stL.mem)


@pytest.mark.parametrize("p", [2, 4])
def test_stack_layers_per_step_bitexact(p):
    """pallas_layers_per_step fuses P consecutive layers per grid step
    (same math, P fewer weight/state block fetches): bit-identical to
    the P=1 megakernel in bf16, including carried state."""
    cfg4 = dataclasses.replace(VI_CFG, num_layers=4)
    base = _fused(cfg4, "stack", 2)
    fused = dataclasses.replace(base, pallas_layers_per_step=p)
    ys1, st1 = _run_steps(base, dtype=jnp.bfloat16)
    ysP, stP = _run_steps(fused, dtype=jnp.bfloat16)
    np.testing.assert_array_equal(ysP, ys1)
    np.testing.assert_array_equal(stP.lc_k, st1.lc_k)
    np.testing.assert_array_equal(stP.lc_v, st1.lc_v)
    np.testing.assert_array_equal(stP.mem, st1.mem)


@pytest.mark.parametrize("mode", ["layer", "stack"])
def test_fused_layer_lifecycle_masks(mode):
    """reset/advance masks fused in the kernel == the XLA oracle's
    jnp.where selects, across steps with per-slot churn."""
    import jax.numpy as jnp

    B, n_steps = 4, 5
    rng = np.random.default_rng(9)
    base = dataclasses.replace(VI_CFG, compute_dtype=jnp.float32)
    fused = _fused(base, mode, 2)
    params = init_emformer_params(jax.random.PRNGKey(2), base)
    st_ref = init_emformer_state(base, B)
    st_ker = init_emformer_state(fused, B)

    for step in range(n_steps):
        x = jnp.asarray(rng.standard_normal(
            (B, base.segment_length + base.right_context_length,
             base.d_model)), jnp.float32)
        reset = jnp.asarray(rng.random(B) < 0.3)
        advance = jnp.asarray(rng.random(B) < 0.7)
        y_ref, st_ref = emformer_stream_step(params, base, x, st_ref,
                                             reset=reset, advance=advance)
        y_ker, st_ker = emformer_stream_step(params, fused, x, st_ker,
                                             reset=reset, advance=advance)
        np.testing.assert_allclose(np.asarray(y_ker), np.asarray(y_ref),
                                   rtol=2e-5, atol=2e-5)
        for a, b, name in [(st_ker.mem, st_ref.mem, "mem"),
                           (st_ker.lc_k, st_ref.lc_k, "lc_k"),
                           (st_ker.lc_v, st_ref.lc_v, "lc_v")]:
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-5, atol=2e-5,
                                       err_msg=f"{name} step {step}")
        np.testing.assert_array_equal(np.asarray(st_ker.length),
                                      np.asarray(st_ref.length))


@pytest.mark.parametrize("base", [VI_CFG, EN_CFG], ids=["vi_mem", "en_nomem"])
def test_int8_quant_close_to_oracle(base):
    """quant="int8" (W8A8 projections/FFN): per-channel weight + per-row
    activation quantization keeps the encoder output within quantization
    tolerance of the f32 oracle across steps (error compounds through
    layers and carried state, so the bound is statistical, not bitwise)."""
    ys_ref, _ = _run_steps(base)
    fused = dataclasses.replace(_fused(base, "stack", 2), quant="int8")
    ys_q, _ = _run_steps(fused)
    scale = np.abs(ys_ref).max()
    assert np.abs(ys_q - ys_ref).max() / scale < 0.08
    corr = np.corrcoef(ys_q.ravel(), ys_ref.ravel())[0, 1]
    assert corr > 0.995, corr


def test_int8_layer_matches_int8_stack_bitexact():
    """Both Pallas paths share _layer_math, so int8 mode must agree
    BIT-exactly between the per-layer kernel and the megakernel."""
    cfgL = dataclasses.replace(_fused(VI_CFG, "layer", 2), quant="int8")
    cfgS = dataclasses.replace(_fused(VI_CFG, "stack", 2), quant="int8")
    ysL, stL = _run_steps(cfgL)
    ysS, stS = _run_steps(cfgS)
    np.testing.assert_array_equal(ysS, ysL)
    np.testing.assert_array_equal(stS.lc_k, stL.lc_k)
    np.testing.assert_array_equal(stS.mem, stL.mem)


def test_int8_ignored_on_xla_path():
    """The XLA oracle path does not quantize: quant="int8" without a
    Pallas mode is a no-op (documented contract)."""
    ys_ref, _ = _run_steps(VI_CFG)
    ys_q, _ = _run_steps(dataclasses.replace(VI_CFG, quant="int8"))
    np.testing.assert_array_equal(ys_q, ys_ref)
