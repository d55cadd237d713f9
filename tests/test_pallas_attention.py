"""Pallas fused attention kernel vs the XLA einsum oracle (interpret mode
on CPU; the same kernel compiles via Mosaic on TPU)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from asr_streaming_tpu.models.emformer import (
    EmformerConfig, emformer_stream_step, init_emformer_params,
    init_emformer_state,
)
from asr_streaming_tpu.ops.pallas_attention import fused_emformer_attention

CFG = EmformerConfig(d_model=64, num_heads=4, ffn_dim=96, num_layers=2,
                     segment_length=8, left_context_length=16,
                     right_context_length=4, max_memory_size=4)


def _xla_attention(q, k, v, m_m, m_kv, *, num_heads, M, R, Lc, U,
                   use_mem=True, neg_inf=-1e8):
    """Direct transliteration of the emformer einsum path (oracle)."""
    B, Q, D = q.shape
    K = k.shape[1]
    Dh = D // num_heads
    lc_idx = np.arange(Lc)
    valid_lc = lc_idx[None, :] >= (Lc - m_kv)[:, None]
    if use_mem:
        mem_idx = np.arange(M)
        valid_mem = mem_idx[None, :] >= (M - m_m)[:, None]
    else:
        valid_mem = np.ones((B, 0), bool)
    valid = np.concatenate([valid_mem, np.ones((B, R), bool), valid_lc,
                            np.ones((B, U), bool)], axis=1)
    mask = np.broadcast_to(valid[:, None, :], (B, Q, K)).copy()
    if use_mem and M > 0:
        mask[:, -1, :M] = False

    qh = q.reshape(B, Q, num_heads, Dh).transpose(0, 2, 1, 3)
    kh = k.reshape(B, K, num_heads, Dh).transpose(0, 2, 1, 3)
    vh = v.reshape(B, K, num_heads, Dh).transpose(0, 2, 1, 3)
    logits = np.einsum("bhqd,bhkd->bhqk", qh / np.sqrt(Dh), kh)
    logits = np.where(mask[:, None], logits, neg_inf)
    e = np.exp(logits - logits.max(-1, keepdims=True))
    probs = e / e.sum(-1, keepdims=True)
    attn = np.einsum("bhqk,bhkd->bhqd", probs, vh)
    return attn.transpose(0, 2, 1, 3).reshape(B, Q, D)


@pytest.mark.parametrize("use_mem", [True, False])
def test_kernel_matches_oracle(use_mem):
    M, R, Lc, U, H = 4, 4, 16, 8, 4
    Mk = M if use_mem else 0
    Q = R + U + (1 if use_mem else 0)
    K = Mk + R + Lc + U
    D = 64
    rng = np.random.default_rng(0)
    q = rng.standard_normal((3, Q, D)).astype(np.float32)
    k = rng.standard_normal((3, K, D)).astype(np.float32)
    v = rng.standard_normal((3, K, D)).astype(np.float32)
    m_m = np.array([0, 2, 4], np.int32)
    m_kv = np.array([0, 7, 16], np.int32)

    got = np.asarray(fused_emformer_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        jnp.asarray(m_m), jnp.asarray(m_kv),
        num_heads=H, M=Mk, R=R, Lc=Lc, U=U, use_mem=use_mem,
        interpret=True))
    want = _xla_attention(q, k, v, m_m, m_kv, num_heads=H, M=Mk, R=R,
                          Lc=Lc, U=U, use_mem=use_mem)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_emformer_with_pallas_flag_matches_default():
    """Full layer-stack streaming step: pallas path == einsum path."""
    params = init_emformer_params(jax.random.PRNGKey(0), CFG)
    cfg_pallas = dataclasses.replace(CFG, use_pallas_attention=True)

    rng = np.random.default_rng(1)
    state_a = init_emformer_state(CFG, 2)
    state_b = init_emformer_state(cfg_pallas, 2)
    for step in range(3):
        x = jnp.asarray(rng.standard_normal(
            (2, CFG.segment_length + CFG.right_context_length,
             CFG.d_model)), dtype=jnp.float32)
        ya, state_a = emformer_stream_step(params, CFG, x, state_a)
        yb, state_b = emformer_stream_step(params, cfg_pallas, x, state_b)
        np.testing.assert_allclose(np.asarray(ya), np.asarray(yb),
                                   rtol=1e-4, atol=1e-5,
                                   err_msg=f"step {step}")
