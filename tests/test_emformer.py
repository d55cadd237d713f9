"""Emformer correctness tests.

Strategy (the reference ships no checkpoints, so no bit-matching against
real weights is possible):
  1. An *independent* NumPy implementation of one layer step (explicit
     python loops, dynamic-size buffers like the torch original) is
     compared against the fixed-shape masked JAX implementation.
  2. Streaming invariants: chunk-by-chunk == offline scan; batching a
     stream with others doesn't change its output; garbage in masked
     state slots is ignored on the first chunk.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from asr_streaming_tpu.models.emformer import (
    EmformerConfig, init_emformer_params, init_emformer_state,
    emformer_stream_step, emformer_forward,
)
from asr_streaming_tpu.models.encoder import (
    EncoderConfig, init_encoder_params, init_encoder_state,
    encoder_stream_step, encoder_forward,
)

CFG = EmformerConfig(d_model=32, num_heads=4, ffn_dim=48, num_layers=3,
                     segment_length=8, left_context_length=16,
                     right_context_length=4, max_memory_size=4)


def _np_layer_norm(x, scale, bias, eps=1e-5):
    mean = x.mean(-1, keepdims=True)
    var = ((x - mean) ** 2).mean(-1, keepdims=True)
    return (x - mean) / np.sqrt(var + eps) * scale + bias


def _np_softmax(x):
    x = x - x.max(-1, keepdims=True)
    e = np.exp(x)
    return e / e.sum(-1, keepdims=True)


class NpEmformer:
    """Dynamic-buffer NumPy Emformer (mirrors the torch semantics:
    memory / left-context grow from empty, no masks)."""

    def __init__(self, params, cfg: EmformerConfig):
        self.cfg = cfg
        # unstack layer params to python lists
        self.layers = [
            {k: np.asarray(v[i]) for k, v in params.items()}
            for i in range(cfg.num_layers)
        ]
        self.state = [
            {"mem": np.zeros((0, cfg.d_model)),
             "k": np.zeros((0, cfg.d_model)),
             "v": np.zeros((0, cfg.d_model)),
             "len": 0}
            for _ in range(cfg.num_layers)
        ]

    def step(self, x):
        """x: [U+R, D] single stream.  Returns [U, D]."""
        cfg = self.cfg
        U, R = cfg.segment_length, cfg.right_context_length
        utt, rc = x[:U], x[U:U + R]
        mem_row = utt.mean(0, keepdims=True) if cfg.use_mem else None

        for p, st in zip(self.layers, self.state):
            ln_rc = _np_layer_norm(rc, p["ln_in_scale"], p["ln_in_bias"])
            ln_utt = _np_layer_norm(utt, p["ln_in_scale"], p["ln_in_bias"])
            summary = ln_utt.mean(0, keepdims=True) if cfg.use_mem else \
                np.zeros((0, cfg.d_model))

            mems = st["mem"]                       # [m, D] grows 0..M
            q_in = np.concatenate([ln_rc, ln_utt, summary])
            q = q_in @ p["w_q"] + p["b_q"]
            kv_in = np.concatenate([mems, ln_rc, ln_utt])
            kv = kv_in @ p["w_kv"] + p["b_kv"]
            k_part, v_part = np.split(kv, 2, axis=-1)
            m = mems.shape[0]
            next_k, next_v = k_part[m + R:], v_part[m + R:]
            lc_k, lc_v = st["k"], st["v"]          # [l, D] grows 0..Lc
            full_k = np.concatenate([k_part[:m + R], lc_k, next_k])
            full_v = np.concatenate([v_part[:m + R], lc_v, next_v])

            H, Dh = cfg.num_heads, cfg.head_dim
            Q, K = q.shape[0], full_k.shape[0]
            qh = q.reshape(Q, H, Dh).transpose(1, 0, 2)
            kh = full_k.reshape(K, H, Dh).transpose(1, 0, 2)
            vh = full_v.reshape(K, H, Dh).transpose(1, 0, 2)
            logits = (qh / np.sqrt(Dh)) @ kh.transpose(0, 2, 1)
            if cfg.use_mem and m > 0:
                logits[:, -1, :m] = cfg.negative_inf   # summary !-> memory
            probs = _np_softmax(logits)
            attn = (probs @ vh).transpose(1, 0, 2).reshape(Q, cfg.d_model)
            out = attn @ p["w_out"] + p["b_out"]

            rc_utt_out = out[:R + U]
            if cfg.use_mem:
                new_mem_row = np.tanh(out[R + U:]) if cfg.tanh_on_mem else \
                    np.clip(out[R + U:], -10, 10)

            residual = rc_utt_out + np.concatenate([rc, utt])
            ff = _np_layer_norm(residual, p["ff_ln_scale"], p["ff_ln_bias"])
            ff = jax.nn.gelu(jnp.asarray(ff @ p["ff_w1"] + p["ff_b1"]))
            ff = np.asarray(ff) @ p["ff_w2"] + p["ff_b2"]
            result = _np_layer_norm(residual + ff,
                                    p["ln_out_scale"], p["ln_out_bias"])
            rc, utt = result[:R], result[R:]

            # dynamic state update (torch semantics)
            if cfg.use_mem:
                st["mem"] = np.concatenate(
                    [st["mem"], mem_row])[-cfg.max_memory_size:]
            st["k"] = np.concatenate([st["k"], next_k])[-cfg.left_context_length:]
            st["v"] = np.concatenate([st["v"], next_v])[-cfg.left_context_length:]
            st["len"] += U
            mem_row = new_mem_row if cfg.use_mem else None

        return utt


@pytest.mark.parametrize("use_mem", [True, False])
def test_jax_matches_numpy_reference(use_mem):
    cfg = CFG if use_mem else EmformerConfig(
        **{**CFG.__dict__, "max_memory_size": 0, "tanh_on_mem": False})
    key = jax.random.PRNGKey(0)
    params = init_emformer_params(key, cfg)
    np_model = NpEmformer(params, cfg)

    state = init_emformer_state(cfg, 1)
    rng = np.random.default_rng(0)
    step = jax.jit(lambda x, s: emformer_stream_step(params, cfg, x, s))
    for i in range(6):  # enough steps to fill memory and left-context
        x = rng.standard_normal(
            (cfg.segment_length + cfg.right_context_length,
             cfg.d_model)).astype(np.float32)
        y_np = np_model.step(x.astype(np.float64))
        y_jax, state = step(jnp.asarray(x)[None], state)
        np.testing.assert_allclose(np.asarray(y_jax[0]), y_np,
                                   rtol=2e-4, atol=2e-4,
                                   err_msg=f"step {i}")


def test_masked_state_slots_are_ignored():
    """First chunk must be insensitive to garbage in (masked) state."""
    cfg = CFG
    params = init_emformer_params(jax.random.PRNGKey(1), cfg)
    x = jnp.asarray(np.random.default_rng(1).standard_normal(
        (1, cfg.segment_length + cfg.right_context_length, cfg.d_model)),
        dtype=jnp.float32)
    clean = init_emformer_state(cfg, 1)
    dirty = clean._replace(
        mem=jnp.full_like(clean.mem, 123.0),
        lc_k=jnp.full_like(clean.lc_k, -77.0),
        lc_v=jnp.full_like(clean.lc_v, 55.0))
    y_clean, _ = emformer_stream_step(params, cfg, x, clean)
    y_dirty, _ = emformer_stream_step(params, cfg, x, dirty)
    np.testing.assert_allclose(np.asarray(y_clean), np.asarray(y_dirty),
                               rtol=1e-5, atol=1e-5)


def test_batch_independence():
    """A stream's output must not depend on its batch neighbors."""
    cfg = CFG
    params = init_emformer_params(jax.random.PRNGKey(2), cfg)
    rng = np.random.default_rng(2)
    T = cfg.segment_length + cfg.right_context_length
    xs = rng.standard_normal((3, 4, T, cfg.d_model)).astype(np.float32)

    solo_state = init_emformer_state(cfg, 1)
    batch_state = init_emformer_state(cfg, 4)
    step = jax.jit(lambda x, s: emformer_stream_step(params, cfg, x, s))
    for t in range(3):
        y_solo, solo_state = step(jnp.asarray(xs[t, :1]), solo_state)
        y_batch, batch_state = step(jnp.asarray(xs[t]), batch_state)
        np.testing.assert_allclose(np.asarray(y_batch[0]),
                                   np.asarray(y_solo[0]),
                                   rtol=1e-5, atol=1e-5)


def test_streaming_equals_offline():
    cfg = CFG
    params = init_emformer_params(jax.random.PRNGKey(3), cfg)
    rng = np.random.default_rng(3)
    n_chunks, U, R = 5, cfg.segment_length, cfg.right_context_length
    T = n_chunks * U
    x = rng.standard_normal((2, T, cfg.d_model)).astype(np.float32)

    y_off, _ = emformer_forward(params, cfg, jnp.asarray(x))

    state = init_emformer_state(cfg, 2)
    xp = np.concatenate([x, np.zeros((2, R, cfg.d_model), np.float32)], 1)
    ys = []
    for i in range(n_chunks):
        chunk = jnp.asarray(xp[:, i * U:i * U + U + R])
        y, state = emformer_stream_step(params, cfg, chunk, state)
        ys.append(np.asarray(y))
    y_stream = np.concatenate(ys, axis=1)
    np.testing.assert_allclose(np.asarray(y_off), y_stream,
                               rtol=1e-5, atol=1e-5)


def test_encoder_stream_step_vi_geometry():
    cfg = EncoderConfig(
        input_dim=16, d_model=32, stride=4, vocab_size=21, ctc_hidden_dim=24,
        emformer=EmformerConfig(d_model=32, num_heads=4, ffn_dim=48,
                                num_layers=2, segment_length=16,
                                left_context_length=32,
                                right_context_length=4, max_memory_size=4))
    params = init_encoder_params(jax.random.PRNGKey(4), cfg)
    state = init_encoder_state(cfg, 2)
    feats = jnp.asarray(np.random.default_rng(4).standard_normal(
        (2, 80, 16)), dtype=jnp.float32)
    logp, state = encoder_stream_step(params, cfg, feats, state)
    assert logp.shape == (2, 16, 21)
    # valid log-probabilities
    np.testing.assert_allclose(np.exp(np.asarray(logp)).sum(-1), 1.0,
                               rtol=1e-4)
    # offline forward agrees with two streaming steps
    feats2 = jnp.asarray(np.random.default_rng(5).standard_normal(
        (2, 160, 16)), dtype=jnp.float32)
    logp_off, lens = encoder_forward(params, cfg, feats2,
                                     jnp.array([160, 120]))
    assert logp_off.shape == (2, 40, 21)
    assert list(np.asarray(lens)) == [40, 30]
