"""Streaming Emformer encoder — TPU-native (JAX, fixed shapes, scan).

Re-design of the reference's streaming Emformer (reference:
streaming_decoder/lightspeech/modules/emformer.py:36-522, itself a
state-lifted copy of torchaudio's Emformer used at
streaming_decoder/lightspeech/modules/encoder.py:104-147).

Semantics per streaming step, per layer (vi production geometry:
U=16 utterance frames, R=4 right-context, Lc=32 left-context, M=4 memory
slots, D=512, H=8 heads, FFN=2048, 20 layers):

  queries   = [right_context, utterance, summary]           (R+U+1 rows)
  keys/vals = [memory(M), right_context, left_context(Lc), utterance]
  summary   = mean of the layer-norm'd utterance (AvgPool k=U)
  mask      : summary row does not attend memory; unfilled memory /
              left-context slots (front) are masked by past-length
              counters m_m = min(M, len/U), m_kv = min(Lc, len)
              (reference emformer.py:199-211, 293-311)
  state     : memory <- append this layer's *input* memory row;
              left-context K/V <- the utterance keys/values just computed
              (reference emformer.py:313-327)
  next layer's input memory row = tanh(summary attention output)
              (reference emformer.py:173-176)

TPU-first design choices vs the reference:
  * All state buffers are fixed-size with validity masks — zero dynamic
    shapes, so one XLA compilation serves every step of every stream
    (the reference's dynamic 0->4 memory growth recompiles per shape;
    its own ONNX variant proves masked-fixed-size is equivalent).
  * Layers are stacked [L, ...] and executed with lax.scan — one traced
    layer body regardless of depth.
  * Batch-major [B, T, D] layout; all projections are large fused
    matmuls on the MXU; attention logits/softmax in fp32, matmuls in a
    configurable compute dtype (bf16 for serving).
  * The full 20-layer step is a single jit region; the offline forward
    is a scan of the same step over chunks, so streaming == offline by
    construction (no train/serve mismatch).
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class EmformerConfig:
    d_model: int = 512
    num_heads: int = 8
    ffn_dim: int = 2048
    num_layers: int = 20
    segment_length: int = 16        # U: utterance frames per step (post-stride)
    left_context_length: int = 32   # Lc
    right_context_length: int = 4   # R
    max_memory_size: int = 4        # M (0 disables memory/summary)
    activation: str = "gelu"
    tanh_on_mem: bool = True
    negative_inf: float = -1e8
    weight_init_scale_strategy: Optional[str] = "depthwise"
    compute_dtype: Any = jnp.float32
    # Route the attention core through the fused Pallas kernel
    # (ops/pallas_attention.py).  Default off: the XLA einsum path is the
    # oracle; the kernel runs interpreted off-TPU.
    use_pallas_attention: bool = False
    # Route the ENTIRE layer step (LN + projections + attention + FFN +
    # state roll) through the fused Pallas kernel
    # (ops/pallas_emformer.py) — the serving-path fast path.  The XLA
    # _layer_step remains the oracle (tests/test_pallas_emformer.py).
    use_pallas_layer: bool = False
    # Route ALL layers through the single whole-encoder megakernel
    # (ops/pallas_emformer.py:fused_emformer_stack): grid (layer, tile),
    # inter-layer activations carried in VMEM scratch, one launch per
    # step.  Takes precedence over use_pallas_layer.
    use_pallas_stack: bool = False
    # "int8": W8A8 quantized projections/FFN inside the Pallas kernels
    # (per-output-channel int8 weights re-derived from the f32 params
    # each step, per-row dynamic activation quant, int8 MXU dots).
    # Measured NEUTRAL at D=512 (the kernels are VPU-bound, not
    # MXU-bound — see fused_emformer_stack); worthwhile at larger
    # d_model.  Only the Pallas paths honor it; the XLA oracle path
    # always runs the configured compute_dtype.  Opt-in.
    quant: str = "none"
    pallas_tile: int = 64           # per-layer kernel: batch rows per grid
                                    # step (v5e sweep @512 slots: 32=27.4ms,
                                    # 64=21.2ms, 128+=VMEM OOM >100MB)
    pallas_stack_tile: int = 32     # megakernel tile (v5e @512 slots:
                                    # 32=13.0ms, 64=14.5ms; 128 OOMs VMEM)
    pallas_layers_per_step: int = 1  # megakernel: consecutive layers fused
                                    # per grid step (cuts the serial grid
                                    # from L*NT to L/P*NT steps; must
                                    # divide num_layers)
    # FFN hidden-dim slices inside the megakernel: >1 splits the serial
    # MXU->VPU->MXU FFN chain into independent slices Mosaic can overlap
    # (slice s's matmul with slice s-1's activation).  v5e sweep below.
    pallas_ffn_slices: int = 1
    # Unroll factor for the scan over layers.  The carried K/V state is
    # large; unrolling lets XLA overlap the per-layer state slicing with
    # compute.  Measured on v5e with honest chained-step timing (state fed
    # back per step, tools/profile_step.py): 172.7 ms/step at unroll=2 vs
    # 36.0 ms/step fully unrolled, B=512 bf16.  Compile time rises but the
    # persistent compilation cache (utils/compile_cache.py) amortizes it.
    scan_unroll: int = 20

    @property
    def use_mem(self) -> bool:
        return self.max_memory_size > 0

    @property
    def head_dim(self) -> int:
        return self.d_model // self.num_heads

    @property
    def num_queries(self) -> int:
        return (self.right_context_length + self.segment_length
                + (1 if self.use_mem else 0))

    @property
    def num_keys(self) -> int:
        return (self.max_memory_size + self.right_context_length
                + self.left_context_length + self.segment_length)


class EmformerState(NamedTuple):
    """Carried per-stream state, fixed shapes.

    mem:    [L, B, M, D]  raw memory rows (newest at the end)
    lc_k:   [L, B, Lc, D] projected left-context keys (newest at the end)
    lc_v:   [L, B, Lc, D] projected left-context values
    length: [B] int32     total utterance frames processed so far
    """
    mem: jax.Array
    lc_k: jax.Array
    lc_v: jax.Array
    length: jax.Array


def init_emformer_state(cfg: EmformerConfig, batch_size: int) -> EmformerState:
    """State buffers live in the compute dtype: the K/V entries are
    produced by compute-dtype matmuls anyway, and the carried state is the
    streaming step's dominant HBM traffic (bf16 halves it)."""
    L, B, D = cfg.num_layers, batch_size, cfg.d_model
    dt = cfg.compute_dtype
    return EmformerState(
        mem=jnp.zeros((L, B, cfg.max_memory_size, D), dtype=dt),
        lc_k=jnp.zeros((L, B, cfg.left_context_length, D), dtype=dt),
        lc_v=jnp.zeros((L, B, cfg.left_context_length, D), dtype=dt),
        length=jnp.zeros((B,), dtype=jnp.int32),
    )


def _xavier_uniform(key, shape, gain: float = 1.0):
    fan_in, fan_out = shape[0], shape[1]
    bound = gain * math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, minval=-bound, maxval=bound,
                              dtype=jnp.float32)


def _linear_init(key, in_dim, out_dim):
    # torch.nn.Linear default init: kaiming-uniform weights, uniform bias.
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(in_dim)
    w = jax.random.uniform(kw, (in_dim, out_dim), minval=-math.sqrt(3) * bound,
                           maxval=math.sqrt(3) * bound, dtype=jnp.float32)
    b = jax.random.uniform(kb, (out_dim,), minval=-bound, maxval=bound,
                           dtype=jnp.float32)
    return w, b


def init_emformer_params(key: jax.Array, cfg: EmformerConfig) -> dict:
    """Per-layer parameters stacked along axis 0 (shape [L, ...])."""
    D, F, L = cfg.d_model, cfg.ffn_dim, cfg.num_layers

    if cfg.weight_init_scale_strategy == "depthwise":
        gains = [1.0 / math.sqrt(i + 1) for i in range(L)]
    elif cfg.weight_init_scale_strategy == "constant":
        gains = [1.0 / math.sqrt(2)] * L
    else:
        gains = [1.0] * L

    layers = []
    for i in range(L):
        key, *ks = jax.random.split(key, 7)
        w_kv, b_kv = _linear_init(ks[0], D, 2 * D)
        w_q, b_q = _linear_init(ks[1], D, D)
        w_out, b_out = _linear_init(ks[2], D, D)
        if cfg.weight_init_scale_strategy is not None:
            w_kv = _xavier_uniform(ks[3], (D, 2 * D), gains[i])
            w_q = _xavier_uniform(ks[4], (D, D), gains[i])
        w1, b1 = _linear_init(ks[5], D, F)
        key, k2 = jax.random.split(key)
        w2, b2 = _linear_init(k2, F, D)
        layers.append({
            "w_q": w_q, "b_q": b_q, "w_kv": w_kv, "b_kv": b_kv,
            "w_out": w_out, "b_out": b_out,
            "ln_in_scale": jnp.ones(D), "ln_in_bias": jnp.zeros(D),
            "ff_ln_scale": jnp.ones(D), "ff_ln_bias": jnp.zeros(D),
            "ff_w1": w1, "ff_b1": b1, "ff_w2": w2, "ff_b2": b2,
            "ln_out_scale": jnp.ones(D), "ln_out_bias": jnp.zeros(D),
        })
    return jax.tree.map(lambda *xs: jnp.stack(xs), *layers)


def _layer_norm(x, scale, bias, eps=1e-5):
    x = x.astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * scale + bias


def _activation(name: str):
    return {"relu": jax.nn.relu, "gelu": jax.nn.gelu, "silu": jax.nn.silu}[name]


def _layer_step(cfg: EmformerConfig, p: dict, utt: jax.Array, rc: jax.Array,
                mem_row: Optional[jax.Array], mem_state: jax.Array,
                lc_k: jax.Array, lc_v: jax.Array, length: jax.Array,
                reset: Optional[jax.Array] = None,
                advance: Optional[jax.Array] = None):
    """One Emformer layer, one streaming step.

    Args:
      utt: [B, U, D] utterance input.
      rc:  [B, R, D] right-context input.
      mem_row: [B, 1, D] this layer's input memory row (None if M == 0).
      mem_state / lc_k / lc_v: this layer's carried state.
      length: [B] int32 frames processed before this step.
    Returns:
      (new_utt, new_rc, new_mem_row, new_mem_state, new_lc_k, new_lc_v)
    """
    B, U, D = utt.shape
    R = rc.shape[1]
    M, Lc = cfg.max_memory_size, cfg.left_context_length
    H, Dh = cfg.num_heads, cfg.head_dim
    cdt = cfg.compute_dtype

    if cfg.use_pallas_layer:
        from asr_streaming_tpu.ops.pallas_emformer import (
            fused_emformer_layer,
        )
        return fused_emformer_layer(
            p, utt.astype(jnp.float32), rc.astype(jnp.float32),
            None if mem_row is None else mem_row.astype(jnp.float32),
            mem_state, lc_k, lc_v, length, reset, advance,
            U=U, R=R, M=M, Lc=Lc, H=H, use_mem=cfg.use_mem,
            tanh_on_mem=cfg.tanh_on_mem, neg_inf=cfg.negative_inf,
            activation=cfg.activation,
            cdt_name=jnp.dtype(cdt).name, tile=cfg.pallas_tile,
            interpret=jax.default_backend() != "tpu",
            quant=cfg.quant == "int8")

    # Pre-attention layer norm over [rc; utt] (position-wise).
    ln_rc = _layer_norm(rc, p["ln_in_scale"], p["ln_in_bias"])
    ln_utt = _layer_norm(utt, p["ln_in_scale"], p["ln_in_bias"])

    if cfg.use_mem:
        # AvgPool(k=U, ceil) over U frames == exact mean -> one summary row.
        summary = jnp.mean(ln_utt, axis=1, keepdims=True)
        q_in = jnp.concatenate([ln_rc, ln_utt, summary], axis=1)
    else:
        q_in = jnp.concatenate([ln_rc, ln_utt], axis=1)
    Q = q_in.shape[1]

    # Projections (MXU).  Keys/values for the stored memory rows are
    # recomputed each step from the raw rows (reference emformer.py:119-121);
    # left-context K/V were projected when first seen and carried as-is.
    q = (q_in.astype(cdt) @ p["w_q"].astype(cdt)) + p["b_q"].astype(cdt)
    kv_in = jnp.concatenate([mem_state.astype(cdt), ln_rc.astype(cdt),
                             ln_utt.astype(cdt)], axis=1)
    kv = (kv_in @ p["w_kv"].astype(cdt)) + p["b_kv"].astype(cdt)
    k_part, v_part = jnp.split(kv, 2, axis=-1)
    next_k = k_part[:, M + R:]          # utterance keys -> future left ctx
    next_v = v_part[:, M + R:]

    full_k = jnp.concatenate(
        [k_part[:, :M + R], lc_k.astype(cdt), next_k], axis=1)
    full_v = jnp.concatenate(
        [v_part[:, :M + R], lc_v.astype(cdt), next_v], axis=1)
    K = full_k.shape[1]

    # Key-validity mask from past-length counters.
    m_kv = jnp.minimum(Lc, length)                       # [B]
    lc_idx = jnp.arange(Lc)
    valid_lc = lc_idx[None, :] >= (Lc - m_kv)[:, None]   # [B, Lc]
    if cfg.use_mem:
        m_m = jnp.minimum(M, length // max(U, 1))
        mem_idx = jnp.arange(M)
        valid_mem = mem_idx[None, :] >= (M - m_m)[:, None]
    else:
        m_m = jnp.zeros_like(length)
        valid_mem = jnp.ones((B, 0), dtype=bool)

    if cfg.use_pallas_attention:
        from asr_streaming_tpu.ops.pallas_attention import (
            fused_emformer_attention,
        )
        attn = fused_emformer_attention(
            q.astype(jnp.float32), full_k.astype(jnp.float32),
            full_v.astype(jnp.float32), m_m, m_kv,
            num_heads=H, M=M, R=R, Lc=Lc, U=U, use_mem=cfg.use_mem,
            neg_inf=cfg.negative_inf,
            interpret=jax.default_backend() != "tpu").astype(cdt)
        out = attn @ p["w_out"].astype(cdt) + p["b_out"].astype(cdt)
        return _finish_layer_step(cfg, p, out, utt, rc, mem_row, mem_state,
                                  lc_k, lc_v, next_k, next_v)
    valid_keys = jnp.concatenate(
        [valid_mem, jnp.ones((B, R), bool), valid_lc, jnp.ones((B, U), bool)],
        axis=1)                                          # [B, K]

    mask = jnp.broadcast_to(valid_keys[:, None, :], (B, Q, K))
    if cfg.use_mem and M > 0:
        # Summary query (last row) never attends the memory block
        # (reference emformer.py:202).
        mask = mask.at[:, -1, :M].set(False)

    # Attention (fp32 logits/softmax, reference emformer.py:90-96).
    qh = q.reshape(B, Q, H, Dh).transpose(0, 2, 1, 3)
    kh = full_k.reshape(B, K, H, Dh).transpose(0, 2, 1, 3)
    vh = full_v.reshape(B, K, H, Dh).transpose(0, 2, 1, 3)
    scaling = 1.0 / math.sqrt(Dh)
    logits = jnp.einsum("bhqd,bhkd->bhqk", (qh * scaling), kh,
                        preferred_element_type=jnp.float32)
    logits = jnp.where(mask[:, None, :, :], logits, cfg.negative_inf)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(cdt)
    attn = jnp.einsum("bhqk,bhkd->bhqd", probs, vh,
                      preferred_element_type=jnp.float32)
    attn = attn.transpose(0, 2, 1, 3).reshape(B, Q, D).astype(cdt)
    out = attn @ p["w_out"].astype(cdt) + p["b_out"].astype(cdt)
    return _finish_layer_step(cfg, p, out, utt, rc, mem_row, mem_state,
                              lc_k, lc_v, next_k, next_v)


def _finish_layer_step(cfg: EmformerConfig, p: dict, out: jax.Array,
                       utt: jax.Array, rc: jax.Array, mem_row, mem_state,
                       lc_k, lc_v, next_k, next_v):
    """Post-attention: mem output transform, residual FFN, state update."""
    R, U = rc.shape[1], utt.shape[1]
    Lc = cfg.left_context_length
    cdt = cfg.compute_dtype

    rc_utt_out = out[:, :R + U].astype(jnp.float32)
    if cfg.use_mem:
        mem_out = out[:, R + U:].astype(jnp.float32)
        if cfg.tanh_on_mem:
            new_mem_row = jnp.tanh(mem_out)
        else:
            new_mem_row = jnp.clip(mem_out, -10.0, 10.0)
    else:
        new_mem_row = None

    # Residual + position-wise FFN + output LN (reference emformer.py:329-338).
    residual = rc_utt_out + jnp.concatenate([rc, utt], axis=1)
    ff = _layer_norm(residual, p["ff_ln_scale"], p["ff_ln_bias"])
    ff = _activation(cfg.activation)(
        ff.astype(cdt) @ p["ff_w1"].astype(cdt) + p["ff_b1"].astype(cdt))
    ff = (ff @ p["ff_w2"].astype(cdt) + p["ff_b2"].astype(cdt)).astype(jnp.float32)
    result = _layer_norm(residual + ff, p["ln_out_scale"], p["ln_out_bias"])

    new_rc, new_utt = result[:, :R], result[:, R:]

    # State update (reference emformer.py:313-327): append this layer's
    # *input* memory row; roll utterance K/V into the left-context window.
    # State buffers keep the compute dtype (see init_emformer_state).
    if cfg.use_mem:
        new_mem_state = jnp.concatenate(
            [mem_state[:, 1:], mem_row.astype(mem_state.dtype)], axis=1)
    else:
        new_mem_state = mem_state
    new_lc_k = jnp.concatenate(
        [lc_k, next_k.astype(lc_k.dtype)], axis=1)[:, -Lc:]
    new_lc_v = jnp.concatenate(
        [lc_v, next_v.astype(lc_v.dtype)], axis=1)[:, -Lc:]

    return new_utt, new_rc, new_mem_row, new_mem_state, new_lc_k, new_lc_v


def emformer_stream_step(
    params: dict, cfg: EmformerConfig, x: jax.Array, state: EmformerState,
    reset: Optional[jax.Array] = None,
    advance: Optional[jax.Array] = None,
) -> Tuple[jax.Array, EmformerState]:
    """One streaming step over all layers.

    Args:
      x: [B, U + R, D] — utterance frames followed by right-context frames
         (reference emformer.py:438-441 splits the chunk the same way).
      state: carried EmformerState.
      reset: optional [B] bool — zero this slot's state before stepping.
      advance: optional [B] bool — commit the stepped state; slots with
        advance=False keep their (post-reset) previous state.
      Passing the masks here lets the fused Pallas layer kernel apply them
      IN VMEM, replacing the serving step's full-state jnp.where
      traversals (2 x ~1.4 GB of HBM traffic at 512 slots).
    Returns:
      (y [B, U, D], new_state)
    """
    U = cfg.segment_length
    R = cfg.right_context_length
    utt, rc = x[:, :U], x[:, U:U + R]

    length = state.length
    if reset is not None:
        length = jnp.where(reset, 0, length)

    if cfg.use_pallas_stack:
        from asr_streaming_tpu.ops.pallas_emformer import (
            fused_emformer_stack,
        )
        y, mem, lc_k, lc_v = fused_emformer_stack(
            params, x[:, :U + R].astype(jnp.float32),
            state.mem, state.lc_k, state.lc_v, length, reset, advance,
            U=U, R=R, M=cfg.max_memory_size, Lc=cfg.left_context_length,
            H=cfg.num_heads, use_mem=cfg.use_mem,
            tanh_on_mem=cfg.tanh_on_mem, neg_inf=cfg.negative_inf,
            activation=cfg.activation,
            cdt_name=jnp.dtype(cfg.compute_dtype).name,
            tile=cfg.pallas_stack_tile,
            interpret=jax.default_backend() != "tpu",
            # "int8": all five matmuls W8A8; "int8_ffn": FFN only (the
            # ablated bottleneck) — measured sweeps in the config note
            quant=cfg.quant if cfg.quant in ("int8", "int8_ffn")
            else False,
            ffn_slices=cfg.pallas_ffn_slices,
            layers_per_step=cfg.pallas_layers_per_step)
        new_length = length + jnp.int32(U)
        if advance is not None:
            new_length = jnp.where(advance, new_length, length)
        return y, EmformerState(mem=mem, lc_k=lc_k, lc_v=lc_v,
                                length=new_length)

    fused_masks = cfg.use_pallas_layer and (reset is not None
                                            or advance is not None)
    if reset is not None and not fused_masks:
        # XLA path: global pre-select (the serving step's _select_state)
        zero = init_emformer_state(cfg, x.shape[0])
        m4 = reset[None, :, None, None]
        state = EmformerState(
            mem=jnp.where(m4, zero.mem, state.mem),
            lc_k=jnp.where(m4, zero.lc_k, state.lc_k),
            lc_v=jnp.where(m4, zero.lc_v, state.lc_v),
            length=length)

    # Initial memory row for layer 0: mean over the *raw* utterance
    # (reference emformer.py:442).
    mem_row = jnp.mean(utt, axis=1, keepdims=True) if cfg.use_mem else None

    masks = (reset, advance) if fused_masks else (None, None)

    def body(carry, layer_in):
        utt, rc, mem_row = carry
        p, mem_s, lck_s, lcv_s = layer_in
        new_utt, new_rc, new_mem_row, nm, nk, nv = _layer_step(
            cfg, p, utt, rc, mem_row, mem_s, lck_s, lcv_s, length,
            reset=masks[0], advance=masks[1])
        return (new_utt, new_rc, new_mem_row), (nm, nk, nv)

    (y, _, _), (mem, lc_k, lc_v) = jax.lax.scan(
        body, (utt, rc, mem_row),
        (params, state.mem, state.lc_k, state.lc_v),
        unroll=min(cfg.scan_unroll, cfg.num_layers))

    new_length = length + jnp.int32(U)
    if advance is not None:
        new_length = jnp.where(advance, new_length, length)
        if not fused_masks:
            # XLA path: global post-select
            m4 = advance[None, :, None, None]
            mem = jnp.where(m4, mem, state.mem)
            lc_k = jnp.where(m4, lc_k, state.lc_k)
            lc_v = jnp.where(m4, lc_v, state.lc_v)

    new_state = EmformerState(mem=mem, lc_k=lc_k, lc_v=lc_v,
                              length=new_length)
    return y, new_state


def emformer_forward(
    params: dict, cfg: EmformerConfig, x: jax.Array,
    x_lens: Optional[jax.Array] = None,
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """Offline forward: scan the streaming step over chunks.

    Mathematically identical to streaming inference (right context for
    chunk i is the first R frames of chunk i+1; zero-padded at the end),
    so streaming == offline by construction and the same code path trains.

    Args:
      x: [B, T, D] (T padded to a multiple of segment_length internally).
    Returns:
      (y [B, T_padded, D], y_lens)
    """
    B, T, D = x.shape
    U, R = cfg.segment_length, cfg.right_context_length
    n_chunks = -(-T // U)
    T_pad = n_chunks * U
    x = jnp.pad(x, ((0, 0), (0, T_pad - T + R), (0, 0)))

    # chunks[i] = x[:, i*U : i*U + U + R]
    idx = jnp.arange(n_chunks)[:, None] * U + jnp.arange(U + R)[None, :]
    chunks = x[:, idx]                       # [B, n_chunks, U+R, D]
    chunks = chunks.transpose(1, 0, 2, 3)    # [n_chunks, B, U+R, D]

    state0 = init_emformer_state(cfg, B)

    def body(state, chunk):
        y, state = emformer_stream_step(params, cfg, chunk, state)
        return state, y

    _, ys = jax.lax.scan(body, state0, chunks)
    y = ys.transpose(1, 0, 2, 3).reshape(B, T_pad, D)
    return y, x_lens
