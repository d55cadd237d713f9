"""Streaming acoustic encoder + CTC head (Vietnamese path).

Re-design of the reference's ``StreamingAcousticEncoder`` (reference:
streaming_decoder/lightspeech/modules/encoder.py:73-147) and ``CTCDecoder``
(modules/decoder.py:60-70):

  log-mel [B, T, 128]
    -> input_linear (128 -> d_model/stride, no bias)   encoder.py:99-103
    -> time_reduction stride 4 (stack frames)          utils/common.py:110-124
    -> Emformer (20 layers, carried state)             encoder.py:104-117
    -> CTC head: Linear -> SiLU -> Linear -> log_softmax  decoder.py:60-70

Everything is one jit region with static shapes; the full model step
(frontend -> encoder -> CTC -> greedy stats) is assembled in
``asr_streaming_tpu.models.asr``.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp

from asr_streaming_tpu.models.emformer import (
    EmformerConfig, EmformerState, emformer_forward, emformer_stream_step,
    init_emformer_params, init_emformer_state, _linear_init,
)


@dataclasses.dataclass(frozen=True)
class EncoderConfig:
    input_dim: int = 128            # mel bins
    d_model: int = 512
    stride: int = 4                 # time-reduction factor
    vocab_size: int = 803
    ctc_hidden_dim: int = 1024
    emformer: EmformerConfig = dataclasses.field(default_factory=EmformerConfig)

    @property
    def compute_dtype(self):
        return self.emformer.compute_dtype

    @classmethod
    def vietnamese(cls, compute_dtype: Any = jnp.float32) -> "EncoderConfig":
        """Production vi geometry (reference asr-online.yaml:112-118 +
        recognition.py:207-217 state shapes)."""
        return cls(emformer=EmformerConfig(compute_dtype=compute_dtype))


def init_encoder_params(key: jax.Array, cfg: EncoderConfig) -> dict:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    reduced_dim = cfg.d_model // cfg.stride
    w_in, _ = _linear_init(k1, cfg.input_dim, reduced_dim)
    ctc_w1, ctc_b1 = _linear_init(k2, cfg.d_model, cfg.ctc_hidden_dim)
    ctc_w2, ctc_b2 = _linear_init(k3, cfg.ctc_hidden_dim, cfg.vocab_size)
    return {
        "input_linear": {"w": w_in},        # bias=False (encoder.py:99-103)
        "emformer": init_emformer_params(k4, cfg.emformer),
        "ctc": {"w1": ctc_w1, "b1": ctc_b1, "w2": ctc_w2, "b2": ctc_b2},
    }


def init_encoder_state(cfg: EncoderConfig, batch_size: int) -> EmformerState:
    return init_emformer_state(cfg.emformer, batch_size)


def _time_reduction(x: jax.Array, stride: int) -> jax.Array:
    """Stack `stride` consecutive frames into the feature dim
    (reference utils/common.py:110-124)."""
    b, t, d = x.shape
    pad = (stride - t % stride) % stride
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
    return x.reshape(b, (t + pad) // stride, d * stride)


def _pre_emformer(params: dict, cfg: EncoderConfig, feats: jax.Array) -> jax.Array:
    cdt = cfg.compute_dtype
    x = feats.astype(cdt) @ params["input_linear"]["w"].astype(cdt)
    return _time_reduction(x, cfg.stride).astype(jnp.float32)


def ctc_head(params: dict, cfg: EncoderConfig, enc: jax.Array) -> jax.Array:
    """Linear -> SiLU -> Linear -> log_softmax (reference decoder.py:60-70)."""
    p = params["ctc"]
    cdt = cfg.compute_dtype
    h = jax.nn.silu(enc.astype(cdt) @ p["w1"].astype(cdt) + p["b1"].astype(cdt))
    logits = (h @ p["w2"].astype(cdt) + p["b2"].astype(cdt)).astype(jnp.float32)
    return jax.nn.log_softmax(logits, axis=-1)


def encoder_stream_step(
    params: dict, cfg: EncoderConfig, feats: jax.Array, state: EmformerState,
    reset=None, advance=None,
) -> Tuple[jax.Array, EmformerState]:
    """One streaming step.

    Args:
      feats: [B, T_mel, input_dim] mel frames for one chunk; T_mel must
        reduce to exactly segment_length + right_context_length frames
        (vi geometry: 80 -> 20 = 16 + 4).
    Returns:
      (log_probs [B, segment_length, vocab], new_state)
    """
    x = _pre_emformer(params, cfg, feats)
    em = cfg.emformer
    assert x.shape[1] == em.segment_length + em.right_context_length, (
        f"chunk reduces to {x.shape[1]} frames, expected "
        f"{em.segment_length}+{em.right_context_length}")
    enc, new_state = emformer_stream_step(params["emformer"], em, x, state,
                                          reset=reset, advance=advance)
    return ctc_head(params, cfg, enc), new_state


def encoder_forward(
    params: dict, cfg: EncoderConfig, feats: jax.Array,
    feat_lens: Optional[jax.Array] = None,
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """Offline forward (scan of the streaming step over chunks).

    Returns (log_probs [B, T_out, vocab], out_lens) where out_lens is in
    emission frames (= ceil(feat_lens / stride) truncated to T_out).
    """
    x = _pre_emformer(params, cfg, feats)
    enc, _ = emformer_forward(params["emformer"], cfg.emformer, x)
    enc = enc[:, :x.shape[1]]   # drop chunk-alignment padding
    log_probs = ctc_head(params, cfg, enc)
    out_lens = None
    if feat_lens is not None:
        out_lens = jnp.minimum((feat_lens - 1) // cfg.stride + 1,
                               log_probs.shape[1])
    return log_probs, out_lens
