"""Fused streaming ASR step: waveform chunk -> CTC log-probs, one jit region.

This is the TPU-native equivalent of the reference's per-chunk pipeline
``LightningASR.stream`` (reference: streaming_decoder/lightspeech/models/
recognition.py:191-204): mel frontend -> streaming Emformer -> CTC head —
but fused into a single fixed-shape jitted step so N concurrent streams run
as one batched device program, with argmax/max computed on-device so the
host only consumes tiny per-chunk tensors.

The offline path scans the *same step* over chunk windows framed exactly
like the server's ring buffer (buffer_length of leading zeros, advance by
segment_length — reference stream.py:23, 78-87, 148-163), so offline and
streaming decodes agree by construction.
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from asr_streaming_tpu.ops.frontend import MelConfig, make_mel_params, log_mel
from asr_streaming_tpu.models.encoder import (
    EncoderConfig, init_encoder_params, init_encoder_state,
    encoder_stream_step,
)
from asr_streaming_tpu.models.emformer import EmformerState, EmformerConfig
from asr_streaming_tpu.utils.audio import AudioConfig, VI_AUDIO


@dataclasses.dataclass(frozen=True)
class ASRConfig:
    audio: AudioConfig = VI_AUDIO
    mel: MelConfig = dataclasses.field(default_factory=MelConfig.for_vietnamese)
    encoder: EncoderConfig = dataclasses.field(
        default_factory=EncoderConfig.vietnamese)

    @classmethod
    def vietnamese(cls, compute_dtype: Any = jnp.float32) -> "ASRConfig":
        return cls(encoder=EncoderConfig.vietnamese(compute_dtype))

    @classmethod
    def tiny(cls, vocab_size: int = 21) -> "ASRConfig":
        """Small geometry for tests: same chunking, 2 layers, d_model 64."""
        emf = EmformerConfig(d_model=64, num_heads=4, ffn_dim=96,
                             num_layers=2)
        return cls(encoder=EncoderConfig(vocab_size=vocab_size,
                                         ctc_hidden_dim=48, d_model=64,
                                         emformer=emf))


def with_pallas_layer(cfg: ASRConfig, enable: Optional[bool] = None,
                      mode: str = "stack",
                      quant: str = "none") -> ASRConfig:
    """Route the Emformer through the fused Pallas fast path.

    mode="stack" (default): the whole-encoder megakernel
    (ops/pallas_emformer.py:fused_emformer_stack) — one launch per step,
    inter-layer activations in VMEM (v5e @512 slots bf16: 14.8 ms/step).
    mode="layer": the per-layer kernel (19.5 ms/step; XLA scan: 36 ms).
    quant="int8": W8A8 projections/FFN inside the kernels (int8 MXU) —
    opt-in; measured neutral at D=512 (kernels are VPU-bound), useful
    at larger d_model.  bf16 stays the default numerics.
    Defaults to on for TPU backends, off elsewhere (the kernels would run
    interpreted).  Env overrides ASR_PALLAS_MODE=stack|layer|off,
    ASR_PALLAS_QUANT=int8|none.
    """
    import os
    mode = os.environ.get("ASR_PALLAS_MODE", mode)
    quant = os.environ.get("ASR_PALLAS_QUANT", quant)
    if enable is None:
        enable = jax.default_backend() == "tpu"
    if mode == "off":
        enable = False
    emf = dataclasses.replace(
        cfg.encoder.emformer,
        use_pallas_stack=enable and mode != "layer",
        use_pallas_layer=enable and mode == "layer",
        quant=quant if enable else "none")
    return dataclasses.replace(
        cfg, encoder=dataclasses.replace(cfg.encoder, emformer=emf))


class StepOutput(NamedTuple):
    log_probs: jax.Array   # [B, U, V] fp32
    argmax: jax.Array      # [B, U] int32 per-frame best token
    frame_max: jax.Array   # [B, U] fp32 per-frame best log-prob
    state: EmformerState


def init_asr_params(key: jax.Array, cfg: ASRConfig) -> dict:
    return {
        "frontend": make_mel_params(cfg.mel),   # fixed buffers, not trained
        "encoder": init_encoder_params(key, cfg.encoder),
    }


def init_asr_state(cfg: ASRConfig, batch_size: int) -> EmformerState:
    return init_encoder_state(cfg.encoder, batch_size)


def asr_stream_step(params: dict, cfg: ASRConfig, wave: jax.Array,
                    state: EmformerState, reset=None,
                    advance=None) -> StepOutput:
    """One decode step for a batch of streams.

    Args:
      wave: [B, chunk_length] float32 — carried context + new segment,
        exactly the server's ring-buffer window (vi: 13440 samples).
      reset / advance: optional [B] slot lifecycle masks, applied inside
        the encoder step (fused in VMEM on the Pallas path).
    """
    feats = log_mel(params["frontend"], cfg.mel, wave)
    log_probs, new_state = encoder_stream_step(
        params["encoder"], cfg.encoder, feats, state,
        reset=reset, advance=advance)
    return StepOutput(
        log_probs=log_probs,
        argmax=jnp.argmax(log_probs, axis=-1).astype(jnp.int32),
        frame_max=jnp.max(log_probs, axis=-1),
        state=new_state,
    )


def frame_waveform(wave: np.ndarray, audio: AudioConfig) -> np.ndarray:
    """Frame a full waveform [T] into server-identical chunk windows.

    Prepends buffer_length zeros (the ring buffer's initial state,
    reference stream.py:23) and zero-pads the tail to whole chunks.
    Returns [n_chunks, chunk_length].
    """
    seg, chunk = audio.segment_length, audio.chunk_length
    padded = np.concatenate([np.zeros(audio.buffer_length, np.float32),
                             np.asarray(wave, np.float32)])
    n_chunks = max(1, -(-(len(padded) - chunk) // seg) + 1)
    total = (n_chunks - 1) * seg + chunk
    padded = np.pad(padded, (0, max(0, total - len(padded))))
    idx = np.arange(n_chunks)[:, None] * seg + np.arange(chunk)[None, :]
    return padded[idx]


def asr_offline_logprobs(params: dict, cfg: ASRConfig,
                         chunks: jax.Array) -> jax.Array:
    """Decode pre-framed chunks [n_chunks, B, chunk_length] by scanning the
    streaming step; returns emissions [B, n_chunks * U, V]."""
    B = chunks.shape[1]
    state0 = init_asr_state(cfg, B)

    def body(state, chunk):
        out = asr_stream_step(params, cfg, chunk, state)
        return out.state, out.log_probs

    _, logp = jax.lax.scan(body, state0, chunks)
    # [n_chunks, B, U, V] -> [B, n_chunks*U, V]
    n, _, U, V = logp.shape
    return logp.transpose(1, 0, 2, 3).reshape(B, n * U, V)
