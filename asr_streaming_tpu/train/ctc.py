"""CTC training for the streaming encoder (data + tensor parallel).

The reference keeps its training utilities in ``streaming_decoder_v1``
(datasets/augmentation/losses/scheduler — SURVEY.md §2.8) with no
distributed training at all; this module is the TPU-native training loop:
the *same* chunk-scanned encoder forward used for inference (zero
train/serve mismatch), optax CTC loss, Noam warmup schedule (reference:
streaming_decoder_v1/lightspeech/optims/scheduler.py:5-50), jitted over a
('data','model') mesh with GSPMD-inserted collectives.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from asr_streaming_tpu.models.asr import ASRConfig
from asr_streaming_tpu.models.encoder import encoder_forward


def noam_annealing(base_lr: float, d_model: int, warmup_steps: int,
                   min_lr: float = 0.0,
                   max_lr: Optional[float] = None) -> optax.Schedule:
    """NoamAnnealing (reference v1 optims/scheduler.py:5-50):
    lr = base * d_model^-0.5 * min(step^-0.5, step * warmup^-1.5),
    clamped to [min_lr, max_lr]."""
    norm = d_model ** -0.5

    def schedule(step):
        step = jnp.maximum(step, 1).astype(jnp.float32)
        lr = base_lr * norm * jnp.minimum(
            step ** -0.5, step * warmup_steps ** -1.5)
        if max_lr is not None:
            lr = jnp.minimum(lr, max_lr)
        return jnp.maximum(lr, min_lr)

    return schedule


class Batch(NamedTuple):
    feats: jax.Array        # [B, T, n_mels]
    feat_lens: jax.Array    # [B] int32
    labels: jax.Array       # [B, Lmax] int32 (blank=0 padding)
    label_lens: jax.Array   # [B] int32


def ctc_loss_fn(params: dict, cfg: ASRConfig, batch: Batch) -> jax.Array:
    log_probs, out_lens = encoder_forward(
        params["encoder"], cfg.encoder, batch.feats, batch.feat_lens)
    T = log_probs.shape[1]
    logit_pad = (jnp.arange(T)[None, :] >= out_lens[:, None]).astype(
        jnp.float32)
    Lmax = batch.labels.shape[1]
    label_pad = (jnp.arange(Lmax)[None, :] >= batch.label_lens[:, None]
                 ).astype(jnp.float32)
    per_seq = optax.ctc_loss(log_probs, logit_pad, batch.labels, label_pad,
                             blank_id=0)
    return jnp.mean(per_seq)


def make_optimizer(cfg: ASRConfig, base_lr: float = 1.0,
                   warmup_steps: int = 10_000,
                   weight_decay: float = 1e-6) -> optax.GradientTransformation:
    schedule = noam_annealing(base_lr, cfg.encoder.d_model, warmup_steps)
    return optax.chain(
        optax.clip_by_global_norm(5.0),
        optax.adamw(schedule, b1=0.9, b2=0.98, eps=1e-9,
                    weight_decay=weight_decay),
    )


def make_train_step(cfg: ASRConfig, optimizer: optax.GradientTransformation):
    """Returns train_step(params, opt_state, batch) -> (params, opt_state,
    loss).  Only params['encoder'] is trained; frontend buffers pass
    through untouched (no weight decay on non-parameters).  Init opt_state
    with optimizer.init(params['encoder'])."""

    def train_step(params, opt_state, batch: Batch):
        enc = params["encoder"]
        loss, grads = jax.value_and_grad(
            lambda e: ctc_loss_fn({"encoder": e}, cfg, batch))(enc)
        updates, opt_state = optimizer.update(grads, opt_state, enc)
        enc = optax.apply_updates(enc, updates)
        return {**params, "encoder": enc}, opt_state, loss

    return train_step
