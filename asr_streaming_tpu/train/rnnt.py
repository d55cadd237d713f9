"""RNN-T training for the English Emformer-RNNT model.

The reference's joint objective lives in ``SequenceToSequenceLoss``
(reference: streaming_decoder_v1/lightspeech/modules/criterion.py:86-126,
CTC + torchaudio rnnt_loss); here the RNNT forward is the same streaming
transcriber scanned over chunks (train == serve), the predictor consumes
blank-prepended targets, and the lattice loss is train/losses.rnnt_loss.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from asr_streaming_tpu.models.emformer import emformer_forward
from asr_streaming_tpu.models.encoder import _time_reduction
from asr_streaming_tpu.models.emformer import _layer_norm
from asr_streaming_tpu.models.rnnt import (
    PredictorState, RNNTConfig, joiner, predictor_step,
)
from asr_streaming_tpu.train.losses import rnnt_loss


class RNNTBatch(NamedTuple):
    feats: jax.Array        # [B, T_mel, n_mels]
    feat_lens: jax.Array    # [B]
    targets: jax.Array      # [B, U] int32
    target_lens: jax.Array  # [B]


def transcriber_forward(params: dict, cfg: RNNTConfig, feats: jax.Array
                        ) -> jax.Array:
    """Offline transcriber: scan of the streaming step over chunks
    (identical math to serving).  Returns [B, T_out, encoding_dim]."""
    x = feats @ params["input_linear"]["w"]
    x = _time_reduction(x, 4)
    enc, _ = emformer_forward(params["emformer"], cfg.emformer, x)
    enc = enc[:, :x.shape[1]]
    p = params["enc_out"]
    return _layer_norm(enc @ p["w"] + p["b"], p["ln_scale"], p["ln_bias"])


def predictor_forward(params: dict, cfg: RNNTConfig, targets: jax.Array
                      ) -> jax.Array:
    """Predictor over blank-prepended targets -> [B, U+1, encoding_dim]."""
    B, U = targets.shape
    bos = jnp.full((B, 1), cfg.blank, jnp.int32)
    tokens = jnp.concatenate([bos, targets], axis=1)      # [B, U+1]
    state = PredictorState(
        h=jnp.zeros((cfg.pred_layers, B, cfg.pred_hidden)),
        c=jnp.zeros((cfg.pred_layers, B, cfg.pred_hidden)))

    def step(state, tok):
        out, state = predictor_step(params, tok, state)
        return state, out

    _, outs = jax.lax.scan(step, state, tokens.T)
    return outs.transpose(1, 0, 2)                        # [B, U+1, E]


def rnnt_loss_fn(params: dict, cfg: RNNTConfig, batch: RNNTBatch
                 ) -> jax.Array:
    enc = transcriber_forward(params, cfg, batch.feats)    # [B, T, E]
    pred = predictor_forward(params, cfg, batch.targets)   # [B, U+1, E]
    logits = joiner(params, enc[:, :, None, :], pred[:, None, :, :])
    t_lens = jnp.minimum((batch.feat_lens - 1) // 4 + 1, enc.shape[1])
    return rnnt_loss(logits, t_lens, batch.targets, batch.target_lens,
                     blank=cfg.blank)


def make_rnnt_train_step(cfg: RNNTConfig,
                         optimizer: optax.GradientTransformation):
    def train_step(params, opt_state, batch: RNNTBatch):
        loss, grads = jax.value_and_grad(
            lambda p: rnnt_loss_fn(p, cfg, batch))(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return train_step
