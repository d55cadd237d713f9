"""Training losses (JAX).

Re-implementations of the reference's criterion zoo (reference:
streaming_decoder_v1/lightspeech/modules/criterion.py:12-253):

  * AdditiveMarginSoftmaxLoss (AM-softmax, speaker ID)
  * RandomQuantizationLoss (BEST-RQ-style SSL: random projection +
    codebook nearest-neighbor targets + AM-softmax)
  * SequenceToSequenceLoss (CTC + RNN-T joint) — the RNN-T loss itself is
    implemented here as a lax.scan forward algorithm (torchaudio provides
    a C++ kernel; XLA gets a vectorized lattice recursion instead)
  * LeastSquares GAN losses
  * STFT / MultiResolutionSTFT losses (vocoder training)
  * TemporalPredictionLoss (log-domain duration MSE)
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import optax

from asr_streaming_tpu.ops.sequence import make_padding_mask


# ---------------------------------------------------------------- AM-softmax

def init_am_softmax_params(key, input_dim: int, output_dim: int) -> dict:
    std = (2.0 / (input_dim + output_dim)) ** 0.5
    return {"W": jax.random.normal(key, (input_dim, output_dim)) * std}


def additive_margin_softmax_loss(params: dict, x: jax.Array,
                                 labels: jax.Array, margin: float = 0.2,
                                 scale: float = 30.0
                                 ) -> Tuple[jax.Array, jax.Array]:
    """Returns (loss, predictions).  x: [N, D]; labels: [N]."""
    x_norm = x / jnp.clip(jnp.linalg.norm(x, axis=1, keepdims=True),
                          1e-9, None)
    # NB the reference normalizes W along dim=1 (the class axis of the
    # [D, C] matrix), i.e. per-feature rows — mirrored here.
    w = params["W"]
    w_norm = w / jnp.clip(jnp.linalg.norm(w, axis=1, keepdims=True),
                          1e-9, None)
    costh = x_norm @ w_norm
    delta = jax.nn.one_hot(labels, costh.shape[1]) * margin
    logits = scale * (costh - delta)
    loss = jnp.mean(optax.softmax_cross_entropy_with_integer_labels(
        logits, labels))
    preds = jnp.argmax(logits, axis=1)
    return loss, preds


# ------------------------------------------------------------------ BEST-RQ

def init_random_quantizer(key, feature_dim: int, encoder_dim: int,
                          quantizer_size: int, vocabulary_size: int) -> dict:
    k1, k2, k3 = jax.random.split(key, 3)
    std = (2.0 / (feature_dim + quantizer_size)) ** 0.5
    return {
        "projection": jax.random.normal(
            k1, (quantizer_size, feature_dim)) * std,   # fixed buffer
        "codebook": jax.random.normal(
            k2, (vocabulary_size, quantizer_size)),      # fixed buffer
        "am": init_am_softmax_params(k3, encoder_dim, vocabulary_size),
    }


def random_quantization_loss(params: dict, encoded: jax.Array,
                             lens: jax.Array, features: jax.Array,
                             pos_mask: Optional[jax.Array] = None
                             ) -> jax.Array:
    """BEST-RQ SSL loss: targets from random-projection nearest codebook
    entries; AM-softmax on masked positions.  encoded: [B, T, E];
    features: [B, T, F].  pos_mask ([B, T] bool, optional) restricts the
    loss to specific positions (BEST-RQ scores only the masked spans —
    train/ssl.py); default is all valid (non-padding) frames."""
    q = features @ params["projection"].T
    q = q / jnp.clip(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-9, None)
    cb = params["codebook"]
    cb = cb / jnp.clip(jnp.linalg.norm(cb, axis=-1, keepdims=True),
                       1e-9, None)
    d2 = (jnp.sum(q ** 2, -1, keepdims=True)
          - 2 * q @ cb.T + jnp.sum(cb ** 2, -1))
    targets = jnp.argmin(d2, axis=-1)                  # [B, T]

    mask = make_padding_mask(lens, encoded.shape[1])
    if pos_mask is not None:
        mask = mask & pos_mask
    flat_x = encoded.reshape(-1, encoded.shape[-1])
    flat_t = targets.reshape(-1)
    flat_m = mask.reshape(-1)

    x_norm = flat_x / jnp.clip(
        jnp.linalg.norm(flat_x, axis=1, keepdims=True), 1e-9, None)
    w = params["am"]["W"]
    w_norm = w / jnp.clip(jnp.linalg.norm(w, axis=1, keepdims=True),
                          1e-9, None)
    logits = 30.0 * (x_norm @ w_norm
                     - jax.nn.one_hot(flat_t, w.shape[1]) * 0.2)
    ce = optax.softmax_cross_entropy_with_integer_labels(logits, flat_t)
    return jnp.sum(ce * flat_m) / jnp.clip(jnp.sum(flat_m), 1, None)


# ----------------------------------------------------------------- RNNT loss

def rnnt_loss(logits: jax.Array, logit_lens: jax.Array, targets: jax.Array,
              target_lens: jax.Array, blank: int = 0) -> jax.Array:
    """RNN-T forward-algorithm loss (natural log), batched.

    logits: [B, T, U+1, V] joint-network outputs; targets: [B, U];
    returns mean -logP over the batch (torchaudio rnnt_loss semantics).
    """
    B, T, U1, V = logits.shape
    U = U1 - 1
    logp = jax.nn.log_softmax(logits, axis=-1)
    blank_lp = logp[..., blank]                                  # [B, T, U+1]
    idx = jnp.pad(targets, ((0, 0), (0, 1)))                     # [B, U+1]
    emit_lp = jnp.take_along_axis(
        logp, idx[:, None, :, None], axis=3)[..., 0]             # [B, T, U+1]

    NEG = -1e30
    u_range = jnp.arange(U1)
    alpha0 = jnp.where(u_range == 0, 0.0, NEG)[None, :].repeat(B, 0)

    def step(alpha, inputs):
        blank_t, emit_t = inputs                                 # [B, U+1]

        # Vertical closure: paths with exactly k emissions at this frame.
        # Propagating only the newest contribution avoids the classic
        # repeated-logaddexp double count.
        def emit_scan(carry, _):
            total, new = carry
            shifted = jnp.concatenate(
                [jnp.full((B, 1), NEG), new[:, :-1] + emit_t[:, :-1]],
                axis=1)
            return (jnp.logaddexp(total, shifted), shifted), None

        (alpha_emit, _), _ = jax.lax.scan(emit_scan, (alpha, alpha), None,
                                          length=U)
        # horizontal move: consume frame t with blank
        return alpha_emit + blank_t, alpha_emit

    _, alphas = jax.lax.scan(
        step, alpha0,
        (blank_lp.transpose(1, 0, 2), emit_lp.transpose(1, 0, 2)))
    # alphas[t] = alpha AFTER emissions at frame t, BEFORE its blank
    # total logP = alpha[T_b - 1, U_b] + blank(T_b - 1, U_b)
    t_idx = jnp.clip(logit_lens - 1, 0, T - 1)
    alpha_final = alphas[t_idx, jnp.arange(B)]                   # [B, U+1]
    final = jnp.take_along_axis(alpha_final, target_lens[:, None],
                                axis=1)[:, 0]
    final_blank = jnp.take_along_axis(
        blank_lp[jnp.arange(B), t_idx], target_lens[:, None], axis=1)[:, 0]
    return -jnp.mean(final + final_blank)


def sequence_to_sequence_loss(ctc_log_probs: jax.Array,
                              rnnt_logits: jax.Array,
                              logit_lens: jax.Array, targets: jax.Array,
                              target_lens: jax.Array,
                              ctc_weight: float = 1.0,
                              rnnt_weight: float = 1.0,
                              blank: int = 0):
    """Joint CTC + RNN-T objective (reference criterion.py:86-126)."""
    T = ctc_log_probs.shape[1]
    logit_pad = (jnp.arange(T)[None, :] >= logit_lens[:, None]).astype(
        jnp.float32)
    Lmax = targets.shape[1]
    label_pad = (jnp.arange(Lmax)[None, :] >= target_lens[:, None]).astype(
        jnp.float32)
    ctc = jnp.mean(optax.ctc_loss(ctc_log_probs, logit_pad, targets,
                                  label_pad, blank_id=blank))
    rnnt = rnnt_loss(rnnt_logits, logit_lens, targets, target_lens, blank)
    return ctc_weight * ctc + rnnt_weight * rnnt, ctc, rnnt


# ------------------------------------------------------------------ GAN

def least_squares_generative_loss(disc_outs: Sequence[jax.Array]
                                  ) -> jax.Array:
    loss = sum(jnp.mean((1.0 - dg) ** 2) for dg in disc_outs)
    return loss / len(disc_outs)


def least_squares_adversarial_loss(disc_outs: Sequence[jax.Array],
                                   disc_tgts: Sequence[jax.Array]
                                   ) -> jax.Array:
    loss = sum(jnp.mean((1.0 - dr) ** 2) + jnp.mean(dg ** 2)
               for dg, dr in zip(disc_outs, disc_tgts))
    return loss / len(disc_tgts)


# ------------------------------------------------------------------ STFT

@dataclasses.dataclass(frozen=True)
class STFTResolution:
    n_fft: int
    win_length: int
    hop_length: int


def _magnitude_stft(wave: jax.Array, res: STFTResolution) -> jax.Array:
    """[B, T] -> [B, n_bins, frames] magnitude (center=True hann)."""
    n = np.arange(res.n_fft)
    k = np.arange(res.n_fft // 2 + 1)
    win = 0.5 * (1 - np.cos(2 * np.pi * np.arange(res.win_length)
                            / res.win_length))
    padded = np.zeros(res.n_fft)
    left = (res.n_fft - res.win_length) // 2
    padded[left:left + res.win_length] = win
    angle = 2 * np.pi * np.outer(k, n) / res.n_fft
    kernel = np.concatenate([np.cos(angle) * padded,
                             -np.sin(angle) * padded])[:, None, :]
    pad = res.n_fft // 2
    x = jnp.pad(wave, ((0, 0), (pad, pad)), mode="reflect")
    spec = jax.lax.conv_general_dilated(
        x[:, None, :], jnp.asarray(kernel, jnp.float32),
        (res.hop_length,), "VALID",
        dimension_numbers=("NCW", "OIW", "NCW"))
    nb = res.n_fft // 2 + 1
    return jnp.sqrt(spec[:, :nb] ** 2 + spec[:, nb:] ** 2 + 1e-12)


def stft_loss(audio_outs: jax.Array, audio_tgts: jax.Array,
              audio_lens: jax.Array, res: STFTResolution) -> jax.Array:
    """Spectral-convergence + log-magnitude L1 (criterion.py:155-216)."""
    so = _magnitude_stft(audio_outs, res)
    st = _magnitude_stft(audio_tgts, res)
    frames = st.shape[2]
    frame_lens = jnp.clip(audio_lens // res.hop_length + 1, 0, frames)
    mask = (jnp.arange(frames)[None, None, :]
            < frame_lens[:, None, None]).astype(st.dtype)
    sc = jnp.linalg.norm((st - so) * mask) / \
        jnp.clip(jnp.linalg.norm(st * mask), 1e-9, None)
    full_mask = jnp.broadcast_to(mask, st.shape)
    mag = jnp.sum(jnp.abs(jnp.log(so + 1e-9) - jnp.log(st + 1e-9))
                  * full_mask) / jnp.clip(jnp.sum(full_mask), 1, None)
    return sc + mag


def multi_resolution_stft_loss(
        audio_outs: jax.Array, audio_tgts: jax.Array, audio_lens: jax.Array,
        resolutions: Sequence[Tuple[int, int, int]] = (
            (1024, 600, 120), (2048, 1200, 240), (512, 240, 50)),
) -> jax.Array:
    loss = 0.0
    for fs, wl, hl in resolutions:
        loss = loss + stft_loss(audio_outs, audio_tgts, audio_lens,
                                STFTResolution(fs, wl, hl))
    return loss / len(resolutions)


# --------------------------------------------------------------- durations

def temporal_prediction_loss(outs: jax.Array, tgts: jax.Array,
                             min_value: float = -100.0) -> jax.Array:
    """Log-domain duration MSE, masked where target == floor
    (criterion.py:242-253)."""
    # log(0) -> -inf -> clamped to min_value, which marks the mask
    # (reference clamps the same way, criterion.py:247-249)
    lo = jnp.clip(jnp.log(jnp.where(outs > 0, outs, 0.0)), min_value, None)
    lt = jnp.clip(jnp.log(jnp.where(tgts > 0, tgts, 0.0)), min_value, None)
    mask = (lt != min_value).astype(lo.dtype)
    return jnp.sum(((lo - lt) ** 2) * mask) / jnp.clip(jnp.sum(mask), 1,
                                                       None)
