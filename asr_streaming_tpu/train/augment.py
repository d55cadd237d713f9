"""Data augmentation.

Re-implementations of the reference's augmentation stack (reference:
streaming_decoder_v1/lightspeech/datas/augment.py:13-221), split TPU-first:

  * SpecAugment (time/frequency masking) runs ON DEVICE inside the train
    step, batched and jittable with explicit PRNG keys (the reference
    applies torchaudio maskers per example on host).
  * Waveform-level augmentations (background noise at sampled SNR,
    overlapped speech at sampled energy ratio, RIR reverb via FFT
    convolution) are host-side NumPy transforms over caller-provided
    noise/speech/RIR banks — the file-picking I/O stays in the data
    pipeline where it belongs.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from asr_streaming_tpu.ops.sequence import fft_convolution


# ----------------------------------------------------------- device-side

def spec_augment(key: jax.Array, feats: jax.Array,
                 time_masks: int = 10, time_width: float = 0.05,
                 freq_masks: int = 1, freq_width: int = 27,
                 mask_value: float = 0.0) -> jax.Array:
    """Batched SpecAugment.  feats: [B, T, F].

    time_width is relative (reference TimeMasking, augment.py:190-204);
    freq_width absolute bins (FrequencyMasking, augment.py:207-221).
    """
    B, T, F = feats.shape
    t_width = max(int(time_width * T), 1)

    def mask_axis(key, length, width, n_masks):
        ks, kw = jax.random.split(key)
        starts = jax.random.randint(ks, (B, n_masks), 0, length)
        widths = jax.random.randint(kw, (B, n_masks), 0, width + 1)
        idx = jnp.arange(length)[None, None, :]
        hit = (idx >= starts[:, :, None]) & \
              (idx < (starts + widths)[:, :, None])
        return jnp.any(hit, axis=1)          # [B, length]

    kt, kf = jax.random.split(key)
    tmask = mask_axis(kt, T, t_width, time_masks)
    fmask = mask_axis(kf, F, freq_width, freq_masks)
    out = jnp.where(tmask[:, :, None], mask_value, feats)
    return jnp.where(fmask[:, None, :], mask_value, out)


# ------------------------------------------------------------- host-side

def add_background_noise(rng: np.random.Generator, speech: np.ndarray,
                         noise: np.ndarray, min_snr_db: float = 0.0,
                         max_snr_db: float = 30.0) -> np.ndarray:
    """Mix noise at a sampled SNR, preserving speech norm
    (reference augment.py:131-188)."""
    speech = np.asarray(speech, np.float32)
    noise = np.asarray(noise, np.float32)
    T = len(speech)
    if len(noise) >= T:
        off = rng.integers(0, len(noise) - T + 1)
        noise = noise[off:off + T]
    else:
        off = rng.integers(0, T - len(noise) + 1)
        noise = np.pad(noise, (off, T - len(noise) - off))

    snr_db = rng.uniform(min_snr_db, max_snr_db)
    rms_speech = np.sqrt(np.mean(speech ** 2)) + 1e-9
    rms_noise = np.sqrt(np.mean(noise ** 2)) + 1e-9
    scale = 10 ** (-snr_db / 20) * rms_speech / rms_noise
    noisy = speech + scale * noise
    noisy *= np.linalg.norm(speech) / (np.linalg.norm(noisy) + 1e-9)
    return np.clip(noisy, -1.0, 1.0)


def overlap_speech(rng: np.random.Generator, speech: np.ndarray,
                   secondary: np.ndarray, min_energy_ratio: float = -5.0,
                   max_energy_ratio: float = 5.0) -> np.ndarray:
    """Overlay a random slice of a second utterance at a sampled energy
    ratio (reference augment.py:13-70)."""
    speech = np.array(speech, np.float32, copy=True)
    T = len(speech)
    mix_len = rng.integers(1, T // 2 + 1)
    mix_len = min(len(secondary) - 1, int(mix_len))
    if mix_len <= 0:
        return speech
    p_start = rng.integers(0, T - mix_len)
    s_start = rng.integers(0, len(secondary) - mix_len)
    ratio = rng.uniform(min_energy_ratio, max_energy_ratio)
    e_p = np.sqrt(np.mean(speech ** 2))
    e_s = np.sqrt(np.mean(secondary ** 2))
    coeff = np.sqrt(10 ** (ratio / 10))
    scale = e_p / (coeff * e_s + 1e-9)
    speech[p_start:p_start + mix_len] += \
        scale * secondary[s_start:s_start + mix_len]
    return speech


def apply_impulse_response(speech: np.ndarray, rir: np.ndarray,
                           sample_rate: int = 16000,
                           second_before_peak: float = 0.01,
                           second_after_peak: float = 0.5) -> np.ndarray:
    """Reverberate with a trimmed/normalized RIR via FFT convolution
    (reference augment.py:73-128)."""
    speech = np.asarray(speech, np.float32)
    rir = np.asarray(rir, np.float32)
    peak = int(np.argmax(np.abs(rir)))
    start = max(0, peak - int(second_before_peak * sample_rate))
    end = min(len(rir), peak + int(second_after_peak * sample_rate))
    rir = rir[start:end]
    rir = rir / (np.linalg.norm(rir) + 1e-9)
    rir = rir[::-1].copy()

    padded = np.pad(speech, (len(rir) - 1, 0))
    rev = np.asarray(fft_convolution(jnp.asarray(padded), jnp.asarray(rir),
                                     mode="valid"))
    rev = rev * (np.linalg.norm(speech) / (np.linalg.norm(rev) + 1e-9))
    return np.clip(rev, -1.0, 1.0).astype(np.float32)
