"""GAN discriminators for vocoder training (JAX).

Re-implementations of the reference's discriminator zoo (reference:
streaming_decoder_v1/lightspeech/modules/discriminator.py:14-437), used
with the least-squares GAN losses in train/losses.py:

  * PeriodWaveformDiscriminator (+ multi-period ensemble) — reshape the
    waveform into [T/p, p] and run strided 2-D convs (HiFi-GAN MPD).
  * ResolutionSpectrogramDiscriminator (+ multi-resolution ensemble) —
    2-D convs over magnitude spectrograms at several STFT resolutions.
  * PQMF analysis filterbank + multi-band discriminator — near-perfect
    reconstruction cosine-modulated filterbank splitting the waveform
    into subbands, each judged by a small 1-D conv stack.
"""

from __future__ import annotations

import math
from typing import List, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from asr_streaming_tpu.train.losses import STFTResolution, _magnitude_stft


def _conv_init(key, cout, cin, kh, kw=None):
    if kw is None:
        bound = 1.0 / math.sqrt(cin * kh)
        w = jax.random.uniform(key, (cout, cin, kh), minval=-bound,
                               maxval=bound)
    else:
        bound = 1.0 / math.sqrt(cin * kh * kw)
        w = jax.random.uniform(key, (cout, cin, kh, kw), minval=-bound,
                               maxval=bound)
    return {"w": w, "b": jnp.zeros(cout)}


# ------------------------------------------------- multi-period (waveform)

PERIODS = (2, 3, 5, 7, 11)
_MPD_CHANNELS = (32, 128, 512, 1024)


def init_period_discriminator(key, channels=_MPD_CHANNELS) -> dict:
    keys = jax.random.split(key, len(channels) + 1)
    convs, cin = [], 1
    for k, c in zip(keys[:-1], channels):
        convs.append(_conv_init(k, c, cin, 5, 1))
        cin = c
    return {"convs": convs, "out": _conv_init(keys[-1], 1, cin, 3, 1)}


def period_discriminator(p: dict, wave: jax.Array, period: int
                         ) -> Tuple[jax.Array, List[jax.Array]]:
    """wave: [B, T] -> (score map, feature maps)."""
    B, T = wave.shape
    pad = (period - T % period) % period
    x = jnp.pad(wave, ((0, 0), (0, pad)), mode="reflect" if T > 1 else
                "constant")
    x = x.reshape(B, 1, -1, period)                    # [B, 1, T/p, p]
    fmaps = []
    for conv in p["convs"]:
        x = jax.lax.conv_general_dilated(
            x, conv["w"], (3, 1), [(2, 2), (0, 0)],
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
        x = jax.nn.leaky_relu(x + conv["b"][None, :, None, None], 0.1)
        fmaps.append(x)
    x = jax.lax.conv_general_dilated(
        x, p["out"]["w"], (1, 1), [(1, 1), (0, 0)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    x = x + p["out"]["b"][None, :, None, None]
    return x.reshape(B, -1), fmaps


def init_multi_period_discriminator(key, periods=PERIODS) -> dict:
    keys = jax.random.split(key, len(periods))
    return {"periods": list(periods),
            "discs": [init_period_discriminator(k) for k in keys]}


def multi_period_discriminator(p: dict, wave: jax.Array):
    outs, fmaps = [], []
    for disc, period in zip(p["discs"], p["periods"]):
        o, f = period_discriminator(disc, wave, period)
        outs.append(o)
        fmaps.extend(f)
    return outs, fmaps


# --------------------------------------------- multi-resolution (spectral)

RESOLUTIONS = ((1024, 600, 120), (2048, 1200, 240), (512, 240, 50))


def init_resolution_discriminator(key, channels=(32, 64, 128, 256)) -> dict:
    keys = jax.random.split(key, len(channels) + 1)
    convs, cin = [], 1
    for k, c in zip(keys[:-1], channels):
        convs.append(_conv_init(k, c, cin, 3, 3))
        cin = c
    return {"convs": convs, "out": _conv_init(keys[-1], 1, cin, 3, 3)}


def resolution_discriminator(p: dict, wave: jax.Array,
                             res: Tuple[int, int, int]):
    spec = _magnitude_stft(wave, STFTResolution(*res))   # [B, F, T]
    x = jnp.log(spec + 1e-7)[:, None]                    # [B, 1, F, T]
    fmaps = []
    for conv in p["convs"]:
        x = jax.lax.conv_general_dilated(
            x, conv["w"], (2, 2), "SAME",
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
        x = jax.nn.leaky_relu(x + conv["b"][None, :, None, None], 0.1)
        fmaps.append(x)
    x = jax.lax.conv_general_dilated(
        x, p["out"]["w"], (1, 1), "SAME",
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return x.reshape(x.shape[0], -1), fmaps


def init_multi_resolution_discriminator(key, resolutions=RESOLUTIONS):
    keys = jax.random.split(key, len(resolutions))
    return {"resolutions": [tuple(r) for r in resolutions],
            "discs": [init_resolution_discriminator(k) for k in keys]}


def multi_resolution_discriminator(p: dict, wave: jax.Array):
    outs, fmaps = [], []
    for disc, res in zip(p["discs"], p["resolutions"]):
        o, f = resolution_discriminator(disc, wave, res)
        outs.append(o)
        fmaps.extend(f)
    return outs, fmaps


# ------------------------------------------------------- PQMF / multi-band

def pqmf_filterbank(subbands: int = 4, taps: int = 62,
                    cutoff: float = 0.142, beta: float = 9.0) -> np.ndarray:
    """Cosine-modulated near-PR analysis filterbank [subbands, taps+1]."""
    n = np.arange(taps + 1)
    # Kaiser-windowed lowpass prototype
    h_ideal = np.where(n == taps / 2, 2 * cutoff,
                       np.sin(2 * np.pi * cutoff * (n - taps / 2) + 1e-12)
                       / (np.pi * (n - taps / 2) + 1e-12))
    proto = h_ideal * np.kaiser(taps + 1, beta)
    H = np.zeros((subbands, taps + 1))
    for k in range(subbands):
        H[k] = 2 * proto * np.cos(
            (2 * k + 1) * np.pi / (2 * subbands) * (n - taps / 2)
            + (-1) ** k * np.pi / 4)
    return H.astype(np.float32)


def pqmf_analysis(wave: jax.Array, filters: jax.Array) -> jax.Array:
    """[B, T] -> [B, subbands, T/subbands]."""
    subbands, taps = filters.shape
    pad = (taps - 1) // 2
    x = jnp.pad(wave, ((0, 0), (pad, taps - 1 - pad)))
    return jax.lax.conv_general_dilated(
        x[:, None, :], filters[:, None, :], (subbands,), "VALID",
        dimension_numbers=("NCW", "OIW", "NCW"))


def init_band_discriminator(key, channels=(32, 64, 128)) -> dict:
    keys = jax.random.split(key, len(channels) + 1)
    convs, cin = [], 1
    for k, c in zip(keys[:-1], channels):
        convs.append(_conv_init(k, c, cin, 15))
        cin = c
    return {"convs": convs, "out": _conv_init(keys[-1], 1, cin, 3)}


def init_multi_band_discriminator(key, subbands: int = 4) -> dict:
    keys = jax.random.split(key, subbands)
    return {"filters": jnp.asarray(pqmf_filterbank(subbands)),
            "discs": [init_band_discriminator(k) for k in keys]}


def multi_band_discriminator(p: dict, wave: jax.Array):
    bands = pqmf_analysis(wave, p["filters"])
    outs, fmaps = [], []
    for i, disc in enumerate(p["discs"]):
        x = bands[:, i:i + 1]
        for conv in disc["convs"]:
            x = jax.lax.conv_general_dilated(
                x, conv["w"], (4,), "SAME",
                dimension_numbers=("NCW", "OIW", "NCW"))
            x = jax.nn.leaky_relu(x + conv["b"][None, :, None], 0.1)
            fmaps.append(x)
        x = jax.lax.conv_general_dilated(
            x, disc["out"]["w"], (1,), "SAME",
            dimension_numbers=("NCW", "OIW", "NCW"))
        outs.append(x.reshape(x.shape[0], -1))
    return outs, fmaps
