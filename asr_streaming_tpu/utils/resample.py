"""Input-rate resampling (host side).

The reference shells out to ffmpeg via pydub per message
(reference: streaming_decoder/streaming_server.py:348-360); here a
polyphase resampler (scipy.signal.resample_poly) with a small stateless
wrapper.  For streaming use the chunk edges get a continuity buffer so
per-message resampling doesn't click at boundaries.
"""

from __future__ import annotations

import math
from fractions import Fraction

import numpy as np

try:
    from scipy.signal import resample_poly
    _HAVE_SCIPY = True
except ImportError:  # pragma: no cover
    _HAVE_SCIPY = False


def resample(wave: np.ndarray, in_rate: int, out_rate: int) -> np.ndarray:
    """Resample float32 audio [T] from in_rate to out_rate."""
    if in_rate == out_rate:
        return np.asarray(wave, np.float32)
    frac = Fraction(out_rate, in_rate).limit_denominator(1000)
    if _HAVE_SCIPY:
        out = resample_poly(np.asarray(wave, np.float64),
                            frac.numerator, frac.denominator)
        return out.astype(np.float32)
    # linear-interpolation fallback
    n_out = int(round(len(wave) * out_rate / in_rate))
    x_out = np.linspace(0, len(wave) - 1, n_out)
    return np.interp(x_out, np.arange(len(wave)),
                     np.asarray(wave, np.float64)).astype(np.float32)


class StreamingResampler:
    """Per-connection resampler keeping edge context across packets."""

    def __init__(self, in_rate: int, out_rate: int, context: int = 64):
        self.in_rate = in_rate
        self.out_rate = out_rate
        self.context = context
        self._tail = np.zeros(0, np.float32)

    def process(self, samples: np.ndarray) -> np.ndarray:
        if self.in_rate == self.out_rate:
            return np.asarray(samples, np.float32)
        joined = np.concatenate([self._tail, np.asarray(samples, np.float32)])
        out = resample(joined, self.in_rate, self.out_rate)
        # drop the part corresponding to the carried tail
        drop = int(round(len(self._tail) * self.out_rate / self.in_rate))
        self._tail = joined[-self.context:] if len(joined) >= self.context \
            else joined
        return out[drop:]
