"""ctypes bindings for the native host audio codec (libasrcodec.so).

The scheduler's tick-path mu-law encode over a full 512-slot staging
buffer costs ~50 ms in numpy on this host; the C++ single-pass LUT loop
(native/audio/mulaw.cc) does it in a few ms.  Auto-built on first use;
the numpy path (models/serving.py) is the bit-identical fallback.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.abspath(os.path.join(
    os.path.dirname(__file__), "..", "..", "native", "audio"))
_LIB_PATH = os.path.join(_NATIVE_DIR, "libasrcodec.so")

_lib = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True, timeout=120)
        except (subprocess.SubprocessError, FileNotFoundError):
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.asr_mulaw_encode.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int64]
    lib.asr_pcm16_encode.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int16),
        ctypes.c_int64]
    _lib = lib
    return lib


def native_available() -> bool:
    return _load() is not None


def mulaw_encode_into(x: np.ndarray, out: np.ndarray) -> bool:
    """float32 -> uint8 mu-law into a preallocated buffer.  Returns False
    when the native library is unavailable (caller falls back to numpy)."""
    lib = _load()
    if lib is None:
        return False
    assert x.dtype == np.float32 and x.flags.c_contiguous
    assert out.dtype == np.uint8 and out.flags.c_contiguous
    assert x.size == out.size
    lib.asr_mulaw_encode(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), x.size)
    return True


def pcm16_encode_into(x: np.ndarray, out: np.ndarray) -> bool:
    lib = _load()
    if lib is None:
        return False
    assert x.dtype == np.float32 and x.flags.c_contiguous
    assert out.dtype == np.int16 and out.flags.c_contiguous
    assert x.size == out.size
    lib.asr_pcm16_encode(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)), x.size)
    return True
