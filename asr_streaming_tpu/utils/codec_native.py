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
    try:
        lib.asr_mulaw_gather_encode.argtypes = [
            ctypes.POINTER(ctypes.c_uint64), ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64]
        lib.asr_pcm16_gather_encode.argtypes = [
            ctypes.POINTER(ctypes.c_uint64), ctypes.POINTER(ctypes.c_int16),
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64]
    except AttributeError:      # stale .so from before the fused entry
        lib._no_gather = True
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


def gather_available() -> bool:
    lib = _load()
    return lib is not None and not getattr(lib, "_no_gather", False)


def gather_encode_into(views, slots: np.ndarray, out: np.ndarray,
                       mulaw: bool) -> bool:
    """Fused per-stream gather + encode (single C++ pass).

    Row i of the call encodes ``views[i]`` (a stream's new-segment
    float32 view, zero-copy) straight into ``out[slots[i]]``.  Callers
    must check :func:`gather_available` FIRST and only then pop the
    stream views — the pops are destructive, so there is no in-call
    fallback.  Rows of ``out`` not named in ``slots`` are untouched.
    """
    lib = _load()
    if lib is None or getattr(lib, "_no_gather", False):
        return False
    rows = len(views)
    if rows == 0:
        return True
    cols = out.shape[1]
    assert out.flags.c_contiguous and slots.dtype == np.int32
    ptrs = np.empty(rows, np.uint64)
    for i, v in enumerate(views):
        # contiguity holds by construction (1-D slice of a contiguous
        # ring buffer); assert cheaply in case a caller changes that
        assert v.dtype == np.float32 and v.flags.c_contiguous \
            and v.size == cols
        ptrs[i] = v.ctypes.data
    p_ptrs = ptrs.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64))
    p_slots = slots.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
    if mulaw:
        assert out.dtype == np.uint8
        lib.asr_mulaw_gather_encode(
            p_ptrs, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            p_slots, rows, cols, out.strides[0])
    else:
        assert out.dtype == np.int16
        lib.asr_pcm16_gather_encode(
            p_ptrs, out.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
            p_slots, rows, cols, out.strides[0] // 2)
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
