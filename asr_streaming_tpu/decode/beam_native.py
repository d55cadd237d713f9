"""ctypes bindings for the C++ lexicon+LM beam decoder.

Loads native/beamsearch/libasrbeam.so (built by `make -C native/beamsearch`;
auto-built on first use if a compiler is available).  API mirrors the
Python LexiconBeamDecoder; NativeBeamDecoder is the production path for
final-segment rescoring (the reference uses flashlight-text C++ the same
way, recognition.py:236-245)."""

from __future__ import annotations

import ctypes
import json
import os
import subprocess
from typing import Dict, List, Optional, Sequence

import numpy as np

from asr_streaming_tpu.decode.greedy import BLANK_ID, SILENCE_ID, FRAME_SECONDS

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native",
                           "beamsearch")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libasrbeam.so"))

_lib = None


def _load_library() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", os.path.abspath(_NATIVE_DIR)],
                           check=True, capture_output=True, timeout=120)
        except (subprocess.SubprocessError, FileNotFoundError):
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.asr_decoder_create.restype = ctypes.c_void_p
    lib.asr_decoder_create.argtypes = [
        ctypes.c_char_p, ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
        ctypes.c_float, ctypes.c_int, ctypes.c_int, ctypes.c_float,
        ctypes.c_float, ctypes.c_int, ctypes.c_int, ctypes.c_float]
    lib.asr_decoder_decode.restype = ctypes.c_int
    lib.asr_decoder_decode.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_char_p, ctypes.c_int]
    lib.asr_decoder_destroy.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def native_available() -> bool:
    return _load_library() is not None


class NativeBeamDecoder:
    def __init__(self, vocab: Sequence[str], lexicon_path: str,
                 lm_path: Optional[str] = None, lm_weight: float = 1.0,
                 beam_size: int = 50, beam_size_token: int = 5,
                 beam_threshold: float = 50.0, word_score: float = 0.5,
                 blank: int = BLANK_ID, silence: int = SILENCE_ID,
                 frame_seconds: float = FRAME_SECONDS):
        lib = _load_library()
        if lib is None:
            raise RuntimeError("libasrbeam.so unavailable")
        self._lib = lib
        if lm_path:
            # the C++ LM loader reads text ARPA and KenLM PROBING; a
            # TRIE-family asset is converted to its probing twin once
            # and cached (decode/kenlm_trie.py)
            from asr_streaming_tpu.decode.kenlm_trie import ensure_native_lm
            lm_path = ensure_native_lm(lm_path)
        self.vocab = list(vocab)
        arr = (ctypes.c_char_p * len(self.vocab))(
            *[t.encode("utf-8") for t in self.vocab])
        self._handle = lib.asr_decoder_create(
            lexicon_path.encode(), (lm_path or "").encode(), arr,
            len(self.vocab), lm_weight, beam_size, beam_size_token,
            beam_threshold, word_score, blank, silence, frame_seconds)
        if not self._handle:
            raise RuntimeError(
                f"decoder init failed (lexicon={lexicon_path}, lm={lm_path})")

    def decode_full(self, emission: np.ndarray, offset: int = 0) -> Dict:
        """emission: [T, V] float32 log-probs ->
        {transcript, score, alignment} (alignment in reference format)."""
        em = np.ascontiguousarray(emission, dtype=np.float32)
        T, V = em.shape
        cap = 1 << 20
        buf = ctypes.create_string_buffer(cap)
        n = self._lib.asr_decoder_decode(
            self._handle, em.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            T, V, offset, buf, cap)
        if n < 0:
            raise RuntimeError("output buffer too small")
        return json.loads(buf.value.decode("utf-8"))

    def decode(self, emission: np.ndarray, offset: int = 0) -> List[Dict]:
        return self.decode_full(emission, offset)["alignment"]

    def __del__(self):
        if getattr(self, "_handle", None) and self._lib:
            self._lib.asr_decoder_destroy(self._handle)
            self._handle = None


def make_native_rescorer(vocab: Sequence[str], lexicon_path: str,
                         lm_path: Optional[str] = None, **kwargs):
    """FinalSegment -> alignment callable (native), or None if the shared
    library can't be built/loaded."""
    if not native_available():
        return None
    decoder = NativeBeamDecoder(vocab, lexicon_path, lm_path, **kwargs)

    def rescore(segment) -> List[Dict]:
        emission = segment.emission[:segment.length]
        return decoder.decode(emission, offset=segment.offset)

    return rescore
