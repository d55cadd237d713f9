"""Observability: structured per-stage timers, counters, profiler hooks.

The reference's observability is ad-hoc DEBUG wall-clock logging around
resample / VAD / AM / LM stages and per-stream counters (reference:
streaming_server.py:349-440, 527; v1 stream.py:62-63) plus a rotating
debug log (utils.py:70-106).  Here:

  * StageTimers — lock-free-ish EWMA + histogram per named stage,
    exported as a JSON metrics snapshot (servable at /metrics.json).
  * jax_profile — context manager around jax.profiler traces for
    device-side inspection.
  * AudioArchiver — optional per-stream WAV capture (the reference's
    save_audio / audio_cache feature, streaming_server.py:213-215,
    stream.py:68-94).
"""

from __future__ import annotations

import contextlib
import json
import time
import wave as wave_mod
from collections import defaultdict
from typing import Dict, Optional

import numpy as np


class StageTimers:
    """Per-stage latency tracking with percentile snapshots."""

    def __init__(self, window: int = 512):
        self.window = window
        self._samples: Dict[str, list] = defaultdict(list)
        self._counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def track(self, stage: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.observe(stage, time.perf_counter() - t0)

    def observe(self, stage: str, seconds: float) -> None:
        buf = self._samples[stage]
        buf.append(seconds)
        if len(buf) > self.window:
            del buf[:len(buf) - self.window]
        self._counts[stage] += 1

    def increment(self, counter: str, by: int = 1) -> None:
        self._counts[counter] += by

    def snapshot(self) -> dict:
        out = {"counters": dict(self._counts), "stages": {}}
        for stage, buf in self._samples.items():
            if not buf:
                continue
            arr = np.asarray(buf)
            out["stages"][stage] = {
                "p50_ms": round(float(np.percentile(arr, 50)) * 1e3, 2),
                "p95_ms": round(float(np.percentile(arr, 95)) * 1e3, 2),
                "p99_ms": round(float(np.percentile(arr, 99)) * 1e3, 2),
                "mean_ms": round(float(arr.mean()) * 1e3, 2),
                "n": len(buf),
            }
        return out

    def to_json(self) -> str:
        return json.dumps(self.snapshot())


@contextlib.contextmanager
def jax_profile(log_dir: str):
    """Capture a JAX device profile trace around a block."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class AudioArchiver:
    """Per-stream WAV capture (reference save_audio feature)."""

    def __init__(self, directory: str, sample_rate: int = 16000):
        import os
        self.directory = directory
        self.sample_rate = sample_rate
        os.makedirs(directory, exist_ok=True)
        self._files: Dict[str, wave_mod.Wave_write] = {}

    def append(self, stream_id: str, samples: np.ndarray) -> None:
        f = self._files.get(stream_id)
        if f is None:
            import os
            f = wave_mod.open(
                os.path.join(self.directory, f"{stream_id}.wav"), "wb")
            f.setnchannels(1)
            f.setsampwidth(2)
            f.setframerate(self.sample_rate)
            self._files[stream_id] = f
        pcm = (np.clip(np.asarray(samples), -1, 1) * 32767).astype(np.int16)
        f.writeframes(pcm.tobytes())

    def close(self, stream_id: str) -> None:
        f = self._files.pop(stream_id, None)
        if f is not None:
            f.close()


def export_audacity_labels(segments, output_file: str) -> None:
    """Write Audacity label-track lines (reference export_audacity.py:1-23).
    segments: iterable of (start_s, end_s, label)."""
    with open(output_file, "w", encoding="utf-8") as f:
        for start, end, label in segments:
            f.write(f"{start}\t{end}\t{label}\n")
