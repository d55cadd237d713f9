#!/usr/bin/env python
"""Frame-VAD decision parity harness (the one native/vad/frame_vad.cc
points at).

The native GMM frame VAD re-derives the WebRTC VAD algorithm in float
(reference consumes the `webrtcvad` C extension at stream.py:54-55,
166-188); it is not bit-exact with the Q-format original, so its
decisions need pinning and — when a webrtcvad wheel is importable —
direct agreement measurement.

Three uses:

  record   python tools/vad_parity.py --record
           run the deterministic labeled corpus through the native VAD
           at all four aggressiveness modes and write the decisions to
           tests/fixtures/vad_parity_golden.json (done once; the test
           suite then pins them: tests/test_vad_parity.py)
  check    python tools/vad_parity.py
           re-run and diff against the recorded fixture
  parity   automatic when `import webrtcvad` succeeds: frame-by-frame
           agreement between the native VAD and the real wheel, per
           mode (also exposed as an import-gated test)

The corpus is synthesized in-module (seeded, dependency-free) so the
tool and the test share it byte-for-byte: voiced speech-like segments
(harmonic stacks with formant envelopes + amplitude modulation), white
and low-frequency noise at several levels, and digital silence — long
enough that the minimum-statistics noise tracker adapts (~100 frames).
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SR = 16000
FRAME_MS = 30
FRAME = SR * FRAME_MS // 1000
FIXTURE = os.path.join(os.path.dirname(__file__), "..", "tests",
                       "fixtures", "vad_parity_golden.json")


def _speech(rng: np.random.Generator, seconds: float,
            f0: float = 120.0, level: float = 0.25) -> np.ndarray:
    """Voiced speech surrogate: harmonic stack shaped by two formant
    resonances, 4 Hz syllabic amplitude modulation, slight jitter."""
    n = int(SR * seconds)
    t = np.arange(n) / SR
    f0_track = f0 * (1.0 + 0.03 * np.sin(2 * np.pi * 2.3 * t))
    phase = 2 * np.pi * np.cumsum(f0_track) / SR
    wave = np.zeros(n)
    for k in range(1, 24):
        freq = k * f0
        formant = (np.exp(-((freq - 500.0) / 350.0) ** 2)
                   + 0.7 * np.exp(-((freq - 1500.0) / 500.0) ** 2)
                   + 0.3 * np.exp(-((freq - 2500.0) / 700.0) ** 2))
        wave += formant / k * np.sin(k * phase)
    am = 0.55 + 0.45 * np.sin(2 * np.pi * 4.0 * t + rng.uniform(0, 6.28))
    wave = wave * am
    wave += 0.01 * rng.standard_normal(n)           # breathiness
    wave = wave / (np.max(np.abs(wave)) + 1e-9) * level
    return wave.astype(np.float32)


def _noise(rng: np.random.Generator, seconds: float, level: float,
           lowpass: bool = False) -> np.ndarray:
    n = int(SR * seconds)
    x = rng.standard_normal(n)
    if lowpass:                                     # crude 1-pole LP
        y = np.empty(n)
        acc = 0.0
        for i in range(n):                          # small n; fine
            acc = 0.97 * acc + 0.03 * x[i]
            y[i] = acc
        x = y / (np.std(y) + 1e-9)
    return (x * level).astype(np.float32)


def build_corpus() -> tuple:
    """Deterministic labeled frame sequence: (int16 audio, labels per
    30 ms frame: 1 speech / 0 not-speech)."""
    rng = np.random.default_rng(20260819)
    segments = [
        (_noise(rng, 1.5, 0.004), 0),         # low noise floor (adapt)
        (_speech(rng, 1.2, 120.0, 0.30), 1),
        (np.zeros(int(SR * 0.9), np.float32), 0),
        (_speech(rng, 0.9, 210.0, 0.18), 1),  # higher pitch, quieter
        (_noise(rng, 1.2, 0.010), 0),
        (_speech(rng, 1.5, 95.0, 0.40), 1),   # low pitch, loud
        (_noise(rng, 0.9, 0.006, lowpass=True), 0),
        (_speech(rng, 0.6, 150.0, 0.10), 1),  # soft speech
        (np.zeros(int(SR * 1.2), np.float32), 0),
    ]
    audio = np.concatenate([s for s, _ in segments])
    labels = np.concatenate([
        np.full(len(s) // FRAME, lab, np.int8) for s, lab in segments])
    pcm = np.clip(audio * 32767.0, -32768, 32767).astype(np.int16)
    n_frames = len(pcm) // FRAME
    return pcm[:n_frames * FRAME], labels[:n_frames]


def corpus_digest(pcm: np.ndarray) -> str:
    return hashlib.sha256(pcm.tobytes()).hexdigest()[:16]


def native_decisions(pcm: np.ndarray) -> dict:
    from asr_streaming_tpu.models.frame_vad import FrameVad

    out = {}
    n_frames = len(pcm) // FRAME
    for mode in range(4):
        vad = FrameVad(mode)
        out[str(mode)] = [
            int(vad.is_speech(
                pcm[i * FRAME:(i + 1) * FRAME].tobytes(), SR))
            for i in range(n_frames)]
    return out


def wheel_decisions(pcm: np.ndarray) -> dict:
    import webrtcvad

    out = {}
    n_frames = len(pcm) // FRAME
    for mode in range(4):
        vad = webrtcvad.Vad(mode)
        out[str(mode)] = [
            int(vad.is_speech(
                pcm[i * FRAME:(i + 1) * FRAME].tobytes(), SR))
            for i in range(n_frames)]
    return out


def label_quality(decisions: dict, labels: np.ndarray) -> dict:
    """Speech recall / silence rejection per mode, skipping the first
    50 frames (noise-tracker warmup)."""
    warm = 50
    lab = labels[warm:]
    out = {}
    for mode, dec in decisions.items():
        d = np.asarray(dec[warm:], bool)
        speech = lab == 1
        out[mode] = {
            "speech_recall": round(float(d[speech].mean()), 3),
            "silence_reject": round(float((~d[~speech]).mean()), 3),
        }
    return out


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--record", action="store_true",
                    help="write the golden fixture")
    args = ap.parse_args()

    pcm, labels = build_corpus()
    digest = corpus_digest(pcm)
    decisions = native_decisions(pcm)
    quality = label_quality(decisions, labels)
    print(f"corpus: {len(pcm) / SR:.1f} s, {len(labels)} frames, "
          f"sha {digest}")
    for mode, q in quality.items():
        print(f"  mode {mode}: speech recall {q['speech_recall']:.3f}, "
              f"silence reject {q['silence_reject']:.3f}")

    if args.record:
        os.makedirs(os.path.dirname(FIXTURE), exist_ok=True)
        with open(FIXTURE, "w") as f:
            json.dump({"sha": digest, "frame_ms": FRAME_MS,
                       "labels": labels.tolist(),
                       "decisions": decisions}, f)
        print(f"wrote {os.path.normpath(FIXTURE)}")
    elif os.path.exists(FIXTURE):
        golden = json.load(open(FIXTURE))
        assert golden["sha"] == digest, "corpus changed; re-record"
        drift = {m: int(np.sum(np.asarray(golden["decisions"][m])
                               != np.asarray(decisions[m])))
                 for m in decisions}
        print(f"fixture diff (frames changed per mode): {drift}")

    try:
        import webrtcvad  # noqa: F401
    except ImportError:
        print("webrtcvad wheel not importable: true-parity comparison "
              "skipped (decisions above are fixture-pinned instead)")
        return
    wheel = wheel_decisions(pcm)
    for mode in decisions:
        a = np.asarray(decisions[mode])
        b = np.asarray(wheel[mode])
        agree = float((a == b).mean())
        print(f"  mode {mode}: agreement with webrtcvad "
              f"{agree:.3f} ({int((a != b).sum())} frames differ)")


if __name__ == "__main__":
    main()
