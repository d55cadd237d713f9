"""Native frame VAD: discrimination, API validation, hangover."""

import numpy as np
import pytest

from asr_streaming_tpu.models.frame_vad import FrameVad, native_available

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="libframevad.so unavailable")


def tone(freq, seconds, sr=16000, level=0.3):
    t = np.arange(int(sr * seconds)) / sr
    return (level * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def frames(audio, sr=16000, ms=30):
    n = int(sr * ms / 1000)
    pcm = (np.clip(audio, -1, 1) * 32767).astype(np.int16)
    return [pcm[i:i + n].tobytes() for i in range(0, len(pcm) - n + 1, n)]


def test_silence_is_not_speech():
    vad = FrameVad(2)
    for f in frames(np.zeros(16000, np.float32)):
        assert not vad.is_speech(f, 16000)


def test_speech_band_tone_detected_after_noise_floor():
    vad = FrameVad(1)
    # quiet noise first (lets the floor settle), then a loud 300 Hz tone
    rng = np.random.default_rng(0)
    audio = np.concatenate([
        rng.standard_normal(16000).astype(np.float32) * 0.001,
        tone(300, 1.0, level=0.4),
    ])
    decisions = [vad.is_speech(f, 16000) for f in frames(audio)]
    # the tone section (second half) should be flagged
    tail = decisions[len(decisions) // 2 + 2:]
    assert sum(tail) > len(tail) * 0.8
    # the quiet-noise section should be mostly silent
    head = decisions[2:len(decisions) // 2 - 2]
    assert sum(head) < len(head) * 0.3


def test_invalid_inputs_raise():
    vad = FrameVad(2)
    with pytest.raises(ValueError):
        vad.is_speech(b"\x00" * 123, 16000)      # bad frame length
    with pytest.raises(ValueError):
        vad.is_speech(b"\x00" * 960, 44100)      # bad rate
    with pytest.raises(ValueError):
        FrameVad(7)                              # bad aggressiveness


def test_contains_speech_early_exit():
    vad = FrameVad(1)
    rng = np.random.default_rng(1)
    quiet = rng.standard_normal(16000).astype(np.float32) * 0.0005
    assert not vad.contains_speech(quiet)
    loud = np.concatenate([quiet, tone(500, 0.5, level=0.5)])
    vad2 = FrameVad(1)
    assert vad2.contains_speech(loud)


def test_aggressiveness_monotonic():
    """Stricter modes flag no more frames than permissive ones on the
    same audio (the WebRTC mode semantics: 0=quality .. 3=very
    aggressive)."""
    rng = np.random.default_rng(2)
    # speech-shaped: 200 Hz carrier with 4 Hz syllabic AM + noise
    t = np.arange(32000) / 16000
    am = 0.5 * (1 + np.sin(2 * np.pi * 4 * t))
    audio = (0.3 * am * np.sin(2 * np.pi * 220 * t)
             + 0.01 * rng.standard_normal(len(t))).astype(np.float32)
    counts = []
    for mode in range(4):
        vad = FrameVad(mode)
        counts.append(sum(vad.is_speech(f, 16000) for f in frames(audio)))
    assert counts[0] >= counts[1] >= counts[3]
    assert counts[0] > 0


def test_noise_adaptation_suppresses_steady_noise():
    """A steady moderate noise floor is eventually classified as noise
    (minimum-statistics adaptation), while a much louder onset on top of
    it is still caught."""
    rng = np.random.default_rng(3)
    noise = (0.02 * rng.standard_normal(16000 * 4)).astype(np.float32)
    vad = FrameVad(2)
    decisions = [vad.is_speech(f, 16000) for f in frames(noise)]
    tail = decisions[len(decisions) // 2:]
    assert sum(tail) < len(tail) * 0.3, "steady noise should adapt away"
    # a loud tone burst after adaptation is still detected
    t = np.arange(8000) / 16000
    burst = (0.5 * np.sin(2 * np.pi * 300 * t)).astype(np.float32)
    dec_burst = [vad.is_speech(f, 16000) for f in frames(burst)]
    assert sum(dec_burst) > len(dec_burst) * 0.8


def test_8k_and_32k_rates():
    """All webrtcvad-legal rates are accepted and detect the same tone."""
    for sr in (8000, 16000, 32000, 48000):
        vad = FrameVad(1)
        t = np.arange(sr) / sr
        audio = (0.4 * np.sin(2 * np.pi * 300 * t)).astype(np.float32)
        dec = [vad.is_speech(f, sr) for f in frames(audio, sr=sr)]
        assert sum(dec) > len(dec) * 0.5, f"tone missed at {sr} Hz"


def test_hangover_extends_speech():
    """Decisions stay speechy for a few frames after the tone stops
    (overhang), then drop."""
    t = np.arange(16000) / 16000
    audio = np.concatenate([
        (0.4 * np.sin(2 * np.pi * 300 * t)).astype(np.float32),
        np.zeros(16000, np.float32),
    ])
    vad = FrameVad(0)
    dec = [vad.is_speech(f, 16000) for f in frames(audio)]
    n_tone = 16000 // 480
    # hangover: at least one frame after the tone ends is still flagged
    assert any(dec[n_tone:n_tone + 6])
    # but far into the silence everything is off
    assert not any(dec[n_tone + 8:])


def test_webrtcvad_decision_parity():
    """Deploy-time harness: decision agreement vs the real webrtcvad
    wheel (the reference's dependency, stream.py:54-55).  Runs only when
    webrtcvad is installed; asserts >=80% frame-decision agreement on
    speech-shaped audio across modes."""
    webrtcvad = pytest.importorskip("webrtcvad")
    rng = np.random.default_rng(4)
    t = np.arange(16000 * 4) / 16000
    am = 0.5 * (1 + np.sin(2 * np.pi * 3 * t))
    audio = np.concatenate([
        0.01 * rng.standard_normal(32000),
        (0.3 * am[:32000] * np.sin(2 * np.pi * 220 * t[:32000])
         + 0.005 * rng.standard_normal(32000)),
    ]).astype(np.float32)
    for mode in (1, 2, 3):
        ours, theirs = FrameVad(mode), webrtcvad.Vad(mode)
        agree = total = 0
        for f in frames(audio):
            agree += (ours.is_speech(f, 16000)
                      == theirs.is_speech(f, 16000))
            total += 1
        assert agree / total >= 0.8, f"mode {mode}: {agree}/{total}"
