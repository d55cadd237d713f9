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
