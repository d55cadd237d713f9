"""Utility modules: resample, checkpoint, SNR stats, observability."""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from asr_streaming_tpu.utils.resample import StreamingResampler, resample
from asr_streaming_tpu.utils.checkpoint import load_params, save_params
from asr_streaming_tpu.utils.noise import compute_stats_audio
from asr_streaming_tpu.utils.observability import (
    AudioArchiver, StageTimers, export_audacity_labels,
)


def test_resample_preserves_tone():
    sr_in, sr_out = 44100, 16000
    t = np.arange(sr_in) / sr_in
    tone = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    out = resample(tone, sr_in, sr_out)
    assert abs(len(out) - sr_out) <= 2
    # dominant frequency preserved
    spec = np.abs(np.fft.rfft(out[:sr_out]))
    assert abs(np.argmax(spec) - 440) <= 2


def test_streaming_resampler_matches_offline():
    rng = np.random.default_rng(0)
    audio = rng.standard_normal(44100).astype(np.float32) * 0.3
    sr = StreamingResampler(44100, 16000)
    parts = [sr.process(audio[i:i + 4410]) for i in range(0, 44100, 4410)]
    streamed = np.concatenate(parts)
    offline = resample(audio, 44100, 16000)
    n = min(len(streamed), len(offline))
    # interior must match closely (seam effects bounded)
    err = np.abs(streamed[:n] - offline[:n])
    assert np.percentile(err, 95) < 0.05


def test_checkpoint_roundtrip(tmp_path):
    params = {"a": {"w": jnp.arange(6.0).reshape(2, 3),
                    "b": jnp.ones(3)},
              "list": [jnp.zeros(2), jnp.full((2, 2), 7.0)]}
    path = str(tmp_path / "ckpt.npz")
    save_params(path, params)
    restored = load_params(path, like=params)
    for got, want in zip(jax.tree.leaves(restored),
                         jax.tree.leaves(params)):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    # shape mismatch must be caught
    bad = {"a": {"w": jnp.zeros((3, 3)), "b": jnp.ones(3)},
           "list": [jnp.zeros(2), jnp.zeros((2, 2))]}
    with pytest.raises(AssertionError):
        load_params(path, like=bad)


def test_compute_stats_audio_snr():
    sr = 16000
    rng = np.random.default_rng(0)
    noise = rng.standard_normal(3 * sr).astype(np.float32) * 0.01
    audio = noise.copy()
    # loud "word" from 1.0s to 2.0s
    audio[sr:2 * sr] += rng.standard_normal(sr).astype(np.float32) * 0.5
    wa = [{"word": "x", "start": 1.0, "length": 1.0, "confidence": 0.9}]
    snr, vs, vn = compute_stats_audio(audio, 0.0, wa, 0.0, 3.0, sr)
    assert snr > 20
    assert vs > vn
    # empty alignment path
    snr0, _, _ = compute_stats_audio(audio, 0.0, [], 0.0, 3.0, sr)
    assert snr0 == 0.0


def test_stage_timers_snapshot():
    t = StageTimers()
    for v in [0.01, 0.02, 0.03]:
        t.observe("stage", v)
    t.increment("count", 5)
    snap = t.snapshot()
    assert snap["counters"]["count"] == 5
    assert snap["stages"]["stage"]["p50_ms"] == pytest.approx(20, abs=1)
    json.loads(t.to_json())


def test_audio_archiver_and_audacity(tmp_path):
    arch = AudioArchiver(str(tmp_path), 16000)
    arch.append("s1", np.zeros(1600, np.float32))
    arch.append("s1", np.ones(1600, np.float32) * 0.5)
    arch.close("s1")
    import wave as wave_mod
    with wave_mod.open(str(tmp_path / "s1.wav")) as f:
        assert f.getnframes() == 3200
        assert f.getframerate() == 16000

    labels = tmp_path / "labels.txt"
    export_audacity_labels([(0.0, 1.5, "hello"), (2.0, 3.0, "world")],
                           str(labels))
    lines = labels.read_text().strip().split("\n")
    assert lines[0] == "0.0\t1.5\thello"


def test_orbax_checkpoint_roundtrip(tmp_path):
    from asr_streaming_tpu.utils.checkpoint import (
        load_params_orbax, save_params_orbax,
    )
    params = {"enc": {"w": jnp.arange(12.0).reshape(3, 4),
                      "b": jnp.ones(4)}}
    d = str(tmp_path / "orbax_ckpt")
    save_params_orbax(d, params)
    restored = load_params_orbax(d, params)
    for got, want in zip(jax.tree.leaves(restored),
                         jax.tree.leaves(params)):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_compile_cache_disabled_on_cpu_backend(tmp_path):
    """XLA:CPU AOT cache entries bake in host CPU features and SIGILL on
    feature-mismatched hosts (observed live in the CPU-pinned
    device-worker server parent) — on a cpu backend the persistent cache
    must stay OFF."""
    import jax

    from asr_streaming_tpu.utils import compile_cache

    target = tmp_path / "xla"
    compile_cache.enable_compile_cache(str(target))
    assert jax.config.jax_compilation_cache_dir in (None, "")
    assert not target.exists()          # not even created
    assert not compile_cache._enabled   # future TPU processes unaffected
