"""Augmentation, datasets, discriminators, segmenter."""

import json
import wave as wave_mod

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from asr_streaming_tpu.train.augment import (
    add_background_noise, apply_impulse_response, overlap_speech,
    spec_augment,
)
from asr_streaming_tpu.train.data import (
    SpeechRecognitionDataset, bucket_batches, collate_asr, load_manifest,
    read_wav,
)
from asr_streaming_tpu.models.discriminators import (
    init_multi_band_discriminator, init_multi_period_discriminator,
    init_multi_resolution_discriminator, multi_band_discriminator,
    multi_period_discriminator, multi_resolution_discriminator,
    pqmf_filterbank, pqmf_analysis,
)
from asr_streaming_tpu.models.segmenter import (
    group_segments, speech_timestamps_from_probs,
)


def test_spec_augment_masks_and_shape():
    feats = jnp.ones((2, 100, 40))
    out = spec_augment(jax.random.PRNGKey(0), feats, time_masks=5,
                       time_width=0.1, freq_masks=2, freq_width=8)
    assert out.shape == feats.shape
    o = np.asarray(out)
    assert (o == 0).any()               # something masked
    assert (o == 1).any()               # not everything masked


def test_waveform_augmentations_preserve_shape_and_level():
    rng = np.random.default_rng(0)
    speech = rng.standard_normal(16000).astype(np.float32) * 0.2
    noise = rng.standard_normal(8000).astype(np.float32) * 0.1
    noisy = add_background_noise(rng, speech, noise, 10, 20)
    assert noisy.shape == speech.shape
    # norm preserved (reference scales back to the speech norm)
    assert np.linalg.norm(noisy) == pytest.approx(
        np.linalg.norm(speech), rel=1e-3)

    mixed = overlap_speech(rng, speech, noise)
    assert mixed.shape == speech.shape

    rir = np.zeros(800, np.float32)
    rir[100] = 1.0
    rir[200] = 0.3
    rev = apply_impulse_response(speech, rir)
    assert rev.shape == speech.shape
    assert np.abs(rev).max() <= 1.0


def _write_wav(path, wave, sr=16000):
    with wave_mod.open(str(path), "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(sr)
        f.writeframes((np.clip(wave, -1, 1) * 32767).astype(
            np.int16).tobytes())


def test_dataset_and_bucketing(tmp_path):
    vocab = ["-", "|", "a", "b"]
    lexicon = {"a": ["a", "|"], "b": ["b", "|"], "ab": ["a", "b", "|"]}
    rng = np.random.default_rng(1)
    entries = []
    for i, secs in enumerate([1.0, 2.0, 6.0]):
        p = tmp_path / f"u{i}.wav"
        _write_wav(p, rng.standard_normal(int(16000 * secs)) * 0.1)
        entries.append({"audio_filepath": str(p), "text": "a ab b",
                        "duration": secs})
    manifest = tmp_path / "train.jsonl"
    manifest.write_text("\n".join(json.dumps(e) for e in entries))

    ds = SpeechRecognitionDataset(str(manifest), vocab, lexicon)
    assert len(ds) == 3
    ex = ds[0]
    assert ex.tokens.tolist() == [2, 1, 2, 3, 1, 3]   # a | a b | b

    batches = list(bucket_batches(ds, batch_size=2,
                                  buckets_seconds=(4, 8),
                                  token_bucket=16))
    assert len(batches) >= 1
    for b in batches:
        # fixed bucket shapes
        assert b.waves.shape[1] in (4 * 16000, 8 * 16000)
        assert b.tokens.shape[1] == 16


def test_discriminators_shapes():
    rng = np.random.default_rng(2)
    wave = jnp.asarray(rng.standard_normal((2, 4000)), dtype=jnp.float32)
    mpd = init_multi_period_discriminator(jax.random.PRNGKey(0),
                                          periods=(2, 3))
    outs, fmaps = multi_period_discriminator(mpd, wave)
    assert len(outs) == 2 and all(np.isfinite(np.asarray(o)).all()
                                  for o in outs)
    mrd = init_multi_resolution_discriminator(
        jax.random.PRNGKey(1), resolutions=((512, 240, 50),))
    outs, fmaps = multi_resolution_discriminator(mrd, wave)
    assert len(outs) == 1
    mbd = init_multi_band_discriminator(jax.random.PRNGKey(2), subbands=4)
    outs, fmaps = multi_band_discriminator(mbd, wave)
    assert len(outs) == 4


def test_pqmf_bands_split_frequencies():
    """Low-frequency tone lands in band 0; high tone in the top band."""
    filters = jnp.asarray(pqmf_filterbank(4))
    t = np.arange(8000) / 16000.0
    low = jnp.asarray(np.sin(2 * np.pi * 500 * t,
                             dtype=np.float64).astype(np.float32))[None]
    high = jnp.asarray(np.sin(2 * np.pi * 7000 * t,
                              dtype=np.float64).astype(np.float32))[None]
    lb = np.asarray(pqmf_analysis(low, filters))[0]
    hb = np.asarray(pqmf_analysis(high, filters))[0]
    assert np.argmax([np.mean(b ** 2) for b in lb]) == 0
    assert np.argmax([np.mean(b ** 2) for b in hb]) == 3


def test_speech_timestamps_and_grouping():
    # 100 windows of 512 samples; speech in windows 10-40 and 60-90
    probs = np.zeros(100, np.float32)
    probs[10:40] = 0.9
    probs[60:90] = 0.9
    ts = speech_timestamps_from_probs(probs)
    assert len(ts) == 2
    assert ts[0]["start"] < ts[0]["end"] <= ts[1]["start"]
    # grouping merges both (~1 s apart) into one 3-15 s chunk if possible
    groups = group_segments(ts, min_seconds=0.5, max_seconds=15.0)
    assert len(groups) == 1
    assert groups[0]["end"] - groups[0]["start"] >= 0.5
