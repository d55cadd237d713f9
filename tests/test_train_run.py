"""End-to-end training driver: manifest -> steps -> checkpoint -> serve."""

import json
import wave as wave_mod

import numpy as np
import pytest

from asr_streaming_tpu.train.run import main as train_main


def _write_wav(path, seconds=1.0, seed=0):
    rng = np.random.default_rng(seed)
    pcm = (rng.standard_normal(int(16000 * seconds)) * 3000).astype(np.int16)
    with wave_mod.open(str(path), "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(16000)
        f.writeframes(pcm.tobytes())


@pytest.fixture(scope="module")
def manifest(tmp_path_factory):
    d = tmp_path_factory.mktemp("data")
    entries = []
    for i in range(4):
        p = d / f"utt{i}.wav"
        _write_wav(p, seconds=1.0 + 0.3 * i, seed=i)
        entries.append({"audio_filepath": str(p),
                        "text": "a b a", "duration": 1.0 + 0.3 * i})
    m = d / "train.jsonl"
    m.write_text("\n".join(json.dumps(e) for e in entries))
    return str(m)


def test_train_driver_end_to_end(manifest, tmp_path):
    ckpt = tmp_path / "ckpt.npz"
    loss = train_main([
        "--manifest", manifest, "--steps", "3", "--batch-size", "2",
        "--tiny", "--save", str(ckpt), "--save-every", "100",
        "--buckets-seconds", "2", "4",
        "--token-bucket", "16", "--warmup-steps", "10"])
    assert np.isfinite(loss)
    assert ckpt.exists()

    # the checkpoint round-trips through the server-side loader
    import jax
    from asr_streaming_tpu.models.asr import ASRConfig, init_asr_params
    from asr_streaming_tpu.text.vocab import placeholder_vocab
    from asr_streaming_tpu.utils.checkpoint import load_params

    vocab_size = None
    from asr_streaming_tpu.text.corpus import load_corpus
    vocab, _ = load_corpus()
    vocab_size = len(vocab) if vocab else 24
    like = init_asr_params(jax.random.PRNGKey(0),
                           ASRConfig.tiny(vocab_size=vocab_size))
    loaded = load_params(str(ckpt), like=like)
    assert set(loaded) == set(like)


def test_train_driver_resume(manifest, tmp_path):
    ckpt = tmp_path / "ckpt.npz"
    train_main(["--manifest", manifest, "--steps", "2", "--batch-size", "2",
                "--tiny", "--save", str(ckpt),
                "--buckets-seconds", "2", "4",
                "--token-bucket", "16", "--warmup-steps", "10"])
    loss = train_main([
        "--manifest", manifest, "--steps", "2", "--batch-size", "2",
        "--tiny", "--save", str(ckpt), "--resume", str(ckpt),
        "--buckets-seconds", "2", "4",
        "--token-bucket", "16", "--warmup-steps", "10"])
    assert np.isfinite(loss)
