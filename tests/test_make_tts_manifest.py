"""TTS-manifest builder (tools/make_tts_manifest.py): duration tiling,
tokenizer word mapping, and the manifest pipeline with a stub aligner."""

import json
import wave as wave_mod
from types import SimpleNamespace

import numpy as np

from asr_streaming_tpu.tools.make_tts_manifest import (
    main, tokens_and_words, word_durations_from_alignment,
)


def _seg(start, end):
    return SimpleNamespace(start=start, end=end)


def test_durations_tile_audio_exactly():
    segs = [_seg(0.2, 0.5), _seg(0.7, 1.1), _seg(1.3, 1.8)]
    durs = word_durations_from_alignment(segs, audio_seconds=2.0,
                                         sample_rate=16000, hop_length=160)
    assert len(durs) == 3
    assert sum(durs) == int(2.0 * 16000) // 160    # exact tiling
    assert all(d >= 1 for d in durs)
    # word 1's share covers [0.6, 1.2] (gap midpoints) ~ 60 frames
    assert abs(durs[1] - 60) <= 1


def test_durations_single_word_and_empty():
    durs = word_durations_from_alignment([_seg(0.1, 0.4)], 1.0, 16000, 160)
    assert durs == [100]
    assert word_durations_from_alignment([], 1.0, 16000, 160) == []


def test_tokens_and_words_word_mapping():
    vocab = ["-", "|", "xin", "chao", "cac", "ban"]
    lexicon = {w: [w] for w in vocab[2:]}
    token_ids, word_idxs = tokens_and_words("xin chao ban", vocab, lexicon)
    assert len(token_ids) == len(word_idxs) == 3
    assert word_idxs == [0, 1, 2]
    assert [vocab[t] for t in token_ids] == ["xin", "chao", "ban"]


def test_manifest_pipeline_with_stub_model(tmp_path, monkeypatch):
    wav = tmp_path / "a.wav"
    rng = np.random.default_rng(0)
    with wave_mod.open(str(wav), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes((rng.standard_normal(16000) * 3000
                       ).astype(np.int16).tobytes())
    src = tmp_path / "asr.jsonl"
    src.write_text(json.dumps({"audio_filepath": str(wav),
                               "text": "xin chao"}) + "\n")

    vocab = ["-", "|", "xin", "chao"]
    lexicon = {"xin": ["xin"], "chao": ["chao"]}

    class StubModel:
        def __init__(self, **_kw):
            self.cfg = SimpleNamespace(
                audio=SimpleNamespace(sample_rate=16000))
            self.vocab = vocab
            self.lexicon = lexicon

        def force_alignment(self, wave_arr, text):
            return [], [_seg(0.1, 0.4), _seg(0.5, 0.9)]

    import asr_streaming_tpu.models.api as api_mod
    monkeypatch.setattr(api_mod, "ASRModel", StubModel)

    out = tmp_path / "tts.jsonl"
    main(["--manifest", str(src), "--out", str(out)])
    entries = [json.loads(l) for l in out.read_text().splitlines()]
    assert len(entries) == 1
    e = entries[0]
    assert e["word_idxs"] == [0, 1]
    assert len(e["word_durations"]) == 2
    assert sum(e["word_durations"]) == 16000 // 160
    # the output feeds SpeechSynthesisDataset directly
    from asr_streaming_tpu.train.data import SpeechSynthesisDataset
    ds = SpeechSynthesisDataset(str(out))
    ex = ds[0]
    assert ex.tokens.shape == (2,) and ex.word_durs.shape == (2,)


def test_durations_degenerate_audio_returns_empty():
    """More words than frames: the sum==total contract is unsatisfiable;
    the function signals skip instead of writing broken durations."""
    segs = [_seg(i * 0.01, i * 0.01 + 0.005) for i in range(12)]
    durs = word_durations_from_alignment(segs, audio_seconds=0.1,
                                         sample_rate=16000, hop_length=160)
    assert durs == []
