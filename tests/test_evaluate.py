"""WER/CER evaluation tool (tools/evaluate.py)."""

import json

import pytest

from asr_streaming_tpu.tools.evaluate import (
    char_error_rate, edit_stats, main, normalize_text, word_error_rate,
)


def test_edit_stats_known_cases():
    st = edit_stats("a b c".split(), "a b c".split())
    assert st.errors == 0 and st.ref_len == 3 and st.rate == 0.0

    st = edit_stats("a b c".split(), "a x c".split())
    assert (st.substitutions, st.insertions, st.deletions) == (1, 0, 0)

    st = edit_stats("a b c".split(), "a b".split())
    assert (st.substitutions, st.insertions, st.deletions) == (0, 0, 1)

    st = edit_stats("a b".split(), "a x b y".split())
    assert (st.substitutions, st.insertions, st.deletions) == (0, 2, 0)
    assert st.rate == 1.0          # 2 errors / 2 ref words

    st = edit_stats([], "a b".split())
    assert st.insertions == 2 and st.ref_len == 0
    assert st.rate == 2.0          # clipped denominator of 1


def test_wer_corpus_accumulation():
    refs = ["xin chào các bạn", "tôi là ai"]
    hyps = ["xin chào bạn", "tôi là ai"]
    st = word_error_rate(refs, hyps)
    assert st.ref_len == 7
    assert st.errors == 1 or st.errors == 2   # deletion (+maybe sub)
    assert 0 < st.rate < 0.5


def test_cer_ignores_spaces():
    st = char_error_rate(["ab cd"], ["abcd"])
    assert st.errors == 0


def test_normalize_text():
    assert normalize_text("Xin CHÀO,  bạn!") == "xin chào bạn"


def test_cli_with_hyp_manifest(tmp_path, capsys):
    ref = tmp_path / "ref.jsonl"
    hyp = tmp_path / "hyp.jsonl"
    ref.write_text("\n".join(
        json.dumps({"audio_filepath": "x.wav", "text": t})
        for t in ["một hai ba", "bốn năm"]))
    hyp.write_text("\n".join(
        json.dumps({"text": t}) for t in ["một hai ba", "bốn sáu"]))
    main(["--manifest", str(ref), "--hyp-manifest", str(hyp)])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["utterances"] == 2
    assert out["ref_words"] == 5
    assert out["substitutions"] == 1
    assert out["wer"] == 0.2


def test_transcribe_segment_mode(tmp_path, capsys, monkeypatch):
    """Long-audio --segment mode: VAD timestamps -> groups -> per-group
    decode, with a tiny model."""
    import sys
    import wave as wave_mod
    import numpy as np

    rng = np.random.default_rng(0)
    p = tmp_path / "long.wav"
    with wave_mod.open(str(p), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes((rng.standard_normal(16000 * 6) * 8000
                       ).astype(np.int16).tobytes())

    from asr_streaming_tpu.models.api import ASRModel
    from asr_streaming_tpu.models.asr import ASRConfig
    orig_init = ASRModel.__init__

    def tiny_init(self, cfg=None, **kw):
        orig_init(self, cfg=ASRConfig.tiny(), use_corpus=False, **{
            k: v for k, v in kw.items() if k not in ("use_corpus",)})

    monkeypatch.setattr(ASRModel, "__init__", tiny_init)
    monkeypatch.setattr(sys, "argv",
                        ["transcribe", str(p), "--segment"])
    from asr_streaming_tpu.tools.transcribe import main as tmain
    tmain()
    out = capsys.readouterr().out
    assert out.strip()          # printed either groups or the no-speech line
