"""High-level ASRModel API (tiny config)."""

import numpy as np

from asr_streaming_tpu.models.api import ASRModel
from asr_streaming_tpu.models.asr import ASRConfig

VOCAB = ["-", "|"] + [chr(ord("a") + i) for i in range(19)]


def test_api_stream_and_transcribe_agree():
    model = ASRModel(cfg=ASRConfig.tiny(vocab_size=len(VOCAB)), vocab=VOCAB)
    rng = np.random.default_rng(0)
    wave = (rng.standard_normal(16000 * 2) * 0.3).astype(np.float32)

    # offline
    text = model.transcribe(wave)
    assert isinstance(text, str)

    # streaming over the same framing yields the same emissions
    from asr_streaming_tpu.models.asr import frame_waveform
    chunks = frame_waveform(wave, model.cfg.audio)
    state = model.init_state(1)
    parts = []
    for ch in chunks:
        logp, state = model.stream(ch[None], state)
        parts.append(logp[0])
    streaming = np.concatenate(parts, axis=0)
    offline = model.emissions(wave)
    np.testing.assert_allclose(streaming, offline, rtol=2e-5, atol=2e-5)


def test_api_force_alignment():
    model = ASRModel(cfg=ASRConfig.tiny(vocab_size=len(VOCAB)), vocab=VOCAB,
                     lexicon={"ab": ["a", "b", "|"]})
    rng = np.random.default_rng(1)
    wave = (rng.standard_normal(16000) * 0.3).astype(np.float32)
    tokens, words = model.force_alignment(wave, "ab")
    # '|' only separates words (reference tokenize); single word = no '|'
    assert [t.label for t in tokens] == ["a", "b"]
    assert len(words) == 1 and words[0].label == "ab"
    assert 0 <= words[0].start <= words[0].end <= 1.0 + 1e-6
