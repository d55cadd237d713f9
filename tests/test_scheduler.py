"""Scheduler + stream state machine end-to-end (tiny model, energy VAD)."""

import numpy as np
import jax
import pytest

from asr_streaming_tpu.models.asr import ASRConfig
from asr_streaming_tpu.models.serving import (
    ServingConfig, init_serving_params,
)
from asr_streaming_tpu.streaming.scheduler import Scheduler

VOCAB = ["-", "|"] + [chr(ord("a") + i) for i in range(19)]


def make_scheduler(max_slots=4, seed=0, rules=None):
    cfg = ServingConfig(asr=ASRConfig.tiny(vocab_size=len(VOCAB)),
                        use_silero=False)
    params = init_serving_params(jax.random.PRNGKey(seed), cfg)
    return Scheduler(params, cfg, VOCAB, max_slots=max_slots, rules=rules)


# A randomly-initialized model emits tokens even on silent audio (a real
# model emits blanks), so trailing-silence rules never fire in these tests;
# drive segment finalization with a short hard-flush rule instead
# (same shape as the reference's 40 s rule4, asr-online.yaml:103-107).
FLUSH_RULES = {"flush": __import__(
    "asr_streaming_tpu.streaming.endpoint", fromlist=["EndpointRule"]
).EndpointRule(must_contain_nonsilence=True, min_trailing_silence=0.0,
               min_utterance_length=1.9, max_relative_cost=float("inf"))}


def speechy_audio(seconds, seed=0, level=0.3):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal(int(16000 * seconds)) * level
            ).astype(np.float32)


def silence(seconds):
    return np.zeros(int(16000 * seconds), np.float32)


def test_silence_only_never_decodes():
    sched = make_scheduler()
    s = sched.admit("s0")
    s.accept_waveform(silence(3.0))
    events = sched.drain()
    assert events == []
    assert s.chunk_processed_total > 0          # chunks were consumed
    assert s.emission_length == 0               # but none decoded
    assert s.trailing_blank_duration > 0


def test_speech_then_silence_produces_final():
    sched = make_scheduler(rules=FLUSH_RULES)
    s = sched.admit("s0")
    s.accept_waveform(speechy_audio(2.0))
    s.accept_waveform(silence(2.0))
    events = sched.drain()
    finals = [e for e in events if e.is_final]
    assert len(finals) >= 1
    seg = finals[0].segment
    assert seg.length > 0
    assert seg.emission.shape == (seg.length, len(VOCAB))
    # after the final, the utterance counters reset
    assert s.segment >= 1
    assert s.transcript_internal == ""
    assert s.emission_length == 0


def test_batched_equals_solo():
    """The whole stack must be batch-invariant: a stream decoded alongside
    others yields exactly the same events as alone."""
    audio = [speechy_audio(1.5, seed=i) for i in range(3)]

    solo_events = []
    for i in range(3):
        sched = make_scheduler(max_slots=4, seed=7)
        s = sched.admit(f"solo{i}")
        s.accept_waveform(audio[i])
        s.accept_waveform(silence(1.5))
        solo_events.append([(e.kind, e.text) for e in sched.drain()])

    sched = make_scheduler(max_slots=4, seed=7)
    streams = [sched.admit(f"b{i}") for i in range(3)]
    for s, a in zip(streams, audio):
        s.accept_waveform(a)
        s.accept_waveform(silence(1.5))
    batch_events = {s.id: [] for s in streams}
    for e in sched.drain():
        batch_events[e.stream_id].append((e.kind, e.text))

    for i in range(3):
        assert batch_events[f"b{i}"] == solo_events[i]


def test_slot_recycling_and_admission():
    sched = make_scheduler(max_slots=2)
    a = sched.admit("a")
    b = sched.admit("b")
    assert sched.admit("c") is None             # full (admission control)
    sched.release(a)
    c = sched.admit("c")
    assert c is not None
    # the recycled slot must start from clean state: same audio gives the
    # same result as a fresh scheduler
    c.accept_waveform(speechy_audio(1.28, seed=3))
    evs = [(e.kind, e.text) for e in sched.drain() if e.stream_id == "c"]

    fresh = make_scheduler(max_slots=2)
    f = fresh.admit("f")
    f.accept_waveform(speechy_audio(1.28, seed=3))
    evs_fresh = [(e.kind, e.text) for e in fresh.drain()]
    assert evs == evs_fresh


def test_offset_arithmetic_reference_semantics():
    """Offset bookkeeping per the reference: initial -(context//framerate+1),
    rebased on first decoded chunk, +segment_size/bias per silent chunk once
    emission exists (reference stream.py:36, 111-113, 186-187)."""
    sched = make_scheduler()
    s = sched.admit("s0")
    assert s.offset == -5
    # two silent chunks first, then speech
    s.accept_waveform(silence(1.28))
    s.accept_waveform(speechy_audio(0.64, seed=1))
    sched.drain()
    if s.emission_length:
        # first decoded chunk came after 2 silent chunks: offset = 2*16 - 5
        assert s.offset == 2 * 16 - 5


def test_mulaw_upload_encoding_roundtrip():
    """mu-law codec: encode/decode SNR > 30 dB, and the scheduler runs
    end-to-end with upload_encoding='mulaw'."""
    import jax.numpy as jnp
    from asr_streaming_tpu.models.serving import (
        _mulaw_decode, mulaw_encode_host,
    )
    rng = np.random.default_rng(0)
    x = (rng.standard_normal(4000) * 0.2).clip(-1, 1).astype(np.float32)
    rec = np.asarray(_mulaw_decode(jnp.asarray(mulaw_encode_host(x))))
    snr = 10 * np.log10(np.mean(x ** 2) / np.mean((x - rec) ** 2))
    assert snr > 30

    import dataclasses
    from asr_streaming_tpu.models.serving import (
        ServingConfig, init_serving_params,
    )
    from asr_streaming_tpu.models.asr import ASRConfig
    cfg = ServingConfig(asr=ASRConfig.tiny(vocab_size=len(VOCAB)),
                        use_silero=False, upload_encoding="mulaw")
    params = init_serving_params(jax.random.PRNGKey(0), cfg)
    sched = Scheduler(params, cfg, VOCAB, max_slots=2, rules=FLUSH_RULES)
    s = sched.admit("m0")
    s.accept_waveform(speechy_audio(2.5, seed=4))
    events = sched.drain()
    assert any(e.is_final for e in events)


def test_async_harvest_equals_sync(monkeypatch):
    """Async harvest (pack read on a dedicated thread, started at
    dispatch) must produce exactly the same event stream as the
    synchronous in-tick read."""
    audio = [speechy_audio(2.0, seed=10 + i) for i in range(3)]

    def run(async_on):
        if async_on:
            monkeypatch.delenv("ASR_NO_ASYNC_HARVEST", raising=False)
        else:
            monkeypatch.setenv("ASR_NO_ASYNC_HARVEST", "1")
        sched = make_scheduler(max_slots=4, seed=7, rules=FLUSH_RULES)
        assert sched._async_harvest is async_on
        streams = [sched.admit(f"s{i}") for i in range(3)]
        for s, a in zip(streams, audio):
            s.accept_waveform(a)
            s.accept_waveform(silence(1.5))
        events = [(e.stream_id, e.kind, e.text) for e in sched.drain()]
        sched.close()
        return events

    assert run(True) == run(False)
