"""mu-law upload path: fidelity + transcription equivalence vs int16 PCM.

``upload_encoding="mulaw"`` halves the host->device audio bytes per tick
(the serving bottleneck on thin host links).  These tests pin down that
G.711-grade quantization does not change the transcription path: the same
greedy tokens, decode routing, and (closely) emissions as lossless int16.
"""

import dataclasses

import numpy as np
import jax
import pytest

from asr_streaming_tpu.models.asr import ASRConfig
from asr_streaming_tpu.models.serving import (
    ServingConfig, init_serving_params, mulaw_encode_host, _mulaw_decode,
)
from asr_streaming_tpu.streaming.scheduler import Scheduler

VOCAB = ["-", "|"] + [chr(ord("a") + i) for i in range(19)]


def speechy_audio(seconds, seed=0, level=0.25):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal(int(16000 * seconds)) * level
            ).astype(np.float32).clip(-1, 1)


def test_mulaw_roundtrip_snr():
    """Encode->decode SNR at speech levels beats 30 dB (G.711 grade)."""
    x = speechy_audio(2.0)
    y = np.asarray(_mulaw_decode(mulaw_encode_host(x)))
    snr = 10 * np.log10(np.mean(x ** 2) / np.mean((x - y) ** 2))
    assert snr > 30.0, snr


def test_mulaw_roundtrip_quiet_audio():
    """mu-law's log spacing keeps quiet audio (-40 dBFS) intact too."""
    x = speechy_audio(1.0, level=0.01)
    y = np.asarray(_mulaw_decode(mulaw_encode_host(x)))
    snr = 10 * np.log10(np.mean(x ** 2) / np.mean((x - y) ** 2))
    assert snr > 25.0, snr


def _run(upload_encoding, audio):
    cfg = ServingConfig(asr=ASRConfig.tiny(vocab_size=len(VOCAB)),
                        use_silero=False,
                        upload_encoding=upload_encoding)
    params = init_serving_params(jax.random.PRNGKey(3), cfg)
    sched = Scheduler(params, cfg, VOCAB, max_slots=2)
    s = sched.admit("s0")
    s.accept_waveform(audio)
    events = sched.drain()
    return s, events


def test_transcription_equivalence():
    """Same greedy argmax sequence + decode routing under both encodings."""
    audio = speechy_audio(2.5, seed=11)
    s_pcm, ev_pcm = _run("int16", audio)
    s_mu, ev_mu = _run("mulaw", audio)
    assert s_pcm.emission_length == s_mu.emission_length
    assert s_pcm.transcript_internal == s_mu.transcript_internal
    assert [e.kind for e in ev_pcm] == [e.kind for e in ev_mu]
    assert [e.text for e in ev_pcm] == [e.text for e in ev_mu]


def test_silence_routing_unchanged():
    """mu-law quantization of silence must not wake the energy gate."""
    audio = np.zeros(16000 * 2, np.float32)
    s_mu, ev_mu = _run("mulaw", audio)
    assert s_mu.emission_length == 0
    assert ev_mu == []
