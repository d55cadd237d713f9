"""Native host codec (libasrcodec.so): AVX-512 + fused-gather paths.

The scheduler's upload path encodes every ready stream's new-segment
audio each tick; these tests pin the native encoder bit-for-bit against
the numpy reference (models/serving.py mulaw LUT / int16 clip) and the
fused gather+encode entry against the copy-then-encode spelling.
"""

import os

import numpy as np
import pytest

from asr_streaming_tpu.models.serving import mulaw_encode_host
from asr_streaming_tpu.utils import codec_native


pytestmark = pytest.mark.skipif(
    not codec_native.native_available(),
    reason="native codec unavailable (no C++ toolchain)")


def test_mulaw_bit_exact_vs_numpy():
    rng = np.random.default_rng(0)
    x = (rng.standard_normal((64, 1000)).astype(np.float32) * 0.5)
    out = np.zeros_like(x, dtype=np.uint8)
    assert codec_native.mulaw_encode_into(x, out)
    np.testing.assert_array_equal(out, mulaw_encode_host(x))


def test_mulaw_bit_exact_edge_values():
    # clamp limits, signed zeros, infinities, half-LSB values, and an
    # odd tail length that exercises the scalar remainder loop
    edge = np.array([-2.0, 2.0, -1.0, 1.0, 0.0, -0.0, 1e-8, -1e-8,
                     np.inf, -np.inf, 0.5, -0.5, 0.9999, -0.9999,
                     1 / 32767, -1 / 32767, 0.1, -0.3, 0.7734,
                     0.25, -0.125, 3e-5, -3e-5], np.float32)[None]
    out = np.zeros_like(edge, dtype=np.uint8)
    assert codec_native.mulaw_encode_into(edge, out)
    np.testing.assert_array_equal(out, mulaw_encode_host(edge))


def test_pcm16_bit_exact():
    rng = np.random.default_rng(1)
    x = (rng.standard_normal((32, 997)).astype(np.float32) * 0.8)
    x[0, :4] = [-2.0, 2.0, 1.0, -1.0]
    out = np.zeros_like(x, dtype=np.int16)
    assert codec_native.pcm16_encode_into(x, out)
    ref = np.clip(x * 32767.0, -32768, 32767).astype(np.int16)
    np.testing.assert_array_equal(out, ref)


@pytest.mark.skipif(not codec_native.gather_available(),
                    reason="fused gather entry not in built library")
@pytest.mark.parametrize("mulaw", [True, False])
def test_gather_encode_matches_copy_then_encode(mulaw):
    """Row i encodes views[i] into out[slots[i]]; untouched rows keep
    their previous bytes."""
    rng = np.random.default_rng(2)
    rows, slots_total, cols = 5, 8, 640
    views = [rng.standard_normal(cols).astype(np.float32) * 0.4
             for _ in range(rows)]
    slots = np.array([6, 0, 3, 7, 1], np.int32)
    dtype = np.uint8 if mulaw else np.int16
    out = np.full((slots_total, cols), 9, dtype)
    sentinel = out.copy()
    assert codec_native.gather_encode_into(views, slots, out, mulaw)
    for i, slot in enumerate(slots):
        if mulaw:
            ref = mulaw_encode_host(views[i][None])[0]
        else:
            ref = np.clip(views[i] * 32767.0, -32768, 32767
                          ).astype(np.int16)
        np.testing.assert_array_equal(out[slot], ref)
    untouched = sorted(set(range(slots_total)) - set(slots.tolist()))
    np.testing.assert_array_equal(out[untouched], sentinel[untouched])


@pytest.mark.skipif(not codec_native.gather_available(),
                    reason="fused gather entry not in built library")
def test_scheduler_fused_gather_event_equivalence(monkeypatch):
    """The fused native gather+encode tick path emits exactly the events
    of the Python copy-then-encode path."""
    import jax
    from asr_streaming_tpu.models.asr import ASRConfig
    from asr_streaming_tpu.models.serving import (
        ServingConfig, init_serving_params,
    )
    from asr_streaming_tpu.streaming.endpoint import EndpointRule
    from asr_streaming_tpu.streaming.scheduler import Scheduler

    vocab = ["-", "|"] + [chr(ord("a") + i) for i in range(19)]
    rules = {"flush": EndpointRule(True, 0.0, 1.9, float("inf"))}
    cfg = ServingConfig(asr=ASRConfig.tiny(vocab_size=len(vocab)),
                        use_silero=False)
    params = init_serving_params(jax.random.PRNGKey(7), cfg)
    rng = np.random.default_rng(3)
    audio = [(rng.standard_normal(16000 * 2) * 0.3).astype(np.float32)
             for _ in range(3)]

    def run(disable_fused):
        if disable_fused:
            monkeypatch.setenv("ASR_NO_FUSED_GATHER", "1")
        else:
            monkeypatch.delenv("ASR_NO_FUSED_GATHER", raising=False)
        sched = Scheduler(params, cfg, vocab, max_slots=4, rules=rules)
        events = {}
        for i, a in enumerate(audio):
            s = sched.admit(f"s{i}")
            s.accept_waveform(a)
        for e in sched.drain():
            events.setdefault(e.stream_id, []).append((e.kind, e.text))
        return events

    assert run(False) == run(True)
