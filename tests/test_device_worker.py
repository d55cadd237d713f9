"""Device-process isolation (streaming/device_worker.py): the scheduler
with the serving step in a spawned child produces the same events as the
in-process scheduler.  The child is pinned to CPU jax (platform arg)."""

import numpy as np
import jax
import pytest

from asr_streaming_tpu.models.asr import ASRConfig
from asr_streaming_tpu.models.serving import (
    ServingConfig, init_serving_params,
)
from asr_streaming_tpu.streaming.scheduler import GroupedScheduler, Scheduler
from asr_streaming_tpu.text.vocab import placeholder_vocab


def _cfg():
    return ServingConfig(asr=ASRConfig.tiny(), use_silero=False,
                         max_emission_frames=64)


def _run(sched, audio, n_streams=3):
    streams = [sched.admit(f"s{i}") for i in range(n_streams)]
    for s in streams:
        s.accept_waveform(audio)
    events = []
    for _ in range(80):
        events.extend(sched.tick())
        if not sched.has_work():
            break
    events.extend(sched.drain())
    segs = {}
    for s in streams:
        g = getattr(s, "_group", sched)    # GroupedScheduler: per-group
        if s.emission_length and hasattr(g, "_fetch_emission"):
            segs[s.id] = np.asarray(
                g._fetch_emission(g.emission_buf, s._slot,
                                  s.emission_length))
    return sorted((e.stream_id, e.kind, e.text) for e in events), segs


def test_worker_scheduler_matches_inproc():
    cfg = _cfg()
    params = init_serving_params(jax.random.PRNGKey(0), cfg)
    vocab = placeholder_vocab(cfg.asr.encoder.vocab_size)
    rng = np.random.default_rng(0)
    audio = (rng.standard_normal(16000 * 3) * 0.3).astype(np.float32)

    ref = Scheduler(params, cfg, vocab, max_slots=4)
    ev_ref, em_ref = _run(ref, audio)

    wk = Scheduler(params, cfg, vocab, max_slots=4,
                   device_worker={"seed": 0, "platform": "cpu"})
    try:
        assert wk.warmup() > 0
        ev_wk, em_wk = _run(wk, audio)
    finally:
        wk.close()

    assert ev_wk == ev_ref
    assert set(em_wk) == set(em_ref)
    for k in em_ref:
        np.testing.assert_allclose(em_wk[k], em_ref[k], rtol=1e-5,
                                   atol=1e-5)


def test_worker_emission_fetch_at_finals():
    """Finals flow through the worker's emission fetch (the rescorer
    path): force endpoints and check segments carry emissions."""
    from asr_streaming_tpu.streaming.endpoint import EndpointRule
    cfg = _cfg()
    params = init_serving_params(jax.random.PRNGKey(0), cfg)
    vocab = placeholder_vocab(cfg.asr.encoder.vocab_size)
    flush = {"flush": EndpointRule(True, 0.0, 1.2, float("inf"))}
    rng = np.random.default_rng(1)
    audio = (rng.standard_normal(16000 * 3) * 0.3).astype(np.float32)

    wk = Scheduler(params, cfg, vocab, max_slots=4, rules=flush,
                   device_worker={"seed": 0, "platform": "cpu"})
    try:
        wk.warmup()
        s = wk.admit("f0")
        s.accept_waveform(audio)
        events = []
        for _ in range(80):
            events.extend(wk.tick())
            if not wk.has_work():
                break
        finals = [e for e in events if e.kind == "final"]
        assert finals
        assert all(e.segment is not None and e.segment.emission is not None
                   and len(e.segment.emission) > 0 for e in finals)
    finally:
        wk.close()


def test_pipelined_grouped_worker_matches_inproc():
    """Grouped scheduling through ONE shared child (PipelinedWorkerClient):
    2 groups multiplexed over one device process must produce exactly the
    in-process grouped scheduler's events."""
    cfg = _cfg()
    params = init_serving_params(jax.random.PRNGKey(0), cfg)
    vocab = placeholder_vocab(cfg.asr.encoder.vocab_size)
    rng = np.random.default_rng(2)
    audio = (rng.standard_normal(16000 * 3) * 0.3).astype(np.float32)

    ref = GroupedScheduler(params, cfg, vocab, max_slots=8, groups=2)
    ev_ref, _ = _run(ref, audio, n_streams=5)

    wk = GroupedScheduler(params, cfg, vocab, max_slots=8, groups=2,
                          device_worker={"seed": 0, "platform": "cpu"})
    try:
        assert wk.warmup() > 0          # first view compiles, others skip
        ev_wk, _ = _run(wk, audio, n_streams=5)
    finally:
        wk.close()

    assert ev_wk == ev_ref


def test_pipelined_worker_emission_fetch_and_finals():
    """Finals fetch emissions through the shared client's fetch channel
    (group-tagged) — segments must carry emissions for the rescorer."""
    from asr_streaming_tpu.streaming.endpoint import EndpointRule
    cfg = _cfg()
    params = init_serving_params(jax.random.PRNGKey(0), cfg)
    vocab = placeholder_vocab(cfg.asr.encoder.vocab_size)
    flush = {"flush": EndpointRule(True, 0.0, 1.2, float("inf"))}
    rng = np.random.default_rng(3)
    audio = (rng.standard_normal(16000 * 3) * 0.3).astype(np.float32)

    wk = GroupedScheduler(params, cfg, vocab, max_slots=8, groups=2,
                          rules=flush,
                          device_worker={"seed": 0, "platform": "cpu"})
    try:
        wk.warmup()
        streams = [wk.admit(f"f{i}") for i in range(4)]
        for s in streams:
            s.accept_waveform(audio)
        events = []
        for _ in range(120):
            events.extend(wk.tick())
            if not wk.has_work():
                break
        finals = [e for e in events if e.kind == "final"]
        assert finals
        assert all(e.segment is not None and e.segment.emission is not None
                   and len(e.segment.emission) > 0 for e in finals)
    finally:
        wk.close()
