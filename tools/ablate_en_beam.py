#!/usr/bin/env python
"""Measure the opt-in en_beam_partials mode's per-stream cost (real TPU).

en_beam_partials runs the reference's exact pattern — a carried-
hypothesis beam search on EVERY chunk (streaming_server.py:445) — as a
host Python beam per stream per chunk, fetching that stream's device
encodings via per-slot dynamic_slice + D2H (scheduler.py).  It exists
for parity, not throughput; this harness records what it actually
costs so the config can carry a measured max-streams guidance instead
of a vibe.

Method: EN scheduler at production model size (vocab 4097, encoding
1024), random weights, N slots all fed active audio, en_beam_partials
on vs off; report per-chunk host-scatter and full-tick medians and the
implied RTF<=1 stream ceiling against the 0.16 s EN tick budget.

Usage: python tools/ablate_en_beam.py [--slots 8,16,32] [--beam 10]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TICK_SECONDS = 0.16


def measure(slots: int, beam_width: int, beam: bool, ticks: int = 30):
    import dataclasses

    import jax
    import jax.numpy as jnp
    from asr_streaming_tpu.models.asr import ASRConfig
    from asr_streaming_tpu.models.rnnt import RNNTConfig
    from asr_streaming_tpu.models.serving import (
        ServingConfig, init_serving_params,
    )
    from asr_streaming_tpu.streaming.endpoint import EndpointRule
    from asr_streaming_tpu.streaming.scheduler import Scheduler
    from asr_streaming_tpu.utils.audio import EN_AUDIO

    rnnt = RNNTConfig(emformer=dataclasses.replace(
        RNNTConfig().emformer,
        compute_dtype=jnp.bfloat16,
        use_pallas_stack=jax.default_backend() == "tpu"))
    asr = dataclasses.replace(ASRConfig.vietnamese(jnp.bfloat16),
                              audio=EN_AUDIO)
    cfg = ServingConfig(asr=asr, model_kind="rnnt", rnnt=rnnt,
                        use_silero=False)
    params = init_serving_params(jax.random.PRNGKey(0), cfg)
    pieces = [f"▁t{i}" for i in range(rnnt.vocab_size - 1)] + ["<b>"]
    rules = {"never": EndpointRule(True, 1e9, 1e9, float("inf"))}
    sched = Scheduler(params, cfg, pieces, max_slots=slots,
                      language="en", rules=rules,
                      en_beam_partials=beam, en_beam_width=beam_width)
    rng = np.random.default_rng(0)
    chunk = EN_AUDIO.segment_length
    streams = [sched.admit(f"s{i}") for i in range(slots)]
    audio = (rng.standard_normal(chunk * (ticks + 8)) * 0.3
             ).astype(np.float32)
    for s in streams:
        s.accept_waveform(audio)
    for _ in range(4):                      # warm + compile
        sched.tick()
    t0 = time.perf_counter()
    done0 = sched.timers.snapshot()["counters"]["chunks_processed"]
    for _ in range(ticks):
        sched.tick()
    elapsed = time.perf_counter() - t0
    chunks = sched.timers.snapshot()["counters"]["chunks_processed"] - done0
    snap = sched.timers.snapshot()["stages"]
    tick_ms = elapsed * 1e3 / ticks
    per_chunk_ms = elapsed * 1e3 / max(1, chunks)
    return {
        "tick_ms": round(tick_ms, 2),
        "per_stream_chunk_ms": round(per_chunk_ms * slots / max(1, slots),
                                     3) if chunks else 0.0,
        "host_scatter_p50_ms": round(snap.get("host_scatter",
                                              {"p50_ms": 0})["p50_ms"], 2),
        "device_step_p50_ms": round(snap.get("device_step",
                                             {"p50_ms": 0})["p50_ms"], 2),
        "chunks": chunks,
        "rtf1_stream_ceiling": int(slots * TICK_SECONDS * 1e3 / tick_ms)
        if tick_ms else 0,
    }


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--slots", default="8,16,32")
    ap.add_argument("--beam", type=int, default=10)
    ap.add_argument("--ticks", type=int, default=30)
    args = ap.parse_args()

    from asr_streaming_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()

    for slots in (int(s) for s in args.slots.split(",")):
        off = measure(slots, args.beam, beam=False, ticks=args.ticks)
        on = measure(slots, args.beam, beam=True, ticks=args.ticks)
        overhead = (on["tick_ms"] - off["tick_ms"]) / slots
        print(f"slots={slots:4d} beam_off: tick {off['tick_ms']:7.2f} ms "
              f"(ceiling ~{off['rtf1_stream_ceiling']} streams)")
        print(f"            beam_on : tick {on['tick_ms']:7.2f} ms "
              f"(ceiling ~{on['rtf1_stream_ceiling']} streams), "
              f"beam overhead {overhead:.2f} ms/stream/chunk")


if __name__ == "__main__":
    main()
