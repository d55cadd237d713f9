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

MEASURED (v5e via the axon tunnel, 8 slots, beam 10): beam_off tick
33 ms (ceiling ~38 streams at this tiny batch; 512-slot batched greedy
measured 6.8 ms in BASELINE.md); beam_on tick ~69.5 s — ~8.7 s PER
STREAM PER CHUNK.  The cost is the LINK, not the beam math: every
hypothesis expansion calls the jitted predictor/joiner once (~30 ms
RTT each) x beam 10 x up to 4+1 symbols x 4 frames.  On a local-PCIe
host (~100 us dispatch) the same call count is ~50-200 ms/stream/chunk
— usable for a handful of parity streams, never for fleet serving.
Config guidance: en_beam_partials is a PARITY mode; keep max streams
<= 4 per process on PCIe hosts, 0 on tunnel-attached dev boxes, and
serve throughput with the default batched device greedy + beam-rescored
finals.

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
    ap.add_argument("--slots", default="8")
    ap.add_argument("--beam", type=int, default=10)
    ap.add_argument("--ticks", type=int, default=30)
    args = ap.parse_args()

    from asr_streaming_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()

    for slots in (int(s) for s in args.slots.split(",")):
        off = measure(slots, args.beam, beam=False, ticks=args.ticks)
        # beam-on ticks are SECONDS each on a tunnel-attached host (the
        # host beam pays one link RTT per hypothesis expansion) — a few
        # ticks suffice for the per-stream overhead estimate
        on = measure(slots, args.beam, beam=True,
                     ticks=min(args.ticks, 4))
        overhead = (on["tick_ms"] - off["tick_ms"]) / slots
        print(f"slots={slots:4d} beam_off: tick {off['tick_ms']:7.2f} ms "
              f"(ceiling ~{off['rtf1_stream_ceiling']} streams)")
        print(f"            beam_on : tick {on['tick_ms']:7.2f} ms "
              f"(ceiling ~{on['rtf1_stream_ceiling']} streams), "
              f"beam overhead {overhead:.2f} ms/stream/chunk")


if __name__ == "__main__":
    main()
