#!/usr/bin/env python
"""Measure the EN per-chunk beam mode's cost (real TPU), all three impls.

en_beam_partials replicates the reference's production EN decode — a
carried-hypothesis beam search on EVERY chunk (streaming_server.py:445).
Implementations:

  * off     — default serving: batched device greedy partials +
              beam-rescored finals (a different output contract from the
              reference's per-chunk beam);
  * device  — models/rnnt_beam.py: beam as a device batch axis inside
              the fused serving step (the production per-chunk beam);
  * host    — per-stream host oracle loop (parity/debug only).

Method: EN scheduler at production model size (vocab 4097, encoding
1024), random weights, N slots all fed active audio; report tick
medians and the implied RTF<=1 stream ceiling against the 0.16 s EN
tick budget.

MEASURED r3 (v5e via the axon tunnel, 8 slots, beam 10): host impl
~8.7 s PER STREAM PER CHUNK — the link, not the beam math: every
hypothesis expansion is one jitted predictor/joiner dispatch (~30 ms
RTT) x beam 10 x (max_symbols+1) x 4 frames.  The device impl exists
because of that measurement: one dispatch per tick regardless of slot
count.  Run with --slots 512 --impls off,device for the r4 headline.

Usage: python tools/ablate_en_beam.py [--slots 8,512] [--beam 10]
       [--impls off,device,host]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TICK_SECONDS = 0.16


def measure(slots: int, beam_width: int, impl: str, ticks: int = 30):
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
                      en_beam_partials=impl != "off",
                      en_beam_width=beam_width,
                      en_beam_impl=impl if impl != "off" else "device")
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
    return {
        "tick_ms": round(tick_ms, 2),
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
    ap.add_argument("--impls", default="off,device",
                    help="comma list of off,device,host")
    args = ap.parse_args()

    from asr_streaming_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()

    for slots in (int(s) for s in args.slots.split(",")):
        for impl in args.impls.split(","):
            # host-impl ticks are SECONDS each on a tunnel-attached host
            # (one link RTT per hypothesis expansion) — a few suffice
            ticks = min(args.ticks, 4) if impl == "host" else args.ticks
            r = measure(slots, args.beam, impl=impl, ticks=ticks)
            budget = "inside" if r["tick_ms"] <= TICK_SECONDS * 1e3 \
                else "OVER"
            print(f"slots={slots:4d} impl={impl:6s} "
                  f"tick {r['tick_ms']:8.2f} ms "
                  f"(ceiling ~{r['rtf1_stream_ceiling']} streams; "
                  f"{budget} the {TICK_SECONDS * 1e3:.0f} ms EN budget) "
                  f"device_step_p50 {r['device_step_p50_ms']} ms "
                  f"scatter_p50 {r['host_scatter_p50_ms']} ms")


if __name__ == "__main__":
    main()
