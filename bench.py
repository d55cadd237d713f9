#!/usr/bin/env python
"""Headline benchmark: concurrent RTF<=1 streams per TPU chip.

Measures the steady-state latency of the fused 512-slot serving step
(log-mel + VAD + 20-layer streaming Emformer + CTC + greedy stats, bf16)
at the full Vietnamese production geometry, and converts it to the number
of real-time streams one chip sustains: each stream needs one chunk
decoded every 0.64 s (reference cadence, asr-online.yaml:112-118), so

    streams = slots * (0.64 / step_seconds)

Baseline: the reference's per-worker admission cap of 500 concurrent
connections on a 12-CPU + 1-GPU container (streaming_server.py:78-86,
docker-compose.yml:23-32); BASELINE.md north star: >=500 streams/chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N/500,
   "extra": {...}}
"""

import json
import time

import numpy as np


TICK_SECONDS = 0.64
BASELINE_STREAMS = 500.0
SLOTS = 512


def main():
    import jax
    import jax.numpy as jnp
    from asr_streaming_tpu.models.asr import ASRConfig
    from asr_streaming_tpu.models.serving import (
        ServingConfig, init_serving_params, init_serving_state, serving_step,
    )

    cfg = ServingConfig(asr=ASRConfig.vietnamese(compute_dtype=jnp.bfloat16))
    params = init_serving_params(jax.random.PRNGKey(0), cfg)
    state = init_serving_state(cfg, SLOTS)

    rng = np.random.default_rng(0)
    wave = jnp.asarray(
        rng.standard_normal((SLOTS, cfg.asr.audio.chunk_length)) * 0.1,
        dtype=jnp.float32)
    contain = jnp.zeros((SLOTS,), bool)
    active = jnp.ones((SLOTS,), bool)
    reset = jnp.zeros((SLOTS,), bool)

    step = jax.jit(lambda w, c, a, r, s: serving_step(params, cfg, w, c, a,
                                                      r, s),
                   donate_argnums=(4,))

    # compile + warmup
    t0 = time.time()
    out = step(wave, contain, active, reset, state)
    jax.block_until_ready(out)
    compile_seconds = time.time() - t0
    state = out.state

    times = []
    for _ in range(6):
        t0 = time.perf_counter()
        out = step(wave, contain, active, reset, state)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
        state = out.state
    step_seconds = float(np.median(times))

    streams = int(SLOTS * TICK_SECONDS / step_seconds)
    result = {
        "metric": "concurrent_rtf1_streams_per_chip",
        "value": streams,
        "unit": "streams",
        "vs_baseline": round(streams / BASELINE_STREAMS, 3),
        "extra": {
            "slots": SLOTS,
            "step_ms": round(step_seconds * 1e3, 2),
            "p50_chunk_latency_ms": round(step_seconds * 1e3, 2),
            "compile_s": round(compile_seconds, 1),
            "tick_budget_ms": TICK_SECONDS * 1e3,
            "dtype": "bfloat16",
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
