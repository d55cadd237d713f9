#!/usr/bin/env python
"""Component-level timing of the fused vi serving step at 512 slots.

Times each stage as its own chained jit on the real chip to find where
the tick's device time goes (the Emformer is known; VAD scan, frontend,
CTC head, emission-buffer update, and dispatch overhead are suspects).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B = int(os.environ.get("SLOTS", "512"))
N = 12


def chained(fn, *args, n=N, feedback=None):
    import jax

    out = None
    for _ in range(3):
        out = fn(*args)
        if feedback:
            args = feedback(out, args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
        if feedback:
            args = feedback(out, args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) * 1e3 / n


def main():
    import jax
    import jax.numpy as jnp
    from asr_streaming_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()

    import dataclasses
    from functools import partial
    from asr_streaming_tpu.models.asr import (
        ASRConfig, asr_stream_step, init_asr_params, init_asr_state,
        with_pallas_layer,
    )
    from asr_streaming_tpu.models.serving import (
        ServingConfig, init_audio_context, init_emission_buffer,
        init_serving_params, init_serving_state, serving_step,
    )
    from asr_streaming_tpu.models.emformer import emformer_stream_step
    from asr_streaming_tpu.models.vad import silero_chunk_probs
    from asr_streaming_tpu.ops.frontend import log_mel

    asr_cfg = with_pallas_layer(ASRConfig.vietnamese(jnp.bfloat16), True)
    cfg = ServingConfig(asr=asr_cfg, use_silero=True,
                        upload_encoding="mulaw")
    params = init_serving_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    wave = jnp.asarray(rng.standard_normal(
        (B, cfg.asr.audio.chunk_length)), jnp.float32)

    # warm the tunnel: a fresh process needs ~30 dispatches to reach
    # steady state (first-variant readings are otherwise ~10x inflated)
    warm = jax.jit(lambda x: x + 1.0)
    tw = jnp.zeros((8, 8))
    for i in range(40):
        out = warm(tw)
    jax.block_until_ready(out)

    # 1. frontend
    fe = jax.jit(lambda w: log_mel(params["frontend"], cfg.asr.mel, w))
    print(f"log_mel:          {chained(fe, wave):8.2f} ms")

    # 2. silero VAD
    vad = jax.jit(lambda w: silero_chunk_probs(params["vad"], cfg.silero, w))
    print(f"silero_chunk:     {chained(vad, wave):8.2f} ms")

    # 3. full asr_stream_step (frontend + emformer + ctc + greedy)
    state = init_asr_state(cfg.asr, B)
    step = jax.jit(lambda w, s: asr_stream_step(params, cfg.asr, w, s))

    def fb(out, args):
        return (args[0], out.state)

    print(f"asr_stream_step:  {chained(step, wave, state, feedback=fb):8.2f} ms")

    # 4. full serving step (adds VAD routing + emission buffer + pack)
    sstate = init_serving_state(cfg, B)
    ctx = init_audio_context(cfg, B)
    emission = init_emission_buffer(cfg, B)
    seg = jnp.zeros((B, cfg.asr.audio.segment_length), jnp.uint8)
    flags = jnp.zeros((B,), bool)
    active = jnp.ones((B,), bool)
    full = jax.jit(partial(serving_step, params, cfg),
                   donate_argnums=(5, 6, 7))

    carry = (sstate, ctx, emission)

    def run(c):
        out = full(seg, flags, active, flags, flags, *c)
        return out

    out = run(carry)
    jax.block_until_ready(out.pack)
    carry = (out.state, out.ctx, out.emission)
    t0 = time.perf_counter()
    for _ in range(N):
        out = run(carry)
        carry = (out.state, out.ctx, out.emission)
    jax.block_until_ready(out.pack)
    print(f"serving_step:     {(time.perf_counter()-t0)*1e3/N:8.2f} ms")

    # 5. dispatch overhead: trivial jit on tiny data, chained
    tiny = jax.jit(lambda x: x + 1.0)
    t = jnp.zeros((8, 8))
    print(f"tiny dispatch:    {chained(tiny, t, n=30):8.2f} ms")

    # 6. pack D2H fetch cost
    pack = np.asarray(out.pack)  # warm
    t0 = time.perf_counter()
    for _ in range(N):
        _ = np.asarray(out.pack)
    print(f"pack D2H:         {(time.perf_counter()-t0)*1e3/N:8.2f} ms")


if __name__ == "__main__":
    main()
