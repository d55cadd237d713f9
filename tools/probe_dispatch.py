#!/usr/bin/env python
"""Probe the per-call dispatch (enqueue) cost of the serving step."""
import os, sys, time
import numpy as np
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
B = 512

def main():
    import jax, jax.numpy as jnp
    from functools import partial
    from asr_streaming_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()
    from asr_streaming_tpu.models.asr import ASRConfig, with_pallas_layer
    from asr_streaming_tpu.models.serving import (
        ServingConfig, init_audio_context, init_emission_buffer,
        init_serving_params, init_serving_state, serving_step)

    asr_cfg = with_pallas_layer(ASRConfig.vietnamese(jnp.bfloat16), True)
    cfg = ServingConfig(asr=asr_cfg, use_silero=True, upload_encoding="mulaw")
    params = init_serving_params(jax.random.PRNGKey(0), cfg)
    sstate = init_serving_state(cfg, B)
    ctx = init_audio_context(cfg, B)
    emission = init_emission_buffer(cfg, B)
    seg_np = np.zeros((B, cfg.asr.audio.segment_length), np.uint8)
    flags = jnp.zeros((B,), bool)
    active = jnp.ones((B,), bool)
    # params passed per call, like the scheduler
    full = jax.jit(lambda p, s, c, a, n, r, st, cx, em:
                   serving_step(p, cfg, s, c, a, n, r, st, cx, em),
                   donate_argnums=(6, 7, 8))
    seg = jnp.asarray(seg_np)
    out = full(params, seg, flags, active, flags, flags, sstate, ctx, emission)
    jax.block_until_ready(out.pack)
    carry = (out.state, out.ctx, out.emission)

    # 1. pure upload cost
    t0 = time.perf_counter()
    for _ in range(10):
        seg = jnp.asarray(seg_np)
    jax.block_until_ready(seg)
    print(f"upload 5.2MB x10:   {(time.perf_counter()-t0)*1e2:7.2f} ms/ea")

    # 2. pure enqueue (no block): dispatch 8 chained steps, measure call time
    ts = []
    for i in range(8):
        t0 = time.perf_counter()
        out = full(params, seg, flags, active, flags, flags, *carry)
        carry = (out.state, out.ctx, out.emission)
        ts.append(time.perf_counter() - t0)
    jax.block_until_ready(out.pack)
    print("enqueue ms per call:", [f"{t*1e3:.1f}" for t in ts])

    # 3. harvest cost when device certainly done
    out = full(params, seg, flags, active, flags, flags, *carry)
    carry = (out.state, out.ctx, out.emission)
    try:
        out.pack.copy_to_host_async()
        print("copy_to_host_async: OK")
    except AttributeError:
        print("copy_to_host_async: MISSING")
    time.sleep(0.4)
    t0 = time.perf_counter()
    _ = np.asarray(out.pack)
    print(f"harvest after sleep: {(time.perf_counter()-t0)*1e3:7.2f} ms")

    # 4. harvest immediately (block on device + fetch)
    out = full(params, seg, flags, active, flags, flags, *carry)
    t0 = time.perf_counter()
    _ = np.asarray(out.pack)
    print(f"harvest immediate:  {(time.perf_counter()-t0)*1e3:7.2f} ms")

main()
