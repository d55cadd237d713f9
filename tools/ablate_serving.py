#!/usr/bin/env python
"""Ablate serving_step extras to locate the non-model device time."""
import os, sys, time
import numpy as np
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
B = int(os.environ.get("SLOTS", "512"))
N = 10

def main():
    import jax, jax.numpy as jnp
    from functools import partial
    import dataclasses
    from asr_streaming_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()
    from asr_streaming_tpu.models.asr import ASRConfig, with_pallas_layer
    from asr_streaming_tpu.models.serving import (
        ServingConfig, init_audio_context, init_emission_buffer,
        init_serving_params, init_serving_state, serving_step)

    for label, kw in [
        ("baseline (1024 frames)", {}),
        ("emission 128 frames", dict(max_emission_frames=128)),
        ("no silero", dict(use_silero=False)),
        ("int16 upload", dict(upload_encoding="int16")),
    ]:
        asr_cfg = with_pallas_layer(ASRConfig.vietnamese(jnp.bfloat16), True)
        cfg = ServingConfig(asr=asr_cfg, use_silero=kw.pop("use_silero", True),
                            upload_encoding=kw.pop("upload_encoding", "mulaw"),
                            **kw)
        params = init_serving_params(jax.random.PRNGKey(0), cfg)
        sstate = init_serving_state(cfg, B)
        ctx = init_audio_context(cfg, B)
        emission = init_emission_buffer(cfg, B)
        dt = jnp.uint8 if cfg.upload_encoding == "mulaw" else jnp.int16
        seg = jnp.zeros((B, cfg.asr.audio.segment_length), dt)
        flags = jnp.zeros((B,), bool)
        active = jnp.ones((B,), bool)
        full = jax.jit(partial(serving_step, params, cfg),
                       donate_argnums=(5, 6, 7))
        carry = (sstate, ctx, emission)
        out = full(seg, flags, active, flags, flags, *carry)
        jax.block_until_ready(out.pack)
        carry = (out.state, out.ctx, out.emission)
        t0 = time.perf_counter()
        for _ in range(N):
            out = full(seg, flags, active, flags, flags, *carry)
            carry = (out.state, out.ctx, out.emission)
        jax.block_until_ready(out.pack)
        print(f"{label:24s}: {(time.perf_counter()-t0)*1e3/N:8.2f} ms")

main()
