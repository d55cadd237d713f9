#!/usr/bin/env python
"""Cumulative ablation of serving_step internals (find the 53-22ms gap)."""
import os, sys, time
import numpy as np
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
B = int(os.environ.get("SLOTS", "512"))
N = 10


def main():
    import jax, jax.numpy as jnp
    from asr_streaming_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()
    from asr_streaming_tpu.models.asr import (
        ASRConfig, asr_stream_step, init_asr_state, with_pallas_layer)
    from asr_streaming_tpu.models.serving import (
        ServingConfig, _assemble_wave, _vad_stage, _pack,
        init_audio_context, init_emission_buffer, init_serving_params,
        init_serving_state)

    asr_cfg = with_pallas_layer(ASRConfig.vietnamese(jnp.bfloat16), True)
    cfg = ServingConfig(asr=asr_cfg, use_silero=True, upload_encoding="mulaw")
    params = init_serving_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    seg = jnp.asarray(rng.integers(0, 255, (B, cfg.asr.audio.segment_length)),
                      jnp.uint8)
    flags = jnp.zeros((B,), bool)
    active = jnp.ones((B,), bool)

    def timeit(make_fn, carry0, donate):
        # params + wave as explicit args (closure captures overflow the
        # remote compile request)
        donate = tuple(d + 2 for d in donate)
        fn = jax.jit(lambda p, w, *c: make_fn(p, w, *c),
                     donate_argnums=donate)
        carry = (params, wave_const) + carry0
        n0 = len(carry0)
        out = fn(*carry)
        jax.block_until_ready(out)
        carry = (params, wave_const) + tuple(out)[:n0]
        t0 = time.perf_counter()
        for _ in range(N):
            out = fn(*carry)
            carry = (params, wave_const) + tuple(out)[:n0]
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) * 1e3 / N

    # v0: bare model step, donated state, random wave input
    wave_const = jnp.asarray(rng.standard_normal(
        (B, cfg.asr.audio.chunk_length)), jnp.float32)

    def v0(p, w, state):
        out = asr_stream_step(p, cfg.asr, w, state,
                              reset=flags, advance=active)
        return (out.state, out.argmax)

    print(f"v0 model+masks (donated): "
          f"{timeit(v0, (init_asr_state(cfg.asr, B),), (0,)):7.2f} ms")

    # v1: + wave assembly (mulaw decode + ctx carry)
    def v1(p, w, state, ctx):
        wave, new_ctx = _assemble_wave(cfg, seg, ctx, active, flags)
        out = asr_stream_step(p, cfg.asr, wave, state,
                              reset=flags, advance=active)
        return (out.state, new_ctx, out.argmax)

    print(f"v1 +assemble:             "
          f"{timeit(v1, (init_asr_state(cfg.asr, B), init_audio_context(cfg, B)), (0, 1)):7.2f} ms")

    # v2: + vad stage + routing
    def v2(p, w, state, ctx):
        wave, new_ctx = _assemble_wave(cfg, seg, ctx, active, flags)
        gate, sil, lead, trail = _vad_stage(
            p, cfg, wave, cfg.asr.audio.buffer_length,
            cfg.asr.audio.sample_rate)
        decode = active & (flags | (gate & sil))
        out = asr_stream_step(p, cfg.asr, wave, state,
                              reset=flags, advance=decode)
        return (out.state, new_ctx, out.argmax, decode, lead, trail)

    print(f"v2 +vad:                  "
          f"{timeit(v2, (init_asr_state(cfg.asr, B), init_audio_context(cfg, B)), (0, 1)):7.2f} ms")

    # v3: + emission append
    def v3(p, w, state, ctx, emission):
        wave, new_ctx = _assemble_wave(cfg, seg, ctx, active, flags)
        gate, sil, lead, trail = _vad_stage(
            p, cfg, wave, cfg.asr.audio.buffer_length,
            cfg.asr.audio.sample_rate)
        decode = active & (flags | (gate & sil))
        out = asr_stream_step(p, cfg.asr, wave, state,
                              reset=flags, advance=decode)
        U, V = out.log_probs.shape[1:]
        pre_len = jnp.where(flags, 0, state.length)
        pos = jnp.clip(pre_len, 0, cfg.max_emission_frames - U)
        existing = jax.vmap(
            lambda buf, p: jax.lax.dynamic_slice(buf, (p, 0), (U, V))
        )(emission, pos)
        rows = jnp.where(decode[:, None, None],
                         out.log_probs.astype(emission.dtype), existing)
        emission = jax.vmap(
            lambda buf, r, p: jax.lax.dynamic_update_slice(buf, r, (p, 0))
        )(emission, rows, pos)
        return (out.state, new_ctx, emission, out.argmax)

    print(f"v3 +emission:             "
          f"{timeit(v3, (init_asr_state(cfg.asr, B), init_audio_context(cfg, B), init_emission_buffer(cfg, B)), (0, 1, 2)):7.2f} ms")

    # v4: + pack
    def v4(p, w, state, ctx, emission):
        wave, new_ctx = _assemble_wave(cfg, seg, ctx, active, flags)
        gate, sil, lead, trail = _vad_stage(
            p, cfg, wave, cfg.asr.audio.buffer_length,
            cfg.asr.audio.sample_rate)
        decode = active & (flags | (gate & sil))
        out = asr_stream_step(p, cfg.asr, wave, state,
                              reset=flags, advance=decode)
        U, V = out.log_probs.shape[1:]
        pre_len = jnp.where(flags, 0, state.length)
        pos = jnp.clip(pre_len, 0, cfg.max_emission_frames - U)
        existing = jax.vmap(
            lambda buf, p: jax.lax.dynamic_slice(buf, (p, 0), (U, V))
        )(emission, pos)
        rows = jnp.where(decode[:, None, None],
                         out.log_probs.astype(emission.dtype), existing)
        emission = jax.vmap(
            lambda buf, r, p: jax.lax.dynamic_update_slice(buf, r, (p, 0))
        )(emission, rows, pos)
        pack = _pack(decode, gate, sil, lead, trail,
                     out.argmax.astype(jnp.float32))
        return (out.state, new_ctx, emission, pack)

    print(f"v4 +pack (== serving):    "
          f"{timeit(v4, (init_asr_state(cfg.asr, B), init_audio_context(cfg, B), init_emission_buffer(cfg, B)), (0, 1, 2)):7.2f} ms")


main()
