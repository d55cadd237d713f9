#!/usr/bin/env python
"""Profile the Emformer device step variants at serving scale (real TPU).

Timing methodology: the axon tunnel's block_until_ready can return before
the remote compute drains, so we time CHAINED steps (state fed back in —
exactly what the serving scheduler does every tick) and force one scalar
fetch at the end; per-step time = total / n.

Usage: python tools/profile_step.py [--slots 512]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit_chained(step, x, state0, n=20, warmup=3, _discard=[True]):
    import jax
    import jax.numpy as jnp

    if _discard[0]:
        # The FIRST measured variant in a process pays a one-off remote
        # penalty (~3-16 s: allocator growth / program load through the
        # tunnel) that 3 warmup steps do not absorb — measured 147-784
        # ms/step for code that then sustains 14 ms.  Burn a full
        # discarded pass once per process.
        _discard[0] = False
        timeit_chained(step, x, state0, n=n, warmup=warmup,
                       _discard=[False])

    state = state0
    for _ in range(warmup):
        y, state = step(x, state)
    float(jnp.sum(y))   # drain

    state = state0
    t0 = time.perf_counter()
    for _ in range(n):
        y, state = step(x, state)
    # force full drain: scalar depending on both outputs
    _ = float(jnp.sum(y) + jnp.sum(state.lc_k[-1, :, -1, :].astype(
        jnp.float32)))
    return (time.perf_counter() - t0) * 1e3 / n


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--slots", type=int, default=512)
    parser.add_argument("--d-model", type=int, default=512,
                        help="sweep width (heads/ffn scale with it); the "
                             "int8 trade flips MXU-ward as this grows")
    parser.add_argument("--variants", type=str, default="2,20")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    from asr_streaming_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()

    from asr_streaming_tpu.models.emformer import (
        EmformerConfig, init_emformer_params, init_emformer_state,
        emformer_stream_step,
    )

    B = args.slots
    rng = np.random.default_rng(0)

    for variant in args.variants.split(","):
        if variant.startswith("stack"):
            parts = variant.split(":")
            quant = "none"
            if parts[0] == "stackq8":
                quant = "int8"
            elif parts[0] == "stackffn8":
                quant = "int8_ffn"
            tile = int(parts[1]) if len(parts) > 1 else 64
            slices = int(parts[2]) if len(parts) > 2 else 1
            lps = int(parts[3]) if len(parts) > 3 else 1
            cfg = EmformerConfig(compute_dtype=jnp.bfloat16,
                                 use_pallas_stack=True,
                                 pallas_stack_tile=tile,
                                 pallas_ffn_slices=slices,
                                 pallas_layers_per_step=lps,
                                 quant=quant,
                                 d_model=args.d_model,
                                 num_heads=args.d_model // 64,
                                 ffn_dim=4 * args.d_model)
            label = (f"stack tile={tile} P={lps} "
                     f"quant={quant}")
        elif variant.startswith("pallas"):
            tile = int(variant.split(":")[1]) if ":" in variant else 64
            cfg = EmformerConfig(compute_dtype=jnp.bfloat16,
                                 use_pallas_layer=True, pallas_tile=tile,
                                 scan_unroll=20)
            label = f"pallas tile={tile}"
        else:
            cfg = EmformerConfig(compute_dtype=jnp.bfloat16,
                                 scan_unroll=int(variant))
            label = f"scan_unroll={variant}"
        try:
            _run_variant(args, cfg, label, B, rng)
        except Exception as e:  # noqa: BLE001 — sweep continues past OOMs
            msg = str(e).split("\n")[0][:200]
            print(f"{label:18s} B={B}: FAILED ({type(e).__name__}: {msg})")


def _run_variant(args, cfg, label, B, rng):
    import time

    import jax
    import jax.numpy as jnp
    from asr_streaming_tpu.models.emformer import (
        init_emformer_params, init_emformer_state, emformer_stream_step,
    )

    params = init_emformer_params(jax.random.PRNGKey(0), cfg)
    state = init_emformer_state(cfg, B)
    x = jnp.asarray(rng.standard_normal(
        (B, cfg.segment_length + cfg.right_context_length,
         cfg.d_model)), jnp.float32)
    # Params must be explicit jit ARGUMENTS: closure-captured arrays
    # are inlined as literals into the compile payload (252 MB of
    # MLIR for the 20-layer vi stack -> 15+ min remote compiles).
    jstep = jax.jit(lambda p, x, s: emformer_stream_step(p, cfg, x, s))
    params = jax.device_put(params)
    step = lambda x, s: jstep(params, x, s)
    t0 = time.perf_counter()
    jax.block_until_ready(step(x, state))
    compile_s = time.perf_counter() - t0
    ms = timeit_chained(step, x, state)
    print(f"{label:18s} B={B}: {ms:8.2f} ms/step "
          f"(compile {compile_s:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
