#!/usr/bin/env python
"""Attribute the device RNNT beam chunk step's time (real TPU).

Times the full ``rnnt_beam_chunk_step`` at production shape (512 slots x
beam 10, vocab 4097) plus isolated sub-graphs at the per-round shapes so
the per-frame budget can be attributed op family by op family:

  joiner       one [B, W, V] joiner evaluation
  logsoftmax   log_softmax over the [B, W, V] logits
  topk_row     iter_topk_values(logp, W) per-hypothesis preselection
  topk_flat    iter_topk over the flattened [B, W*V] candidates
  predictor    one batched [B*W] predictor (3-layer LN-LSTM) step
  frame        one _beam_frame (all K+1 rounds + dedupe + gathers)
  chunk        the full 4-frame scan (what serving pays per tick)

Timing re-dispatches the same inputs (NOT state-chained like
profile_step.py — per-op attribution needs fixed inputs) with one
block_until_ready drain at the end, so tunnel RTT amortizes across reps.
The compile figure is the first call timed separately.

Usage: python tools/profile_beam.py [--slots 512] [--beam 10] [--reps 10]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _time(fn, *args, reps=10, warmup=2):
    """Returns (steady_ms, compile_s): the first call is timed alone
    (it pays tracing + XLA compilation), then ``warmup-1`` discarded
    calls absorb remote program-load jitter before the measured reps."""
    import jax
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0
    for _ in range(max(warmup - 1, 0)):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) * 1e3 / reps, compile_s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--slots", type=int, default=512)
    ap.add_argument("--beam", type=int, default=10)
    ap.add_argument("--reps", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from asr_streaming_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()

    from asr_streaming_tpu.models.rnnt import (
        PredictorState, RNNTConfig, init_rnnt_params, joiner,
        predictor_step,
    )
    from asr_streaming_tpu.models.rnnt_beam import (
        _beam_frame, init_beam_state, rnnt_beam_chunk_step,
    )
    from asr_streaming_tpu.ops.pallas_topk import pallas_row_topk
    from asr_streaming_tpu.ops.topk import iter_topk, iter_topk_values

    cfg = RNNTConfig()
    B, W, V = args.slots, args.beam, cfg.vocab_size
    D, H, L = cfg.encoding_dim, cfg.pred_hidden, cfg.pred_layers
    U = cfg.emformer.segment_length
    rng = np.random.default_rng(0)
    params = jax.device_put(init_rnnt_params(jax.random.PRNGKey(0), cfg))

    enc = jnp.asarray(rng.standard_normal((B, U, D)), jnp.float32)
    enc_t = enc[:, 0, :]
    po = jnp.asarray(rng.standard_normal((B, W, D)), jnp.float32)
    logits = jnp.asarray(rng.standard_normal((B, W, V)), jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    tok = jnp.asarray(rng.integers(0, V, (B * W,)), jnp.int32)
    ps = PredictorState(
        h=jnp.asarray(rng.standard_normal((L, B * W, H)), jnp.float32),
        c=jnp.asarray(rng.standard_normal((L, B * W, H)), jnp.float32))
    state = init_beam_state(cfg, B, W)

    jj = jax.jit(lambda p, e, q: joiner(p, e[:, None, :], q))
    jls = jax.jit(lambda x: jax.nn.log_softmax(x, axis=-1))
    jtr = jax.jit(lambda x: iter_topk_values(x, W))
    jtp = jax.jit(lambda x: pallas_row_topk(x, W))
    jtf = jax.jit(lambda x: iter_topk(x.reshape(B, W * V), W))
    jpr = jax.jit(lambda p, t, s: predictor_step(p, t, s, cfg))
    jfr = jax.jit(lambda p, e, s: _beam_frame(p, cfg, e, s, 10.0))
    jch = jax.jit(lambda p, e, s: rnnt_beam_chunk_step(p, cfg, e, s))

    r = args.reps
    rows = [
        ("joiner", lambda: _time(jj, params, enc_t, po, reps=r)),
        ("logsoftmax", lambda: _time(jls, logits, reps=r)),
        ("topk_iter", lambda: _time(jtr, logp, reps=r)),
        ("topk_pallas", lambda: _time(jtp, logp, reps=r)),
        ("topk_flat", lambda: _time(jtf, logp, reps=r)),
        ("predictor", lambda: _time(jpr, params, tok, ps, reps=r)),
        ("frame", lambda: _time(jfr, params, enc_t, state, reps=r)),
        ("chunk", lambda: _time(jch, params, enc, state, reps=r)),
    ]
    print(f"B={B} W={W} V={V} K={cfg.max_symbols_per_frame} U={U}",
          flush=True)
    for name, fn in rows:
        ms, compile_s = fn()
        print(f"{name:11s} {ms:8.2f} ms  (compile {compile_s:.0f}s)",
              flush=True)


if __name__ == "__main__":
    main()
