"""Persistent XLA compilation cache.

The serving step at production slot count takes minutes to compile on a
cold start (the reference likewise frontloads all model loading before
accepting traffic, streaming_server.py:108-215 — but its TorchScript has
no cross-process cache either).  JAX can persist compiled executables to
disk; enabling it turns warm restarts from minutes into seconds.

Call ``enable_compile_cache()`` before the first jit compilation (server
startup, bench, tools).  No-op if the backend does not support executable
serialization.
"""

from __future__ import annotations

import logging
import os
from typing import Optional

_DEFAULT_DIR = os.path.expanduser("~/.cache/asr_streaming_tpu/xla")
_enabled = False


def enable_compile_cache(cache_dir: Optional[str] = None) -> str:
    """Point jax at a persistent on-disk compilation cache. Idempotent.

    TPU-backed processes only: XLA:CPU AOT entries bake in the compiling
    host's CPU features, and this cache directory can be shared across
    machines (sandboxed shells here present varying feature sets) — a
    mismatched entry loads with a SIGILL warning (cpu_aot_loader.cc),
    observed live in the device-worker server parent, which pins jax to
    CPU.  TPU entries are device-targeted and safe.  Same policy as
    tests/conftest.py.
    """
    global _enabled
    cache_dir = (cache_dir
                 or os.environ.get("JAX_COMPILATION_CACHE_DIR")
                 or _DEFAULT_DIR)
    if _enabled:
        return cache_dir
    try:
        import jax
        if jax.default_backend() == "cpu":
            logging.info("compile cache disabled for CPU backend "
                         "(host-specific AOT entries; see docstring)")
            return cache_dir
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # cache everything that took meaningful compile time; the serving
        # step is minutes, but warmup helpers matter too
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        try:
            jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        except AttributeError:
            pass
        _enabled = True
    except Exception:
        logging.exception("could not enable the XLA compilation cache")
    return cache_dir
