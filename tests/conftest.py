"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding tests run on a
virtual 8-device CPU mesh instead.  The container's sitecustomize registers
the axon TPU PJRT plugin and pins JAX_PLATFORMS=axon at interpreter start,
so we must override via jax.config (env vars alone are not enough).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# NOTE: the persistent compilation cache is NOT enabled for CPU test runs:
# XLA:CPU AOT entries bake in host CPU features, and this environment's
# sandboxed shells present varying feature sets (risk of SIGILL on load).
# TPU entries (server/bench) are device-targeted and safe to cache.
