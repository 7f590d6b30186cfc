"""Test configuration: force an 8-device virtual CPU platform so sharding and
multi-chip code paths are exercised without TPU hardware.

The environment presets JAX_PLATFORMS=axon (a remote TPU tunnel registered by
sitecustomize at interpreter startup, which imports jax and freezes the
platform config). Setting the env var here is too late — override the jax
config directly before any backend initialises. Benchmarks (bench.py)
intentionally do NOT import this and run on the real TPU.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
