"""JAX runtime environment setup for the pipeline entry points.

The axon-tunnel TPU charges ~50s per XLA compile; with one program per
bucket size class, compiles dominate cold-start wall time. The persistent
compilation cache makes them one-time costs across runs. Entry points (cli,
bench, engine users) call setup() before first dispatch.
"""

from __future__ import annotations

import os


def setup(cache_dir: str | None = None):
    import jax

    cache_dir = cache_dir or os.environ.get(
        "BAYESTYPER_TPU_CACHE", os.path.expanduser("~/.cache/bayestyper_tpu_xla")
    )
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass
