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

    setup_malloc()
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


def setup_malloc():
    """Keep large freed buffers in the glibc heap for reuse.

    MEASURED on the target VM: writing freshly-mapped pages runs at
    ~35 MB/s (memory-encrypted guest; a 520 MB first-touch costs ~15 s)
    while reused buffers write at 3-5 GB/s — a 100x gap. numpy's big temp
    arrays therefore MUST hit reused heap memory: raise the mmap threshold
    so large allocations come from (and return to) the retained heap
    instead of fresh mmaps, and disable trimming so the heap never shrinks
    back to the kernel. Applied by every entry point via setup()."""
    import ctypes

    try:
        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        libc.mallopt(-3, 2**31 - 1)  # M_MMAP_THRESHOLD
        libc.mallopt(-1, 2**31 - 1)  # M_TRIM_THRESHOLD
        # Non-main glibc arenas carve heaps from 64 MB mmaps, so any larger
        # request from a worker thread bypasses the threshold and hits raw
        # mmap/munmap (fresh pages every time). One arena = every thread
        # allocates from the main brk heap, which grows and is retained.
        # Effective when called before worker threads spawn; the
        # MALLOC_ARENA_MAX=1 environment variable is the belt-and-braces
        # equivalent for processes that started threads earlier.
        libc.mallopt(-8, 1)  # M_ARENA_MAX
    except Exception:
        pass
