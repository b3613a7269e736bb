"""Persistent XLA compilation cache.

The reference pays no compile cost (eager torch); this framework compiles
one XLA program per distinct batch shape, and on the TPU-tunnel backend a
single compile can take minutes (BENCH_r01: 100 s for the train step).
Enabling JAX's persistent cache makes every shape a one-time cost per
machine: subsequent runs (new processes included) deserialize the compiled
executable instead of recompiling.

Used by the CLI entry point, bench.py, and tests/conftest.py.
"""

from __future__ import annotations

import os


def enable_compilation_cache(cache_dir: str | None = None) -> str:
    """Idempotently point JAX at a persistent on-disk compilation cache.
    Returns the cache directory. Honors SEPSEP_COMPILE_CACHE (set to '0' or
    'off' to disable)."""
    import jax

    env = os.environ.get("SEPSEP_COMPILE_CACHE", "")
    if env.lower() in ("0", "off", "none"):
        return ""
    cache_dir = cache_dir or env or os.path.join(
        os.path.expanduser("~"), ".cache", "sepsep_jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # cache everything that takes meaningful time; tiny programs are cheap
    # to recompile and would bloat the cache
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return cache_dir
