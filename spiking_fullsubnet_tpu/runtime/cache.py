"""Persistent XLA compilation cache.

Remote-attached TPU backends can take minutes to compile large programs;
caching compiled executables on disk makes every process after the first
start instantly. Called from bench/CLI entry points.
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> None:
    import jax

    cache_dir = path or os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
