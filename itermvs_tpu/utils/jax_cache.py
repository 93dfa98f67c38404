"""Persistent XLA compilation cache.

The unrolled IterMVS graph (4 GRU iterations x 3 levels x V-1 views of
warp+correlation) takes minutes to compile at eval resolutions; caching
compiled executables on disk makes every subsequent run start in
seconds. Safe to call multiple times; honors an existing
JAX_COMPILATION_CACHE_DIR if the environment already set one.
"""
from __future__ import annotations

import os

DEFAULT_CACHE_DIR = os.path.expanduser("~/.cache/itermvs_tpu/jax")


def enable_persistent_cache(cache_dir: str | None = None) -> None:
    import jax

    cache_dir = (cache_dir or os.environ.get("JAX_COMPILATION_CACHE_DIR")
                 or DEFAULT_CACHE_DIR)
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
