"""Persistent XLA compilation cache helper.

Compiles through the tunneled TPU runtime cost minutes; the persistent
cache turns repeat compiles into second-scale loads (measured 113s ->
1.3s). Call once before building engines; respects TAT_JAX_CACHE.
"""

from __future__ import annotations

import os


def enable_compile_cache(cache_dir: str | None = None) -> str:
    import jax
    if cache_dir is None:
        cache_dir = os.environ.get(
            "TAT_JAX_CACHE",
            os.path.join(os.path.dirname(os.path.dirname(
                os.path.dirname(os.path.abspath(__file__)))), ".jax_cache"))
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    return cache_dir
