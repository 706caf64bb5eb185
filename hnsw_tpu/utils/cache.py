"""Persistent XLA compilation cache.

On tunneled TPU setups a single compile can cost seconds; the builder and
searcher use a small, fixed set of shape-bucketed kernels precisely so this
cache makes every process after the first start hot."""

from __future__ import annotations

import os


def enable_compilation_cache(path: str = None) -> None:
    import jax

    path = path or os.environ.get(
        "HNSW_TPU_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))), ".jax_cache"))
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
    except Exception:
        pass  # cache is an optimization; never fail for it
