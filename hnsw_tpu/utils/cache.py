"""Persistent XLA compilation cache.

On tunneled TPU setups a single compile can cost seconds; the builder and
searcher use a small, fixed set of shape-bucketed kernels precisely so this
cache makes every process after the first start hot."""

from __future__ import annotations

import os


def scrub_compilation_cache(path: str) -> int:
    """Remove corrupt (e.g. truncated by a killed process) zstd cache
    entries. A bad entry otherwise raises ZstdError warnings on every read
    and permanently defeats the cache for that key. Returns #removed."""
    removed = 0
    try:
        import zstandard as zstd
    except ImportError:
        return 0
    if not os.path.isdir(path):
        return 0
    dctx = zstd.ZstdDecompressor()
    for f in os.listdir(path):
        p = os.path.join(path, f)
        if not os.path.isfile(p):
            continue
        try:
            with open(p, "rb") as fh:
                raw = fh.read()
            dctx.decompress(raw, max_output_size=2 ** 33)
        except zstd.ZstdError:
            try:
                os.unlink(p)
                removed += 1
            except OSError:
                pass
        except Exception:
            pass  # unreadable for other reasons: leave it to jax
    return removed


def enable_compilation_cache(path: str = None, scrub: bool = True) -> None:
    import jax

    path = path or os.environ.get(
        "HNSW_TPU_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))), ".jax_cache"))
    try:
        os.makedirs(path, exist_ok=True)
        if scrub:
            scrub_compilation_cache(path)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
    except Exception:
        pass  # cache is an optimization; never fail for it
