"""Profiler integration — the structured upgrade of the reference's ad-hoc
nanoTime spans (SURVEY.md §5: tracing/profiling)."""

from __future__ import annotations

import contextlib


@contextlib.contextmanager
def profile_trace(log_dir: str = "/tmp/hnsw_tpu_trace"):
    """Capture a jax.profiler device trace around a block; view with
    tensorboard or xprof."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    """Named region in the device trace."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield
