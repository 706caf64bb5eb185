"""Utilities: timing spans, structured progress logging."""

from hnsw_tpu.utils.timing import Timer, timed

__all__ = ["Timer", "timed"]
