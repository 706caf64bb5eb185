"""Shared helpers for index builders."""

from __future__ import annotations

from typing import Any, Optional, Sequence

import numpy as np

from hnsw_tpu.types import Corpus


def as_corpus(data, *, metric="cosine", ids: Optional[Sequence[Any]] = None,
              pad_rows_to: int = 8) -> Corpus:
    """Accept a Corpus, a host array [n, dim], or the reference's native data
    shape — a sequence of [id, vector] pairs (ultra_fast.clj:334-344)."""
    if isinstance(data, Corpus):
        return data
    if isinstance(data, (list, tuple)) and len(data) and \
            isinstance(data[0], (list, tuple)) and len(data[0]) == 2 and \
            np.ndim(data[0][1]) == 1:
        return Corpus.from_pairs(data, metric=metric, pad_rows_to=pad_rows_to)
    return Corpus.from_array(np.asarray(data), metric=metric, ids=ids,
                             pad_rows_to=pad_rows_to)
