#!/usr/bin/env python
"""Round-3 TPU probe: per-phase timing of the 31k HNSW build (warm pass)
to locate the 26.5 s warm-build regression (r1: 2.1 s)."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hnsw_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402
import numpy as np  # noqa: E402

from hnsw_tpu.io.datagen import generate_vectors  # noqa: E402
from hnsw_tpu.types import Corpus  # noqa: E402
from hnsw_tpu.models.hnsw.build import build_graph  # noqa: E402

N, DIM = 31173, 768


def out(**kw):
    print(json.dumps(kw), flush=True)


data = generate_vectors(N, DIM, distribution="embedding",
                        num_clusters=64, seed=42)
corpus = Corpus.from_array(data)
corpus.vectors.block_until_ready()
out(stage="staged", backend=jax.default_backend())

for rep in range(2):
    marks = []
    t_start = time.perf_counter()

    def progress(stage, frac):
        marks.append((stage, frac, time.perf_counter() - t_start))

    g = build_graph(corpus, m=16, progress=progress)
    np.asarray(g.adj0)[:1]
    total = time.perf_counter() - t_start
    out(rep=rep, total_s=round(total, 2),
        marks=[(s, f, round(t, 2)) for s, f, t in marks],
        n_bridges=g.n_bridges, max_level=g.max_level)
