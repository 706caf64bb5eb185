#!/usr/bin/env python
"""Prime the persistent XLA compile cache for the headline bench.

Runs bench.py's headline portion (scale sweep off) so every program the
driver's unattended `python bench.py` run needs is already in `.jax_cache/`
— on the dev relay a cold compile costs 10-200 s per program, and the cache
is keyed on traced HLO, so this must be re-run after any change that alters
a hot path's HLO (see CLAUDE.md). Usage: `python scripts/warm_cache.py`
(optionally HNSW_TPU_BENCH_BUDGET_S to bound it).
"""

import os
import runpy
import sys

os.environ.setdefault("HNSW_TPU_SCALE", "")  # headline programs only
os.environ.setdefault("HNSW_TPU_BENCH_BUDGET_S", "1800")

here = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(here))
runpy.run_path(os.path.join(os.path.dirname(here), "bench.py"),
               run_name="__main__")
