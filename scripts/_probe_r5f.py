"""Round-5 probe f: closing the 1M recall gap (graph side).

_probe_r5e pinned the 1M recall cap on the GRAPH, not scoring precision
(int8 pack == bf16 == full-dim at every ef; ef=200 -> 0.9746). This probe
builds with one more NN-descent round (3) and searches with expand=8 (hop
width 256 — Pallas-eligible since the VMEM recalibration; halves the hop
count at equal ef) and a wider entry sample, sweeping ef 100/200/300.
Target: >=0.98 recall at >=25k QPS.

Run: timeout 590 python scripts/_probe_r5f.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

from hnsw_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()


class V:
    qps_scan_safe = False

    def __init__(self, idx, ef):
        self.idx, self.ef = idx, ef
        self.corpus = idx.corpus

    def search_batch(self, q, k, mode="balanced"):
        return self.idx.search_batch(q, k, mode, ef=self.ef)


def main():
    import bench
    from hnsw_tpu.bench.harness import run_search_benchmark
    from hnsw_tpu.models import build_hnsw_index
    from hnsw_tpu.models.flat import FlatIndex

    n = 1_000_000
    corpus, sample = bench.make_corpus_device(7, n, 768)
    t0 = time.perf_counter()
    idx = build_hnsw_index(corpus, M=16, hierarchy=False, pack_dim=128,
                           large_probe_clusters=4, large_refine_rounds=3,
                           expand=8)
    idx.entry_sample = 2048
    print(f"build(refine=3) {time.perf_counter()-t0:.1f}s", flush=True)

    exact = FlatIndex(corpus)
    _, er = exact.search_batch(sample[:1024], 10)
    er = np.asarray(er)

    for ef in (100, 200, 300):
        try:
            v = V(idx, ef)
            _, ar = v.search_batch(sample[:1024], 10)
            ar = np.asarray(ar)
            rec = np.mean([len(set(a.tolist()) & set(x.tolist())) / 10.0
                           for a, x in zip(ar, er)])
            perf = run_search_benchmark(v, sample[:1024], k=10,
                                        batch_size=1024, warmup=1, iters=4,
                                        single_query_iters=0)
            print(f"e=8 ef={ef}: recall={rec:.4f} "
                  f"qps={perf.get('qps_device') or 0:.0f}", flush=True)
        except Exception as e:
            print(f"ef={ef}: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
