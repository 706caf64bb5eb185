"""Round-5 probe g: denser 1M graph (M=24, M0=48) + wider hop expansion.

_probe_r5f: with M=16/refine=3, ef=200 -> 0.9788 @ 17.3k and ef=300 ->
0.9872 @ 11.5k — recall-per-ef is the binding constraint, so raise the
graph's degree (M0 48 edges/node) and halve hops again with expand=16
(c=768 at pack_dim=128 — trivially VMEM-eligible). int8 pack at M0=48 is
6.5 GB, so the instance pack cap is raised to 8 GB.

Run: timeout 1100 python scripts/_probe_r5g.py  (background)
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

from hnsw_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()


class V:
    qps_scan_safe = False

    def __init__(self, idx, ef, expand):
        self.idx, self.ef, self.expand = idx, ef, expand
        self.corpus = idx.corpus

    def search_batch(self, q, k, mode="balanced"):
        self.idx.expand = self.expand
        return self.idx.search_batch(q, k, mode, ef=self.ef)


def main():
    import bench
    from hnsw_tpu.bench.harness import run_search_benchmark
    from hnsw_tpu.models import build_hnsw_index
    from hnsw_tpu.models.flat import FlatIndex

    n = 1_000_000
    corpus, sample = bench.make_corpus_device(7, n, 768)
    t0 = time.perf_counter()
    idx = build_hnsw_index(corpus, M=24, hierarchy=False, pack_dim=128,
                           large_probe_clusters=4, large_refine_rounds=3,
                           expand=8)
    idx.entry_sample = 2048
    idx.PACK_BYTES_CAP = 8 << 30
    print(f"build(M=24, refine=3) {time.perf_counter()-t0:.1f}s", flush=True)

    exact = FlatIndex(corpus)
    _, er = exact.search_batch(sample[:1024], 10)
    er = np.asarray(er)

    for ef, e in ((150, 8), (200, 8), (200, 16), (300, 16)):
        try:
            v = V(idx, ef, e)
            _, ar = v.search_batch(sample[:1024], 10)
            ar = np.asarray(ar)
            rec = np.mean([len(set(a.tolist()) & set(x.tolist())) / 10.0
                           for a, x in zip(ar, er)])
            perf = run_search_benchmark(v, sample[:1024], k=10,
                                        batch_size=1024, warmup=1, iters=4,
                                        single_query_iters=0)
            print(f"M24 ef={ef} e={e}: recall={rec:.4f} "
                  f"qps={perf.get('qps_device') or 0:.0f}", flush=True)
        except Exception as ex:
            print(f"ef={ef} e={e}: {type(ex).__name__}: {ex}", flush=True)


if __name__ == "__main__":
    main()
