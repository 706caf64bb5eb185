"""Round-5 probe k: does a 4th NN-descent round push 1M balanced over 0.98?

Run 4 recorded the 1M ladder at refine=3: balanced (ef=200) 0.9797 —
0.0003 under the bar, so the row fell to accurate (0.988 @ 12.5k). If one
more refine round clears 0.98 at balanced, the recorded 1M graph QPS
roughly doubles (~19k at ef=200, probe r5i).

Run: timeout 1100 python scripts/_probe_r5k.py  (background)
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

from hnsw_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()


def main():
    import bench
    from hnsw_tpu.bench.harness import run_search_benchmark
    from hnsw_tpu.models import build_hnsw_index
    from hnsw_tpu.models.flat import FlatIndex

    n = 1_000_000
    corpus, sample = bench.make_corpus_device(7, n, 768)
    t0 = time.perf_counter()
    idx = build_hnsw_index(corpus, M=16, hierarchy=False, pack_dim=128,
                           large_probe_clusters=4, large_refine_rounds=4)
    idx.entry_sample = 2048
    print(f"build(refine=4) {time.perf_counter()-t0:.1f}s", flush=True)

    exact = FlatIndex(corpus)
    _, er = exact.search_batch(sample[:1024], 10)
    er = np.asarray(er)
    for mode in ("balanced", "accurate"):
        _, ar = idx.search_batch(sample[:1024], 10, mode)
        ar = np.asarray(ar)
        rec = np.mean([len(set(a.tolist()) & set(x.tolist())) / 10.0
                       for a, x in zip(ar, er)])
        perf = run_search_benchmark(idx, sample[:1024], k=10, mode=mode,
                                    batch_size=1024, warmup=1, iters=4,
                                    single_query_iters=0)
        print(f"refine4 {mode}: recall={rec:.4f} "
              f"qps={perf.get('qps_device') or 0:.0f}", flush=True)


if __name__ == "__main__":
    main()
