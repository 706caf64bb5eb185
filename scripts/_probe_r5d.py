"""Round-5 probe d: large-N graph rehearsal on the real chip.

Validates the device-resident bucketed builder (build_large.py rewrite) and
the int8 packed-neighborhood search path at scale, ahead of the driver's
bench run: build (stage-ticked) + turbo/fast recall + device QPS.

Run: timeout 590 python scripts/_probe_r5d.py 500000
     timeout 590 python scripts/_probe_r5d.py 1000000
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import numpy as np

from hnsw_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    import bench
    from hnsw_tpu.bench.harness import run_search_benchmark
    from hnsw_tpu.models import build_hnsw_index
    from hnsw_tpu.models.flat import FlatIndex

    t0 = time.perf_counter()
    corpus, sample = bench.make_corpus_device(7, n, 768)
    print(f"corpus staged {time.perf_counter()-t0:.1f}s", flush=True)

    marks = []
    t0 = time.perf_counter()
    idx = build_hnsw_index(
        corpus, M=16, hierarchy=False, pack_dim=128,
        large_probe_clusters=4, large_refine_rounds=2,
        progress=lambda s, f: marks.append((s, f, time.perf_counter())))
    build_s = time.perf_counter() - t0
    stages = {}
    for (s0, _, ta), (_, _, tb) in zip(marks, marks[1:]):
        key = s0.rstrip("0123456789")
        stages[key] = round(stages.get(key, 0.0) + (tb - ta), 2)
    print(f"build {build_s:.1f}s stages={stages}", flush=True)

    exact = FlatIndex(corpus)
    _, er = exact.search_batch(sample[:1024], 10)
    er = np.asarray(er)
    for mode in ("turbo", "fast"):
        t0 = time.perf_counter()
        _, ar = idx.search_batch(sample[:1024], 10, mode)
        ar = np.asarray(ar)
        rec = np.mean([len(set(a.tolist()) & set(x.tolist())) / 10.0
                       for a, x in zip(ar, er)])
        print(f"pack dtype={idx._nbr_pack.dtype if idx._nbr_pack is not None else None} "
              f"kernel_path first-call {time.perf_counter()-t0:.1f}s",
              flush=True)
        perf = run_search_benchmark(idx, sample[:1024], k=10, mode=mode,
                                    batch_size=1024, warmup=1, iters=4,
                                    single_query_iters=0)
        print(f"{mode}: recall={rec:.4f} "
              f"qps={perf.get('qps_device') or 0:.0f}", flush=True)
        if rec >= 0.98:
            break


if __name__ == "__main__":
    main()
