"""Bisect the ef<=128 per-hop pathology on TPU: run the full search at
ef=100 with individual body pieces ablated (untracked dev script)."""
import sys
import time

sys.path.insert(0, "/root/repo")
from hnsw_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

import hnsw_tpu.models.hnsw.search as S
from bench import make_corpus, K
from hnsw_tpu.models import build_hnsw_index
from hnsw_tpu.types import Corpus

print("backend:", jax.default_backend(), flush=True)
data = make_corpus()
corpus = Corpus.from_array(data)
hnsw = build_hnsw_index(corpus, M=16)
jax.block_until_ready(hnsw.graph.adj0)
print("built", flush=True)

q = corpus.pad_queries(data[:1024])
entries, _ = S.sample_entries(corpus.vectors, corpus.sq_norms,
                              hnsw._entry_rows(), q, metric=corpus.metric)
vl = corpus.vectors.astype(jnp.bfloat16)
pack, psq = S.pack_neighbors(vl, corpus.sq_norms, hnsw.graph.adj0)
jax.block_until_ready(pack)

orig_dedupe = S._dedupe_row
orig_merge = S._beam_merge


def timed_search(ef, tag):
    fn = S.hnsw_search_batch.__wrapped__

    def call():
        d, r = fn(corpus.vectors, corpus.sq_norms, hnsw.graph.adj0,
                  hnsw.graph.adj_upper[:0], entries, q, k=K, ef=ef,
                  metric=corpus.metric, precision="default", vectors_lp=vl,
                  nbr_pack=pack, nbr_sq=psq)
        return d

    jf = jax.jit(call)
    float(jf()[0, 0])
    t0 = time.perf_counter()
    for _ in range(6):
        d = jf()
    float(d[0, 0])
    per = (time.perf_counter() - t0) / 6
    print(f"{tag} ef={ef}: {per*1e3:.1f} ms/batch "
          f"({per/ (ef//4+12) * 1e3:.2f} ms/hop-cap)", flush=True)


timed_search(100, "full")

S._dedupe_row = lambda ids, valid: valid
timed_search(100, "no-dedupe")
S._dedupe_row = orig_dedupe


def merge_topk(beam_d, beam_i, beam_e, cand_d, cand_i, ef):
    from hnsw_tpu.ops.topk import top_k_ascending
    all_d = jnp.concatenate([beam_d, cand_d], axis=-1)
    all_i = jnp.concatenate([beam_i, cand_i], axis=-1)
    all_e = jnp.concatenate([beam_e, jnp.zeros(cand_d.shape, bool)], axis=-1)
    kd, sel = top_k_ascending(all_d, ef)
    return (kd, jnp.take_along_axis(all_i, sel, axis=-1),
            jnp.take_along_axis(all_e, sel, axis=-1))


S._beam_merge = merge_topk
timed_search(100, "xla-topk-merge")
S._beam_merge = orig_merge

timed_search(200, "full")
print("done", flush=True)
