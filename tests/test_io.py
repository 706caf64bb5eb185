"""Data pipeline tests: synthetic generator determinism (seeded like
data_generator.clj), JSON corpus loader schema, dataset save/load."""

import json

import numpy as np

from hnsw_tpu.io.datagen import (
    DIMENSION_PRESETS, SIZE_PRESETS, add_noise, cosine_similarity,
    generate_vectors, load_dataset, save_dataset, vector_distance,
)
from hnsw_tpu.io.loader import get_best_available_data, load_json_corpus


def test_generator_deterministic():
    a = generate_vectors(50, 16, seed=7)
    b = generate_vectors(50, 16, seed=7)
    np.testing.assert_array_equal(a, b)
    c = generate_vectors(50, 16, seed=8)
    assert not np.array_equal(a, c)


def test_generator_presets_and_distributions():
    x = generate_vectors("tiny", "minilm")
    assert x.shape == (SIZE_PRESETS["tiny"], DIMENSION_PRESETS["minilm"])
    u = generate_vectors(20, 8, distribution="unit")
    np.testing.assert_allclose(np.linalg.norm(u, axis=1), 1.0, atol=1e-5)
    cl = generate_vectors(100, 8, distribution="clustered", num_clusters=3,
                          noise=0.01)
    assert cl.shape == (100, 8)
    idx = generate_vectors(5, 4, fmt="indexed")
    assert idx[0][0] == "vec_0" and idx[0][1].shape == (4,)


def test_dataset_roundtrip(tmp_path):
    x = generate_vectors(10, 6)
    p = str(tmp_path / "ds.json")
    save_dataset(p, x, metadata={"note": "test"})
    vecs, ids, meta = load_dataset(p)
    np.testing.assert_allclose(vecs, x, atol=1e-6)
    assert ids[3] == "vec_3"
    assert meta["note"] == "test" and meta["count"] == 10


def test_json_corpus_loader(tmp_path):
    # bible-style schema (export_complete_bible.py:73-128)
    corpus = {
        "metadata": {"model": "test"},
        "verses": [
            {"id": "Gen_1:1", "text": "In the beginning",
             "embedding": [0.1, 0.2]},
            {"id": "Gen_1:2", "text": "And the earth",
             "embedding": [0.3, 0.4]},
        ],
    }
    p = str(tmp_path / "bible.json")
    with open(p, "w") as f:
        json.dump(corpus, f)
    pairs, texts, meta = load_json_corpus(p)
    assert pairs[0][0] == "Gen_1:1"
    np.testing.assert_allclose(pairs[1][1], [0.3, 0.4])
    assert texts["Gen_1:1"] == "In the beginning"
    assert meta["model"] == "test"


def test_fallback_chain(tmp_path):
    assert get_best_available_data(base_dir=str(tmp_path)) is None
    p = tmp_path / "b.json"
    with open(p, "w") as f:
        json.dump({"vectors": [{"id": "x", "embedding": [1.0]}]}, f)
    found = get_best_available_data(candidates=["b.json"],
                                    base_dir=str(tmp_path))
    assert found is not None and found[0][0][0] == "x"


def test_ground_truth_helpers():
    assert abs(vector_distance([0, 0], [3, 4]) - 5.0) < 1e-9
    assert abs(cosine_similarity([1, 0], [-1, 0]) + 1.0) < 1e-9
    x = np.ones((3, 4), np.float32)
    y = add_noise(x, 0.1, seed=1)
    assert y.shape == x.shape and not np.array_equal(x, y)


def test_simple_api_metadata_persists(tmp_path):
    """Index.save stores the metadata table in the artifact and load
    restores it — closing the reference's load-requires-resupplying-metadata
    trap (index_io.clj:10-39, VERDICT r2 missing #5)."""
    from hnsw_tpu.api.simple import Index

    idx = Index(dimensions=8, index_type="flat")
    rng = np.random.default_rng(0)
    for i in range(20):
        idx.add(f"doc{i}", rng.standard_normal(8),
                metadata={"title": f"t{i}", "n": i})
    p = idx.save(str(tmp_path / "meta_idx"))
    loaded = Index.load(p)
    assert loaded.metadata["doc3"] == {"title": "t3", "n": 3}
    hits = loaded.search(rng.standard_normal(8), k=3)
    assert all("metadata" in h for h in hits)
    # explicit metadata argument overrides stored entries
    loaded2 = Index.load(p, metadata={"doc3": {"title": "override"}})
    assert loaded2.metadata["doc3"] == {"title": "override"}
    assert loaded2.metadata["doc4"] == {"title": "t4", "n": 4}


def test_dir_format_mmap_roundtrip(tmp_path):
    """format="dir" writes raw .npy files; load maps them with numpy mmap
    and stages the corpus in chunks (Corpus.from_array_streamed) — the
    completed form of the reference's mmap prototype
    (wip/ultra_optimized.clj:196-242). Results must match the npz load."""
    from hnsw_tpu.io.persist import index_exists, load_index, save_index
    from hnsw_tpu.models import build_hnsw_index

    x = generate_vectors(300, 16, distribution="clustered", num_clusters=4,
                         seed=5)
    idx = build_hnsw_index(x, M=8)
    p = save_index(idx, str(tmp_path / "g"), format="dir",
                   metadata={"k": "v"})
    assert p.endswith(".idx") and index_exists(str(tmp_path / "g"))
    # force the streamed path with a tiny chunk size
    loaded, meta = load_index(p, return_metadata=True, stream_chunk_rows=64)
    assert meta == {"k": "v"}
    assert loaded.corpus.n == 300 and loaded.corpus.dim == 16
    d0, r0 = (np.asarray(a) for a in idx.search_batch(x[:8], 5))
    d1, r1 = (np.asarray(a) for a in loaded.search_batch(x[:8], 5))
    np.testing.assert_array_equal(r0, r1)
    np.testing.assert_allclose(d0, d1, atol=1e-5)


def test_streamed_corpus_matches_from_array():
    from hnsw_tpu.types import Corpus

    x = generate_vectors(500, 20, seed=11)
    a = Corpus.from_array(x)
    b = Corpus.from_array_streamed(x, chunk_rows=128)
    np.testing.assert_array_equal(np.asarray(a.vectors), np.asarray(b.vectors))
    np.testing.assert_allclose(np.asarray(a.sq_norms), np.asarray(b.sq_norms))
    assert (a.n, a.dim) == (b.n, b.dim)
