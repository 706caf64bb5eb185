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
