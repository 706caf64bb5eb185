"""Native C++ corpus parser: builds with g++, agrees with the Python json
loader byte for byte, and the loader picks it for large files."""

import json

import numpy as np
import pytest

from hnsw_tpu.io.native import get_lib, parse_corpus
from hnsw_tpu.io.loader import load_json_corpus


def _write_corpus(path, n=50, d=12, with_text=True):
    rng = np.random.default_rng(3)
    verses = []
    for i in range(n):
        v = {"id": f"Bk_{i}:1",
             "embedding": rng.standard_normal(d).round(6).tolist()}
        if with_text:
            v["text"] = f'verse "quoted" number {i}\nwith newline'
        verses.append(v)
    with open(path, "w") as f:
        json.dump({"metadata": {"dimensions": d}, "verses": verses}, f)
    return verses


def test_native_builds():
    assert get_lib() is not None, "g++ build of fast_corpus failed"


def test_native_matches_python(tmp_path):
    p = str(tmp_path / "c.json")
    verses = _write_corpus(p)
    parsed = parse_corpus(p)
    assert parsed is not None
    emb, ids, texts = parsed
    assert ids == [v["id"] for v in verses]
    np.testing.assert_allclose(
        emb, np.asarray([v["embedding"] for v in verses], np.float32),
        rtol=1e-6)
    assert "quoted" in texts[0] and "\n" not in texts[0]


def test_loader_uses_native_for_large_files(tmp_path, monkeypatch):
    p = str(tmp_path / "big.json")
    _write_corpus(p, n=200, d=64)
    # force the "large file" branch regardless of actual size
    import hnsw_tpu.io.loader as loader_mod
    monkeypatch.setattr(loader_mod.os.path, "getsize", lambda _: 10 << 20)
    pairs, texts, meta = load_json_corpus(p)
    assert len(pairs) == 200 and pairs[5][0] == "Bk_5:1"
    assert pairs[5][1].shape == (64,)


def test_loader_falls_back_on_schema_mismatch(tmp_path, monkeypatch):
    p = str(tmp_path / "odd.json")
    with open(p, "w") as f:
        json.dump({"vectors": [{"id": "x", "embedding": [1.0, 2.0]},
                               {"id": "y", "embedding": [3.0]}]}, f)  # ragged
    import hnsw_tpu.io.loader as loader_mod
    monkeypatch.setattr(loader_mod.os.path, "getsize", lambda _: 10 << 20)
    # native rejects inconsistent dims -> python path raises nothing here
    pairs, _, _ = load_json_corpus(p)
    assert pairs[0][0] == "x"
