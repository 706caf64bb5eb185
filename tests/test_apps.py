"""App-layer smoke tests: interactive shell internals (non-interactive) and
the bench CLI's small modes — the reference's main.clj / bench.clj UX."""

import io
import json
import sys

import numpy as np
import pytest


def test_shell_seed_and_query(tmp_path, monkeypatch, capsys):
    from hnsw_tpu.apps.shell import SearchShell

    # small bible-style corpus file
    rng = np.random.default_rng(0)
    verses = []
    for i in range(60):
        emb = rng.standard_normal(24)
        emb /= np.linalg.norm(emb)
        verses.append({"id": f"Gen_1:{i}", "text": f"verse number {i} words",
                       "embedding": emb.tolist()})
    p = str(tmp_path / "corpus.json")
    with open(p, "w") as f:
        json.dump({"metadata": {}, "verses": verses}, f)

    shell = SearchShell(p, index_type="flat")
    assert shell.find_seed("number 7 ") == "Gen_1:7"
    shell.query("number 7 ", k=3)
    out = capsys.readouterr().out
    assert "Gen_1:7" in out and "%" in out
    shell.stats()
    assert "flat" in capsys.readouterr().out

    # mode switching accepts both numbers and names (main.clj mode 1-3)
    from hnsw_tpu.config import Mode
    shell.mode = Mode.TURBO
    shell.recall()
    assert "recall@10" in capsys.readouterr().out


def test_shell_synthetic_fallback(capsys):
    from hnsw_tpu.apps.shell import SearchShell

    shell = SearchShell(None, index_type="flat", n_synthetic=80)
    assert shell.data.shape[0] == 80
    assert shell.find_seed("doc_5") == "doc_5"


def test_cli_demo_mode(monkeypatch, capsys):
    from hnsw_tpu.bench import cli

    monkeypatch.setattr(cli, "load_or_generate",
                        lambda n, dim=768: _unit(n, 48))
    rc = cli.main(["demo", "lightning", "300"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "lightning" in out and "recall@10" in out


def _unit(n, d):
    rng = np.random.default_rng(1)
    x = rng.standard_normal((min(n, 300), d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)
