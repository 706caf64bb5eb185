#!/usr/bin/env python
"""Offline embedding generation — the data pipeline of the reference's
scripts/export_complete_bible.py:73-128: TSV corpus -> sentence-transformer
embeddings (768-dim, L2-normalized, batch 64) -> the JSON schema that
hnsw_tpu.io.loader reads:

  {"metadata": {...}, "verses": [{"id", "book", "chapter", "verse",
                                  "text", "embedding"}, ...]}

Requires a locally available HF model (zero-egress environments must have it
pre-downloaded); falls back to an error message with instructions otherwise.

Usage: python scripts/generate_embeddings.py corpus.tsv out.json \
           [--model sentence-transformers/paraphrase-multilingual-mpnet-base-v2]

TSV format: book<TAB>chapter<TAB>verse<TAB>text (one verse per line).
"""

import argparse
import json
import sys


def embed_texts(texts, model_name: str, batch_size: int = 64):
    try:
        import numpy as np
        import torch
        from transformers import AutoModel, AutoTokenizer
    except ImportError as e:
        raise SystemExit(f"transformers/torch required: {e}")
    try:
        tok = AutoTokenizer.from_pretrained(model_name)
        model = AutoModel.from_pretrained(model_name)
    except Exception as e:
        raise SystemExit(
            f"model {model_name!r} not available locally ({e}); pre-download "
            "it or point --model at a local path")
    model.eval()
    out = []
    with torch.no_grad():
        for i in range(0, len(texts), batch_size):
            batch = texts[i: i + batch_size]
            enc = tok(batch, padding=True, truncation=True, max_length=256,
                      return_tensors="pt")
            hidden = model(**enc).last_hidden_state       # [B, T, H]
            mask = enc["attention_mask"].unsqueeze(-1).float()
            emb = (hidden * mask).sum(1) / mask.sum(1)     # mean pooling
            emb = torch.nn.functional.normalize(emb, dim=-1)  # normalized,
            # like export_complete_bible.py:91
            out.append(emb.cpu().numpy())
    import numpy as np
    return np.concatenate(out, axis=0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("tsv")
    ap.add_argument("out_json")
    ap.add_argument("--model", default="sentence-transformers/"
                    "paraphrase-multilingual-mpnet-base-v2")
    args = ap.parse_args()

    verses = []
    with open(args.tsv) as f:
        for line in f:
            parts = line.rstrip("\n").split("\t")
            if len(parts) < 4:
                continue
            book, chapter, verse, text = parts[0], parts[1], parts[2], parts[3]
            verses.append({"id": f"{book}_{chapter}:{verse}", "book": book,
                           "chapter": int(chapter), "verse": int(verse),
                           "text": text})
    print(f"{len(verses)} verses")
    emb = embed_texts([v["text"] for v in verses], args.model)
    for v, e in zip(verses, emb):
        v["embedding"] = e.tolist()
    payload = {
        "metadata": {"model": args.model, "dimensions": int(emb.shape[1]),
                     "count": len(verses), "normalized": True},
        "verses": verses,
    }
    with open(args.out_json, "w") as f:
        json.dump(payload, f)
    print(f"wrote {args.out_json}")


if __name__ == "__main__":
    sys.exit(main())
