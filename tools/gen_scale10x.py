#!/usr/bin/env python3
"""Generate a 10x documents/embeddings corpus mirroring TESTDATA.md's shape
(same schemas and statistics as /root/testdata/sf0.1, 10x the rows) for the
scale-headroom probe (graft.ScaleProbe). Deterministic (seed 7).

Usage: python3 tools/gen_scale10x.py [outDir=/tmp/scale10x] [mult=10]
"""
import sys
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale10x"
mult = int(sys.argv[2]) if len(sys.argv) > 2 else 10

N_DOCS = 5000 * mult
N_VECS = 2000 * mult
DIM = 64
rng = np.random.default_rng(7)

vocab = ("spark line column order small sort fast value scan table query hash "
         "key group filter stream batch part agg vector customer slow the a "
         "join shuffle write read codec merge").split()
langs = np.array(["en", "en", "en", "zh", "de"])

import os
os.makedirs(out, exist_ok=True)

# documents: word-salad 10-99 tokens, ~2/1000 near-duplicate pairs (one-token
# mutation of an earlier doc) so the MinHash plane has real work at 10x
texts = []
n_tok = rng.integers(10, 100, size=N_DOCS)
for i in range(N_DOCS):
    if i > 0 and rng.random() < 0.002:
        words = texts[i - 1].split(" ")
        words[rng.integers(0, len(words))] = vocab[rng.integers(0, len(vocab))]
        texts.append(" ".join(words))
    else:
        texts.append(" ".join(rng.choice(vocab, size=n_tok[i])))
doc_tbl = pa.table({
    "doc_id": pa.array(np.arange(N_DOCS), pa.int64()),
    "text": pa.array(texts, pa.string()),
    "lang": pa.array(rng.choice(langs, size=N_DOCS), pa.string()),
    "source": pa.array([f"src{i % 10}" for i in range(N_DOCS)], pa.string()),
    "n_chars": pa.array([len(t) for t in texts], pa.int64()),
})
pq.write_table(doc_tbl, f"{out}/documents.parquet")

emb = rng.normal(0, 1, size=(N_VECS, DIM)).astype(np.float32)
emb_tbl = pa.table({
    "vec_id": pa.array(np.arange(N_VECS), pa.int64()),
    "embedding": pa.array(list(emb), pa.list_(pa.float32())),
    "label": pa.array(rng.integers(0, 10, size=N_VECS), pa.int32()),
})
pq.write_table(emb_tbl, f"{out}/embeddings.parquet")
print(f"wrote {N_DOCS} docs, {N_VECS} vecs to {out}")
