#!/usr/bin/env python3
"""Scale-smoke data generator: an sf1-shaped dataset (10x sf0.1) for the
tables the iterative/wide queries read (documents, embeddings, events).

The driver generates /root/testdata/sf{0.001,0.01,0.1} (read-only; no
generator script is shipped), so the 10x set is synthesized here with
the same SCHEMAS and the same statistical shape as sf0.1 — word-salad
texts over the same 31-word vocab with exact- and near-duplicate
structure, unit-norm 64-dim embeddings in 10 clusters, 30 days of
events with uniform types — seeded and deterministic. Statistical
equivalence is all the scale smoke needs: it measures wall-time
SCALING and convergence-round counts, not oracle hashes.

Usage: python3 scripts/gen_sf1.py [outdir] [mult] [n_clusters]
  outdir default target/sf1; mult = size multiple of sf0.1 (default 10
  = sf1; 100 = an sf10-shaped set for the 100x scaling series).
  n_clusters (default 10, the driver shape) sets embedding label
  cardinality — pass e.g. mult/10 * 10 to let keys GROW with the
  corpus, the realistic shape for per-key operators (h4): real corpora
  grow entities with data, and a fixed key count concentrates per-tree
  growth instead of spreading it across partitions.
"""
import json
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

OUT = sys.argv[1] if len(sys.argv) > 1 else "target/sf1"
MULT = float(sys.argv[2]) if len(sys.argv) > 2 else 10.0
N_CLUSTERS = int(sys.argv[3]) if len(sys.argv) > 3 else 10
SEED = 42
N_DOCS = int(5_000 * MULT)      # sf0.1 has 5,000
N_VECS = int(2_000 * MULT)      # sf0.1 has 2,000
N_EVENTS = int(100_000 * MULT)  # sf0.1 has 100,000
N_USERS = int(1_500 * MULT)     # sf0.1 has 1,500 (constant per-user rate)

VOCAB = np.array(sorted(
    "a agg batch big column customer data dup fast filter group hash join "
    "key line merge order part query row scan slow small sort spark stream "
    "table value window write zip".split()))
assert len(VOCAB) == 31
LANGS = (["en"] * 4 + ["zh", "es", "fr", "de"] * 2)  # ~40% en like sf0.1

rng = np.random.default_rng(SEED)
os.makedirs(OUT, exist_ok=True)


def documents():
    texts = []
    for i in range(N_DOCS):
        r = rng.random()
        if i > 100 and r < 0.002:            # exact duplicate of an earlier doc
            texts.append(texts[rng.integers(0, i)])
            continue
        if i > 100 and r < 0.022:            # near duplicate: 1-2 token edits
            base = texts[rng.integers(0, i)].split()
            for _ in range(int(rng.integers(1, 3))):
                base[rng.integers(0, len(base))] = str(VOCAB[rng.integers(0, 31)])
            texts.append(" ".join(base))
            continue
        n = int(rng.integers(10, 101))
        texts.append(" ".join(VOCAB[rng.integers(0, 31, n)]))
    langs = [LANGS[int(x)] for x in rng.integers(0, len(LANGS), N_DOCS)]
    srcs = [f"src{int(x)}" for x in rng.integers(0, 20, N_DOCS)]
    tbl = pa.table({
        "doc_id": pa.array(range(N_DOCS), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
        "source": pa.array(srcs, pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })
    pq.write_table(tbl, f"{OUT}/documents.parquet")


def embeddings():
    centers = rng.normal(size=(N_CLUSTERS, 64))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = rng.integers(0, N_CLUSTERS, N_VECS)
    vecs = centers[labels] + rng.normal(scale=0.25, size=(N_VECS, 64))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    tbl = pa.table({
        "vec_id": pa.array(range(N_VECS), pa.int64()),
        "embedding": pa.array(vecs.astype(np.float32).tolist(),
                              pa.list_(pa.float32())),
        "label": pa.array(labels.astype(np.int32), pa.int32()),
    })
    pq.write_table(tbl, f"{OUT}/embeddings.parquet")


def events():
    base = np.datetime64("2024-01-01T00:00:00", "us")
    span_us = 30 * 86_400 * 1_000_000
    ts = np.sort(rng.integers(0, span_us, N_EVENTS))
    types = np.array(["view", "click", "purchase", "signup", "error"])
    tbl = pa.table({
        "event_id": pa.array(range(N_EVENTS), pa.int64()),
        "ts": pa.array(base + ts.astype("timedelta64[us]"),
                       pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, N_USERS, N_EVENTS), pa.int64()),
        "event_type": pa.array(types[rng.integers(0, 5, N_EVENTS)], pa.string()),
        "value": pa.array(np.round(rng.exponential(100.0, N_EVENTS), 2),
                          pa.float64()),
        "props": pa.array([json.dumps({"k": int(k)})
                           for k in rng.integers(0, 100, N_EVENTS)], pa.string()),
    })
    pq.write_table(tbl, f"{OUT}/events.parquet")


documents()
embeddings()
events()
print(f"wrote {OUT}: documents={N_DOCS} embeddings={N_VECS} events={N_EVENTS}")
