#!/usr/bin/env python3
"""Structured-embedding recall fixture (VERDICT r17 #4).

Every RECALL_r* number so far rides the driver's synthetic embeddings:
isotropic cluster noise, whose IVF residuals are near-isotropic — the
product-quantization WORST case (RECALL_r17's provenance says so
itself). Real learned embeddings are not like that: their covariance
spectra decay roughly as a power law (documented for word-vector and
transformer embedding matrices alike), so most energy sits in a few
directions and per-subspace codebooks have structure to code. This
script generates that shape, deterministically, with the driver's
embeddings schema (vec_id int64, embedding list<float32>, label
int32), so the SAME RecallLadder runs on both fixtures and RECALL_r18
can carry the ivf/adc/hamming families per embedding shape.

Model: lambda_d = d^-alpha (d = 1..64, alpha default 1.0);
  centers  c_k  ~ N(0, diag(lambda)),  k < K
  vectors  x_i  = normalize(c_{l(i)} + 0.5 * eps_i),
                  eps_i ~ N(0, diag(lambda))
Noise shares the decaying spectrum, so coarse-quantizer RESIDUALS stay
anisotropic — the property ADC's codebooks exploit.

Usage: python3 scripts/gen_structured_emb.py <outdir> <n_vecs>
           <n_clusters> [alpha]
e.g.   python3 scripts/gen_structured_emb.py target/semb10 200000 100
"""
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

OUT = sys.argv[1]
N = int(sys.argv[2])
K = int(sys.argv[3])
ALPHA = float(sys.argv[4]) if len(sys.argv) > 4 else 1.0
DIM = 64
SEED = 4242

rng = np.random.default_rng(SEED)
os.makedirs(OUT, exist_ok=True)

lam = np.arange(1, DIM + 1, dtype=np.float64) ** (-ALPHA)
sd = np.sqrt(lam)
centers = rng.normal(size=(K, DIM)) * sd
labels = rng.integers(0, K, N)
vecs = centers[labels] + 0.5 * rng.normal(size=(N, DIM)) * sd
vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)

tbl = pa.table({
    "vec_id": pa.array(range(N), pa.int64()),
    "embedding": pa.array(vecs.astype(np.float32).tolist(),
                          pa.list_(pa.float32())),
    "label": pa.array(labels.astype(np.int32), pa.int32()),
})
pq.write_table(tbl, f"{OUT}/embeddings.parquet")
print(f"wrote {OUT}: embeddings={N} clusters={K} alpha={ALPHA}")
