#!/usr/bin/env python3
"""Single-node throughput of the REFERENCE implementation, executed.

Times /root/reference/meercat/grinch_alg.py (numpy float32, the same
import scaffolding as the golden generators) building its dendrogram +
flat-clustering over the sf0.1 embeddings fixture (2,000 x 64 float32)
with the h1 driver config (dot / l2 / active_leaf_limit=200,
rotate/graft caps 100) — the exact workload `graft.RefCompare` times on
the engine side. min-of-N wall seconds, JSON on stdout.

The reference's other clustering CLI (nn_thresh / baseline / combo)
imports torch, which this container does not ship, so GRINCH is the
one reference engine that can execute here; it is also the heaviest.
"""
import json
import sys
import time
import types

import numpy as np
import pandas as pd

_scipy = types.ModuleType('scipy')
_spatial = types.ModuleType('scipy.spatial')
_distance = types.ModuleType('scipy.spatial.distance')


def _cdist_stub(*args, **kwargs):
    raise RuntimeError('cdist stubbed; only sim="dot" configs supported')


_distance.cdist = _cdist_stub
_spatial.distance = _distance
_scipy.spatial = _spatial
sys.modules.setdefault('scipy', _scipy)
sys.modules.setdefault('scipy.spatial', _spatial)
sys.modules.setdefault('scipy.spatial.distance', _distance)
_tqdm = types.ModuleType('tqdm')
_tqdm.tqdm = lambda it, *a, **k: it
sys.modules.setdefault('tqdm', _tqdm)

sys.path.insert(0, '/root/reference')
from meercat.grinch_alg import Grinch  # noqa: E402

FIXTURE = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.1/embeddings.parquet'
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 2


def main():
    df = pd.read_parquet(FIXTURE).sort_values('vec_id').reset_index(drop=True)
    pts = np.stack(df['embedding'].to_numpy()).astype(np.float32)
    build_s, flat_s = [], []
    n_clusters = None
    for _ in range(ITERS):
        g = Grinch(points=pts, rotate_cap=100, graft_cap=100, sim='dot',
                   norm='l2', active_leaf_limit=200,
                   pruning_strategy='least_recent')
        t0 = time.perf_counter()
        g.build_dendrogram()
        build_s.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        flat = g.flat_clustering(0.25)
        flat_s.append(time.perf_counter() - t0)
        n_clusters = int(len(np.unique(flat)))
    print(json.dumps({
        'engine': 'reference-python', 'workload': 'grinch_build+flat(0.25)',
        'n': int(pts.shape[0]), 'dim': int(pts.shape[1]), 'limit': 200,
        'build_sec': round(min(build_s), 3), 'flat_sec': round(min(flat_s), 3),
        'n_clusters': n_clusters, 'iters': ITERS}))


if __name__ == '__main__':
    main()
