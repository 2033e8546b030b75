#!/usr/bin/env python3
"""Float-GRINCH driver-config goldens: EXECUTE the reference
implementation (/root/reference/meercat/grinch_alg.py via the same
import scaffolding as gen_grinch_goldens.py, plus dendrogram_purity's
accumulate_purity) on the sf0.01 embeddings fixture with the EXACT
configs of the five no-oracle driver queries, and record their outputs:

  h1_flat   flat clustering at theta=0.25, active_leaf_limit=200,
            sim='dot', norm='l2' (= QueriesGrinch.h1 / the h2/h3 build),
            relabelled by first occurrence in vec_id order
  h3_purity dendrogram purity of the same build w.r.t. the label column
  h4_<k>    per-label builds (same params), flat at 0.25, relabelled
  st2_flat  the streaming-GRINCH config: vec_id < 50, no leaf limit,
            flat at 0.25, relabelled

The driver cannot oracle-check these five queries (the float tree
automaton has no SQL form); this recorded execution of the REFERENCE on
the same fixture is their parity channel. Assignment-level (not
node-level) equality is pinned: the reference accumulates similarities
in float32 (numpy sgemm) while the engine accumulates in double, so a
near-tie can flip in the last ulp without changing any cluster
(GrinchGoldenSpec documents the same caveat for its 24-point cases).

Output: src/test/resources/grinch_driver_goldens.tsv
  h1_flat<TAB>c0,c1,...          (index = position in vec_id order)
  h3_purity<TAB><repr float>
  h4_<label><TAB>c0,c1,...       (index = position in the key's vec_id order)
  st2_flat<TAB>c0,c1,...
"""
import sys
import types

import numpy as np
import pandas as pd

# -- stub scipy/tqdm exactly like gen_grinch_goldens.py (sim='dot' only)
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
from meercat.dendrogram_purity import Node, accumulate_purity  # noqa: E402

FIXTURE = '/root/testdata/sf0.01/embeddings.parquet'
OUT = 'src/test/resources/grinch_driver_goldens.tsv'

# Provenance (round 17): the reference is not a git checkout, so the
# executed sources are pinned by content hash. GrinchGoldenSpec
# recomputes these hashes at test time — if the reference files drift,
# the goldens are flagged stale instead of silently standing in for a
# different implementation.
REF_FILES = [
    '/root/reference/meercat/grinch_alg.py',
    '/root/reference/meercat/dendrogram_purity.py',
]
CONFIG = ('rotate_cap=100,graft_cap=100,sim=dot,norm=l2,theta=0.25,'
          'h1_limit=200,h4_limit=200,st2_limit=None,st2_n=50')


def _sha256(path):
    import hashlib
    h = hashlib.sha256()
    with open(path, 'rb') as f:
        for chunk in iter(lambda: f.read(1 << 20), b''):
            h.update(chunk)
    return h.hexdigest()


def canon(assign):
    seen = {}
    return [seen.setdefault(c, len(seen)) for c in assign]


def build(points, limit):
    g = Grinch(points=points, rotate_cap=100, graft_cap=100, sim='dot',
               norm='l2', active_leaf_limit=limit,
               pruning_strategy='least_recent')
    g.build_dendrogram()
    return g


def purity(g, labels):
    """dendrogram_purity.accumulate_purity over the reference build's
    LIVE tree (leaves 0..n-1 + internals with parent != -2), the same
    node set the engine's Grinch.treeNodes emits for Trees.purityAuto.
    Children order is irrelevant: the pair product is symmetric.
    """
    n = g.num_points
    live = list(range(n)) + [j for j in range(n, g.next_node_id)
                             if g.parents[j] != -2]
    nodes = {u: Node(uid=str(u)) for u in live}
    root = None
    for u in live:
        p = int(g.parents[u])
        if p == -1:
            root = nodes[u]
        else:
            nodes[u].parent = nodes[p]
            nodes[p].children.append(nodes[u])
    for i in range(n):
        nodes[i].histogram[str(labels[i])] += 1
    return accumulate_purity(root)


def main():
    df = pd.read_parquet(FIXTURE).sort_values('vec_id').reset_index(drop=True)
    pts = np.stack(df['embedding'].to_numpy()).astype(np.float32)
    labels = df['label'].to_numpy()

    lines = []

    # h1 / h2 / h3 share one build: limit=200 over all 500 points
    g = build(pts, limit=200)
    h1 = canon(g.flat_clustering(0.25).tolist())
    lines.append(('h1_flat', ','.join(map(str, h1))))
    lines.append(('h3_purity', repr(purity(g, labels))))

    # h4: one independent tree per label (same params), vec_id order
    for k in sorted(set(labels.tolist())):
        mask = labels == k
        gk = build(pts[mask], limit=200)
        hk = canon(gk.flat_clustering(0.25).tolist())
        lines.append((f'h4_{k}', ','.join(map(str, hk))))

    # st2: the streaming config — first 50 vec_ids, no leaf limit
    g50 = build(pts[:50], limit=None)
    st2 = canon(g50.flat_clustering(0.25).tolist())
    lines.append(('st2_flat', ','.join(map(str, st2))))

    headers = [(f'#ref_sha256:{p.split("/root/reference/")[1]}', _sha256(p))
               for p in REF_FILES]
    headers.append(('#fixture_sha256', _sha256(FIXTURE)))
    headers.append(('#config', CONFIG))

    with open(OUT, 'w') as f:
        for k, v in headers + lines:
            f.write(f'{k}\t{v}\n')
    print(f'wrote {len(lines)} goldens (+{len(headers)} provenance headers) to {OUT}')


if __name__ == '__main__':
    main()
