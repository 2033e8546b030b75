#!/usr/bin/env python3
"""Generate GRINCH parent-relation goldens by EXECUTING the reference
implementation (/root/reference/meercat/grinch_alg.py, scipy/tqdm
stubbed) on the EXACT fixtures the Scala specs use.

The Scala fixtures are generated with scala.util.Random(seed), which
wraps java.util.Random — a 48-bit LCG reproduced bit-for-bit by
JavaRandom below, so the reference runs on the very same int8 vectors
the specs feed the Scala engine.

Cases (must mirror GrinchSpec / GrinchRotateOracleSpec):
  - h5  restricted config: seed 13, n=60, dim=8, rotate_cap=0
  - h7  rotate-enabled:    seeds 1..8,  n=80, dim=8, cap=12, uniform
                           seeds 1..8,  n=80, dim=8, cap=16, clustered
                           seeds 21..26, n=60, dim=8, cap=3,  clustered
                           seeds 21..26, n=60, dim=8, cap=10^6, clustered
  (graft_cap=0 in the h5/h7 cases: lca_and_ancestors'
  `num_descendants < 0` filters make graft a structural no-op,
  grinch_alg.py:469-470.)
  - graft-enabled property cases (GrinchGraftPropertySpec):
      seeds 1..60, n=40, dim=8, rotate_cap=8,  graft_cap=8,  clustered
      seeds 1..60, n=40, dim=8, rotate_cap=12, graft_cap=16, uniform
    These dump parents[:next_node_id] — INCLUDING -2 lazy-delete codes
    for graft-detached parents — so the spec can assert full node-slot
    identity between the Scala engine and the reference.
  - prune-enabled cases (GrinchPruneOracleSpec):
      seeds 1..30, n=60, dim=8, rotate_cap=0, graft_cap=0,
      active_leaf_limit=12, least_recent, uniform + clustered
    These dump parents AND (under the `<key>_act` suffix) the final
    0/1 active-leaf masks, so the spec pins the memory-bound frontier
    itself, not just the tree shape.

Output: src/test/resources/grinch_ref_parents.tsv
  one line per case: case_key<TAB>comma-joined parent-of-uid list,
  -1 = root, uid order = leaves 0..n-1 then internal nodes n..2n-2 in
  insert order.
"""
import sys
import types

import numpy as np

# -- stub scipy.spatial.distance.cdist and tqdm (unused under sim='dot')
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


class JavaRandom:
    """java.util.Random's 48-bit LCG (= scala.util.Random internals)."""

    MASK = (1 << 48) - 1
    MULT = 0x5DEECE66D
    ADD = 0xB

    def __init__(self, seed):
        self.seed = (seed ^ self.MULT) & self.MASK

    def _next(self, bits):
        self.seed = (self.seed * self.MULT + self.ADD) & self.MASK
        return self.seed >> (48 - bits)

    def next_int(self, bound):
        if bound <= 0:
            raise ValueError(bound)
        if bound & (bound - 1) == 0:  # power of two
            return (bound * self._next(31)) >> 31
        while True:
            bits = self._next(31)
            val = bits % bound
            if bits - val + (bound - 1) < 2 ** 31:  # no 32-bit overflow
                return val


def uniform_pts(rnd, n, dim):
    return [[rnd.next_int(255) - 127 for _ in range(dim)] for _ in range(n)]


def clustered_pts(rnd, n, dim):
    centers = [[rnd.next_int(255) - 127 for _ in range(dim)] for _ in range(4)]
    pts = []
    for _ in range(n):
        c = centers[rnd.next_int(4)]
        pts.append([max(-127, min(127, v + rnd.next_int(21) - 10)) for v in c])
    return pts


def run_reference(pts, rotate_cap, graft_cap=0, leaf_limit=None,
                  want_active=False, strategy='least_recent',
                  threshold=None):
    points = np.array(pts, dtype=np.float32)
    n = points.shape[0]
    g = Grinch(points, rotate_cap=rotate_cap, graft_cap=graft_cap,
               sim='dot', norm='none', active_leaf_limit=leaf_limit,
               pruning_strategy=strategy, pruning_threshold=threshold)
    g.build_dendrogram()
    hi = g.next_node_id if graft_cap > 0 else 2 * n - 1
    parents = [int(p) for p in g.parents[:hi]]
    if want_active:
        return parents, [int(bool(a)) for a in g.active_leaves[:hi]]
    return parents


def main():
    out = {}
    out['h5_seed13_n60_d8_cap0'] = run_reference(
        uniform_pts(JavaRandom(13), 60, 8), rotate_cap=0)
    for seed in range(1, 9):
        out[f'h7_seed{seed}_n80_d8_cap12_uniform'] = run_reference(
            uniform_pts(JavaRandom(seed), 80, 8), rotate_cap=12)
    for seed in range(1, 9):
        out[f'h7_seed{seed}_n80_d8_cap16_clustered'] = run_reference(
            clustered_pts(JavaRandom(seed), 80, 8), rotate_cap=16)
    for seed in range(21, 27):
        out[f'h7_seed{seed}_n60_d8_cap3_clustered'] = run_reference(
            clustered_pts(JavaRandom(seed), 60, 8), rotate_cap=3)
    for seed in range(21, 27):
        out[f'h7_seed{seed}_n60_d8_cap1000000_clustered'] = run_reference(
            clustered_pts(JavaRandom(seed), 60, 8), rotate_cap=1000000)
    grafting = 0
    for seed in range(1, 61):
        key = f'gr_seed{seed}_n40_d8_r8_g8_clustered'
        out[key] = run_reference(
            clustered_pts(JavaRandom(seed), 40, 8), rotate_cap=8, graft_cap=8)
        grafting += len(out[key]) > 2 * 40 - 1
    for seed in range(1, 61):
        key = f'gr_seed{seed}_n40_d8_r12_g16_uniform'
        out[key] = run_reference(
            uniform_pts(JavaRandom(seed), 40, 8), rotate_cap=12, graft_cap=16)
        grafting += len(out[key]) > 2 * 40 - 1
    print(f'graft cases with >=1 graft: {grafting}/120')
    # prune-enabled cases (GrinchPruneOracleSpec): rotate/graft off,
    # least_recent, active_leaf_limit=12 — parents AND active masks
    for seed in range(1, 31):
        for gen, tag in [(uniform_pts, 'uniform'), (clustered_pts, 'clustered')]:
            key = f'pr_seed{seed}_n60_d8_L12_{tag}'
            parents, active = run_reference(
                gen(JavaRandom(seed), 60, 8), rotate_cap=0, leaf_limit=12,
                want_active=True)
            out[key] = parents
            out[key + '_act'] = active
    # prune STRATEGY cases (similarity / combined) and path-INTERACTION
    # cases (rotate+prune, rotate+graft+prune) — all with active masks
    for seed in range(1, 21):
        for gen, tag in [(uniform_pts, 'uniform'), (clustered_pts, 'clustered')]:
            pts = gen(JavaRandom(seed), 60, 8)
            key = f'psim_seed{seed}_n60_d8_L12_{tag}'
            parents, active = run_reference(pts, rotate_cap=0, leaf_limit=12,
                                            want_active=True, strategy='similarity')
            out[key] = parents
            out[key + '_act'] = active
        pts = clustered_pts(JavaRandom(seed), 60, 8)
        key = f'pcmb_seed{seed}_n60_d8_L12_t15000_clustered'
        parents, active = run_reference(pts, rotate_cap=0, leaf_limit=12,
                                        want_active=True, strategy='combined',
                                        threshold=15000.0)
        out[key] = parents
        out[key + '_act'] = active
        pts = uniform_pts(JavaRandom(seed), 60, 8)
        key = f'pcmb_seed{seed}_n60_d8_L12_t0_uniform'
        parents, active = run_reference(pts, rotate_cap=0, leaf_limit=12,
                                        want_active=True, strategy='combined',
                                        threshold=0.0)
        out[key] = parents
        out[key + '_act'] = active
        pts = clustered_pts(JavaRandom(seed), 60, 8)
        key = f'prot_seed{seed}_n60_d8_r12_L12_clustered'
        parents, active = run_reference(pts, rotate_cap=12, leaf_limit=12,
                                        want_active=True)
        out[key] = parents
        out[key + '_act'] = active
        pts = uniform_pts(JavaRandom(seed), 60, 8)
        key = f'prot_seed{seed}_n60_d8_r12_L12_uniform'
        parents, active = run_reference(pts, rotate_cap=12, leaf_limit=12,
                                        want_active=True)
        out[key] = parents
        out[key + '_act'] = active
        pts = clustered_pts(JavaRandom(seed), 60, 8)
        key = f'pfull_seed{seed}_n60_d8_r8_g8_L12_clustered'
        parents, active = run_reference(pts, rotate_cap=8, graft_cap=8,
                                        leaf_limit=12, want_active=True)
        out[key] = parents
        out[key + '_act'] = active
    path = 'src/test/resources/grinch_ref_parents.tsv'
    with open(path, 'w') as f:
        for key in sorted(out):
            f.write(key + '\t' + ','.join(map(str, out[key])) + '\n')
    print(f'wrote {path}: {len(out)} cases')


if __name__ == '__main__':
    main()
