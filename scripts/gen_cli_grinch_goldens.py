#!/usr/bin/env python3
"""Generate CLI goldens for the `grinch` command by EXECUTING the
reference `meercat/cluster_w_grinch.py` main() on a fixture embeddings
TSV (scipy/tqdm stubbed). Three variants:

  - grinch_cli_pairs_t06.golden   --threshold 0.6
  - grinch_cli_pairs_auto.golden  no threshold (bisection to entity count)
  - grinch_cli_pairs_pruned.golden --limit 8 --strategy similarity
    (the reference CLI's default strategy, with the memory bound live)

The fixture (grinch_cli_embeddings.tsv) is integer-valued to keep the
two implementations' float32 l2-normalized scores as close as possible,
but NOT provably bit-identical: the reference's batched float32 score
path can differ from the engine's double path by one ULP, performing a
no-op "churn" graft that renumbers BFS siblings without changing the
clustering (see GrinchGraftPropertySpec point 2). The CliSpec case
therefore compares PARTITIONS under first-occurrence canonical pred
ids, not raw golden lines.
"""
import argparse
import sys
import types

_scipy = types.ModuleType('scipy')
_spatial = types.ModuleType('scipy.spatial')
_distance = types.ModuleType('scipy.spatial.distance')
_distance.cdist = lambda *a, **k: (_ for _ in ()).throw(RuntimeError('stub'))
_spatial.distance = _distance
_scipy.spatial = _spatial
sys.modules.setdefault('scipy', _scipy)
sys.modules.setdefault('scipy.spatial', _spatial)
sys.modules.setdefault('scipy.spatial.distance', _distance)
_tqdm = types.ModuleType('tqdm')
_tqdm.tqdm = lambda it, *a, **k: it
sys.modules.setdefault('tqdm', _tqdm)
sys.path.insert(0, '/root/reference')
from meercat import cluster_w_grinch  # noqa: E402


class JavaRandom:
    """java.util.Random's LCG — the Scala fixture generator's twin."""

    MASK = (1 << 48) - 1
    MULT = 0x5DEECE66D
    ADD = 0xB

    def __init__(self, seed):
        self.seed = (seed ^ self.MULT) & self.MASK

    def _next(self, bits):
        self.seed = (self.seed * self.MULT + self.ADD) & self.MASK
        return self.seed >> (48 - bits)

    def next_int(self, bound):
        if bound & (bound - 1) == 0:
            return (bound * self._next(31)) >> 31
        while True:
            bits = self._next(31)
            val = bits % bound
            if bits - val + (bound - 1) < 2 ** 31:
                return val


def main():
    res = 'src/test/resources/cli'
    rnd = JavaRandom(7)
    # 40 mentions over 5 entities, dim 6, clustered integer vectors
    centers = [[rnd.next_int(41) - 20 for _ in range(6)] for _ in range(5)]
    rows = []
    for uid in range(40):
        e = rnd.next_int(5)
        vec = [max(-25, min(25, centers[e][k] + rnd.next_int(7) - 3))
               for k in range(6)]
        rows.append((uid, f'E{e}', vec))
    tsv = f'{res}/grinch_cli_embeddings.tsv'
    with open(tsv, 'w') as f:
        for uid, ent, vec in rows:
            f.write('\t'.join([str(uid), ent] + [str(v) for v in vec]) + '\n')

    for name, threshold, limit, strategy in [
            ('grinch_cli_pairs_t06.golden', 0.6, None, 'least_recent'),
            ('grinch_cli_pairs_auto.golden', None, None, 'least_recent'),
            ('grinch_cli_pairs_pruned.golden', 0.6, 8, 'similarity')]:
        args = argparse.Namespace(input=tsv, output=f'{res}/{name}',
                                  threshold=threshold, limit=limit,
                                  strategy=strategy)
        cluster_w_grinch.main(args)
        with open(f'{res}/{name}') as f:
            n_clusters = len({line.split(',')[1].strip() for line in f})
        print(f'{name}: {n_clusters} clusters')


if __name__ == '__main__':
    main()
