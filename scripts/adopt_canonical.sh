#!/usr/bin/env bash
# Adopt a freshly-measured bench map as the committed canonical
# regression ruler — GATED on the run's own recorded loadavg (VERDICT
# r18 #3: the round-18 canonical was re-baselined under machine load,
# 1.21x ambient inflation on 154 unchanged queries, which corrupts the
# >3x-outlier retry rule and hides real regressions inside the noise).
#
# Usage: scripts/adopt_canonical.sh [src=target/bench/bench_queries.json]
#
# The gate reads the bench line's per-family "ambient" map — OTHER
# processes' measured CPU cores over each family's exact window
# ((d/proc/stat busy - d/proc/self/stat) / dwall) — NOT raw loadavg:
# the bench's own 32-thread Spark work inflates its 1-minute loadavg
# past any honest bound (the genuinely-quiet r17 canonical recorded a
# 7.11 loadavg ceiling). Bound mirrors Bench.CanonicalAmbientBound,
# and BenchCanonicalSpec pins the committed file against it.
set -euo pipefail
cd "$(dirname "$0")/.."
SRC="${1:-target/bench/bench_queries.json}"
[ -f "$SRC" ] || { echo "adopt_canonical: $SRC not found (run graft.Bench first)" >&2; exit 1; }
# Bounds mirror Bench.Canonical*Bound; BenchCanonicalSpec pins the
# committed file against the same four. Round 20 (VERDICT r19 #4): the
# busy-jiffies ambient excludes iowait, so an IO/page-cache-contended
# run (the r19 driver inflation class) could score ambient ~ 0 — the
# gate now also bounds machine-wide iowait cores and the PSI io/memory
# some-stall fractions over every family window (psi_cpu is recorded
# but unbounded: the bench's own 32 threads stall each other).
if python3 - "$SRC" <<'EOF'
import json, sys
line = open(sys.argv[1]).readline()
d = json.loads(line)
bounds = {"ambient": 1.0, "iowait": 0.5, "psi_io": 0.05, "psi_mem": 0.05}
ok = True
for key, bound in bounds.items():
    vals = list(d.get(key, {}).values())
    ceil = max(vals) if vals else -1.0
    verdict = "ok" if 0 <= ceil <= bound else "FAIL"
    print(f"adopt_canonical: {key} ceiling = {ceil} (bound {bound}) {verdict}")
    if not (0 <= ceil <= bound):
        ok = False
sys.exit(0 if ok else 1)
EOF
then
  cp "$SRC" bench_queries.json
  echo "adopt_canonical: adopted $SRC -> bench_queries.json"
else
  echo "adopt_canonical: REFUSED — run was not quiet (see failed ceilings above)" >&2
  exit 1
fi
