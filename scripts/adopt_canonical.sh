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
BOUND=1.0
[ -f "$SRC" ] || { echo "adopt_canonical: $SRC not found (run graft.Bench first)" >&2; exit 1; }
CEIL=$(python3 - "$SRC" <<'EOF'
import json, sys
line = open(sys.argv[1]).readline()
d = json.loads(line)
amb = d.get("ambient", {})
vals = list(amb.values())
print(max(vals) if vals else -1.0)
EOF
)
echo "adopt_canonical: recorded ambient-cores ceiling = $CEIL (bound $BOUND)"
if python3 -c "import sys; sys.exit(0 if 0 <= $CEIL <= $BOUND else 1)"; then
  cp "$SRC" bench_queries.json
  echo "adopt_canonical: adopted $SRC -> bench_queries.json"
else
  echo "adopt_canonical: REFUSED — run was not quiet (ceiling $CEIL > $BOUND)" >&2
  exit 1
fi
