#!/usr/bin/env bash
# Round-boundary housekeeping (VERDICT r18 #8, structural fix): the
# driver writes the finishing round's artifacts (BENCH_r{N}.json,
# CORRECTNESS_r{N}.json, VERDICT.md / ADVICE.md rewrites, LEAKCHECK /
# COPYCHECK refreshes) AFTER the builder's last commit of that round,
# so a naive round start inherits a dirty tree and judging at the next
# round boundary sees modified/untracked evidence files. The round
# ritual runs this script FIRST: it stages exactly those
# driver-generated artifact paths and commits them if anything changed,
# leaving `git status` clean before any new work begins.
set -euo pipefail
cd "$(dirname "$0")/.."
# Each pathspec is staged on its own: `git add -A -- <globs>` aborts
# with a fatal status if ANY glob matches nothing, staging NOTHING —
# and the old trailing `|| true` hid exactly that, so a repo state
# missing e.g. SCALE_*.json silently skipped BENCH/VERDICT too and the
# script reported "nothing to commit" on a dirty tree (ADVICE r19).
for spec in 'BENCH_r*.json' 'CORRECTNESS_r*.json' 'RECALL_r*.json' \
  'SCALE_*.json' 'VERDICT.md' 'ADVICE.md' 'LEAKCHECK.json' 'COPYCHECK.json'; do
  git add -A -- "$spec" 2>/dev/null || true
done
if git diff --cached --quiet; then
  echo "round artifacts: nothing to commit (tree already clean)"
else
  git commit -m "Record driver-generated round artifacts"
fi
