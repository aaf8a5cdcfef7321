#!/usr/bin/env bash
# Cross-commit single-query A/B (the refactor-debt protocol): overlay
# the SAME graft.ABBench harness onto HEAD and a baseline commit, then
# run the two trees interleaved A/B/A/B so machine-state windows hit
# both sides, and compare drift-normalized mins. A code-touched query
# keeps its A/B debt until this has run — board-wide drift is never a
# license to presume noise on a touched path.
#
# Usage: tools/ab_bench.sh <baseline-rev> [query] [rounds]
# Example: tools/ab_bench.sh f546d69 q50_equality_export 3
set -euo pipefail
cd "$(dirname "$0")/.."

REV="${1:?usage: tools/ab_bench.sh <baseline-rev> [query] [rounds]}"
export SPARK_GRAFT_AB_QUERY="${2:-q50_equality_export}"
ROUNDS="${3:-3}"
export SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}"
export SPARK_GRAFT_SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}"
WT="/tmp/graft-ab-$(git rev-parse --short "$REV")"

if [ ! -d "$WT" ]; then
  git worktree add "$WT" "$REV"
fi
cp src/main/scala/graft/ABBench.scala "$WT/src/main/scala/graft/ABBench.scala"

echo "[ab] compiling both trees (serially, machine otherwise idle)"
(cd "$WT" && sbt -batch compile >/dev/null)
sbt -batch compile >/dev/null

echo "[ab] $SPARK_GRAFT_AB_QUERY — $REV vs HEAD, $ROUNDS interleaved rounds"
run_base() { (cd "$WT" && sbt -batch "runMain graft.ABBench" 2>/dev/null \
  | grep '"query"' | sed "s/^/$REV[$1] /"); }
run_head() { sbt -batch "runMain graft.ABBench" 2>/dev/null \
  | grep '"query"' | sed "s/^/HEAD[$1] /"; }
for i in $(seq 1 "$ROUNDS"); do
  # alternate which side runs first: a monotonic machine trend
  # (thermal creep) otherwise biases against whichever side always
  # runs second — the round-15 q50 A/B read +20% one way and the
  # mirror image the other until both orders were in the sample
  if [ $((i % 2)) -eq 1 ]; then run_base "$i"; run_head "$i"
  else run_head "$i"; run_base "$i"; fi
done
echo "[ab] compare min of 'norm' per side; record the ratio in ADVICE.md"
