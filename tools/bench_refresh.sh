#!/usr/bin/env bash
# Bench refresh with the artifact commit folded in — refreshing the
# bench and committing its outputs are ONE step, so round artifacts
# can never sit untracked at judging time (the recurring miss this
# script exists to kill). Usage: tools/bench_refresh.sh [commit-msg]
set -euo pipefail
cd "$(dirname "$0")/.."

SPARK_GRAFT_SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}" \
SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}" \
sbt -batch "runMain graft.Bench"

git add BENCH_LATEST.json
# round artifacts the driver may have dropped since the last commit,
# plus the standing bench-scale sweep (tools/fullhash_sweep.sh)
for f in BENCH_r*.json CORRECTNESS_r*.json SWEEP_r*.json LEAKCHECK.json; do
  [ -e "$f" ] && git add "$f"
done
if ! git diff --cached --quiet; then
  git commit -m "${1:-Refresh bench artifacts}"
else
  echo "[bench_refresh] artifacts unchanged; nothing to commit"
fi
