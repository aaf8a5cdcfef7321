#!/usr/bin/env bash
# Standing BENCH-SCALE full-hash sweep (round-16 ask #4): run the
# whole Verify surface at sf0.1 and hash-compare against the DuckDB
# oracle, recording a per-round SWEEP_r{N}.json beside CORRECTNESS_r*.
#
# Why it exists: the sf0.01 driver gate structurally cannot see
# summation-order / rounding-tie divergence that only manifests at
# larger N — the r15 sweep caught exactly that class (q82/q268 real
# 6-dp ties, q197 DuckDB literal double-rounding). Every round records
# one so a regression in scale-exactness is a diff, not a surprise.
#
# Usage: tools/fullhash_sweep.sh [sfDir]   (default /root/testdata/sf0.1)
# Round number = latest CORRECTNESS_r{N} + 1 (the round in progress);
# override with SWEEP_ROUND=N.
set -euo pipefail
cd "$(dirname "$0")/.."

SF_DIR="${1:-/root/testdata/sf0.1}"
OUT="$(mktemp -d /tmp/graft-sweep.XXXXXX)"
trap 'rm -rf "$OUT"' EXIT

if [ -z "${SWEEP_ROUND:-}" ]; then
  last=$(ls CORRECTNESS_r*.json 2>/dev/null |
    sed 's/.*_r0*\([0-9]*\)\.json/\1/' | sort -n | tail -1)
  SWEEP_ROUND=$(( ${last:-0} + 1 ))
fi
ARTIFACT=$(printf 'SWEEP_r%02d.json' "$SWEEP_ROUND")

sbt -batch "runMain graft.Verify $SF_DIR $OUT"
python3 tools/compare.py "$SF_DIR" "$OUT" --json "$ARTIFACT" || true
echo "[fullhash_sweep] wrote $ARTIFACT"
