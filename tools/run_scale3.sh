#!/usr/bin/env bash
# The standing third scaling rung: sf0.1 -> sf1-equivalent (10x synthetic
# replica, near-duplicate-heavy — see gen_scale.py). The r7 interval-join
# quadratic was INVISIBLE at the default sf0.01->sf0.1 pair; this point is
# what catches that class of regression, so it runs per round, not as a
# one-off.
#
# Usage: tools/run_scale3.sh [sf1dir]      (default /tmp/sf1equiv)
# Output: bench_scale3.json (one Bench JSON line: sf1equiv vs sf0.1 —
# per-query medians+minima at both SFs, minima-based scale_flags at
# size_ratio 10).
set -euo pipefail
cd "$(dirname "$0")/.."
SF1DIR="${1:-/tmp/sf1equiv}"
if [ ! -f "$SF1DIR/lineitem.parquet" ]; then
  echo "[scale3] generating $SF1DIR (10x of sf0.1)..."
  python3 tools/gen_scale.py /root/testdata/sf0.1 "$SF1DIR" 10
fi
SPARK_GRAFT_SF_DIR="$SF1DIR" \
SPARK_GRAFT_SCALE_DIR=/root/testdata/sf0.1 \
SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}" \
SPARK_GRAFT_RUNS="${SPARK_GRAFT_RUNS:-2}" \
SPARK_GRAFT_BENCH_OUT=bench_scale3.json \
sbt -batch "runMain graft.Bench"
echo "[scale3] wrote bench_scale3.json"
