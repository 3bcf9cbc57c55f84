#!/bin/bash
# Run the Spark verify dump + local DuckDB compare. Usage: tools/run_verify.sh [sfDir]
set -e
SF=${1:-/root/testdata/sf0.01}
OUT=${2:-/tmp/graft_verify}
rm -rf "$OUT"
cd /root/repo
LOG=$(mktemp)
SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-8} sbt -batch "runMain graft.Verify $SF $OUT" 2>&1 | tee "$LOG" | grep -Ev '^\[info\] (welcome|loading|set|Executing|compiling|done|running)' | grep -v 'WARN' | tail -5
echo "--- slowest dumps ---"
grep -E '\[verify\] \S+ +[0-9.]+ s$' "$LOG" | awk '{print $(NF-1), $(NF-2)}' | sort -rn | head -8
rm -f "$LOG"
python3 tools/verify_local.py "$SF" "$OUT"
