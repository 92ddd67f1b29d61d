#!/bin/bash
# Round-4 session cache rebuild on a fresh host (.benchcache lost with the
# machine): most-valuable artifacts first so whatever fits the session's
# wall-clock lands before the driver's warm run. --only bypasses the budget
# guard. hostpq rides crossover10m's artifacts + in-process corpus memo.
set -u
export VECTORINDEX_BENCH_BUDGET_S=36000
cd /root/repo
LOG=${1:-/tmp/rebuild_cache.log}
: > "$LOG"
for cfg in crossover10m,hostpq ivf ivfpq hnsw,churn adc hostpq30m; do
  echo "=== $cfg start $(date +%s) ===" >> "$LOG"
  t0=$(date +%s)
  timeout 14400 python bench.py --only "$cfg" >> "$LOG" 2>&1
  rc=$?
  t1=$(date +%s)
  echo "=== $cfg done rc=$rc elapsed=$((t1-t0))s ===" >> "$LOG"
done
echo "ALL DONE" >> "$LOG"
