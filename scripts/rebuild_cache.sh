#!/bin/bash
# Rebuild the .benchcache artifacts from scratch on a quiet host, one config
# at a time, logging per-config wall time (cold cost on this box).
set -u
export VECTORINDEX_BENCH_BUDGET_S=36000
cd /root/repo
LOG=${1:-/tmp/rebuild_cache.log}
: > "$LOG"
for cfg in ivf ivfpq adc hnsw churn crossover10m,hostpq hostpq30m; do
  echo "=== $cfg start $(date +%s) ===" >> "$LOG"
  t0=$(date +%s)
  timeout 14400 python bench.py --only "$cfg" >> "$LOG" 2>&1
  rc=$?
  t1=$(date +%s)
  echo "=== $cfg done rc=$rc elapsed=$((t1-t0))s ===" >> "$LOG"
done
echo "ALL DONE" >> "$LOG"
