#!/usr/bin/env bash
# Test group filters (reference test_filters.sh + ci.yml matrix groups
# core/hnsw/ivf/kernels). Usage: bash test_groups.sh <group>|all
set -euo pipefail

group="${1:-all}"

core=(tests/test_scoring.py tests/test_topk.py tests/test_rng_dtypes.py \
      tests/test_flat_index.py tests/test_scan.py tests/test_support_ops.py \
      tests/test_telemetry.py tests/test_accel_layout.py \
      tests/test_dtype_edges.py tests/test_api_edges.py \
      tests/test_typed_overloads.py tests/test_integration_pipelines.py \
      tests/test_filters_advanced.py tests/test_errors.py \
      tests/test_benchmarks.py)
hnsw=(tests/test_hnsw.py tests/test_hnsw_more.py)
ivf=(tests/test_ivf.py tests/test_ivfpq.py tests/test_kmeans.py \
     tests/test_pq.py tests/test_container.py tests/test_durable.py \
     tests/test_persistence_corruption.py tests/test_churn.py)
kernels=(tests/test_pallas_kernels.py tests/test_sharded_search.py \
         tests/test_sharded_index.py tests/test_scan_fused.py \
         tests/test_ivf_probe_kernel.py tests/test_adc_probe_kernel.py \
         tests/test_sharded_hnsw.py tests/test_sharded_ivfpq.py)

case "$group" in
  core)    exec python -m pytest "${core[@]}" -q ;;
  hnsw)    exec python -m pytest "${hnsw[@]}" -q ;;
  ivf)     exec python -m pytest "${ivf[@]}" -q ;;
  kernels) exec python -m pytest "${kernels[@]}" -q ;;
  all)     exec python -m pytest tests/ -q ;;
  *) echo "unknown group: $group (core|hnsw|ivf|kernels|all)"; exit 2 ;;
esac
