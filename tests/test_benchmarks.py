"""Benchmarks-as-tests, opt-in via RUN_BENCHMARKS=1 (reference tier 7:
PerformanceBenchmarks.swift / KMeansKernelBenchmarks.swift gated the same
way — skipped by default so CI stays fast)."""

import os
import time

import numpy as np
import pytest

RUN = os.environ.get("RUN_BENCHMARKS") == "1"
skip = pytest.mark.skipif(not RUN, reason="set RUN_BENCHMARKS=1 to run")


@skip
def test_flat_search_throughput_floor():
    from vectorindex_tpu.models import FlatIndex

    rng = np.random.default_rng(0)
    x = rng.standard_normal((20_000, 64)).astype(np.float32)
    idx = FlatIndex(64)
    idx.insert_batch(list(range(len(x))), x)
    q = x[:128]
    idx.batch_search(q, 10)  # warm
    t0 = time.perf_counter()
    idx.batch_search(q, 10)
    dt = time.perf_counter() - t0
    qps = 128 / dt
    print(f"flat 20k×64: {qps:.0f} QPS")
    assert qps > 100  # loose floor; CPU backend in CI


@skip
def test_kmeans_throughput():
    import jax.numpy as jnp

    from vectorindex_tpu.ops import kmeans as km

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((50_000, 64)).astype(np.float32))
    t0 = time.perf_counter()
    res = km.kmeans(x, km.KMeansConfig(k=64, iters=10))
    np.asarray(res.centroids)
    dt = time.perf_counter() - t0
    print(f"kmeans 50k×64 k=64: {dt:.1f}s")
    assert np.isfinite(float(res.inertia))


@skip
def test_hnsw_build_time_budget():
    """Reference aspirational threshold: 1K×128d build < 1s
    (PerformanceBenchmarks.swift:42) — relaxed for the CPU backend."""
    from vectorindex_tpu.models import HNSWConfig, HNSWIndex

    rng = np.random.default_rng(0)
    x = rng.standard_normal((1000, 128)).astype(np.float32)
    idx = HNSWIndex(128, config=HNSWConfig(ef_construction=64))
    t0 = time.perf_counter()
    idx.insert_batch(list(range(1000)), x)
    idx._ensure_built()
    dt = time.perf_counter() - t0
    print(f"hnsw build 1k×128: {dt:.1f}s")
    assert idx.count == 1000
