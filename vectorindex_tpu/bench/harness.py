"""Benchmark harness: per-index suites with recall-vs-truth + latency stats.

Parity target: reference VectorIndexBenchmarks (main.swift:140-368) —
  - per-index suites measuring buildSeconds / optimizeSeconds / searchAvg /
    P95 ms / recallAvg / QPS (:214-226)
  - brute-force ground truth per query (:310-320), recall@k (:409)
  - progress streaming as JSON events (:54, :194-196)
  - VectorBench-schema JSON output (Benchmarking/Models.swift:8-60) with
    host metadata (:417-457)

TPU deltas: searches run *batched* (the production shape); per-query
latency derives from batch latency; host metadata reports the JAX device.
"""

from __future__ import annotations

import json
import platform
import sys
import time
from dataclasses import asdict, dataclass, field
from typing import Callable, Optional

import numpy as np

from vectorindex_tpu.bench import datagen
from vectorindex_tpu.utils.config import Metric

SCHEMA_VERSION = 1


@dataclass
class BenchResult:
    """Mirrors reference BenchResult (main.swift:373-387)."""

    index: str
    n: int
    d: int
    k: int
    queries: int
    metric: str
    build_seconds: float = 0.0
    optimize_seconds: float = 0.0
    search_avg_ms: float = 0.0
    search_p95_ms: float = 0.0
    qps: float = 0.0
    recall_avg: float = 0.0
    params: dict = field(default_factory=dict)


@dataclass
class BenchRun:
    """VectorBench-style run envelope (Benchmarking/Models.swift:8-60)."""

    schema_version: int
    created_at: str
    host: dict
    results: list


def host_metadata() -> dict:
    """Host/device info (reference sysctl metadata, main.swift:417-457)."""
    meta = {
        "platform": platform.platform(),
        "python": platform.python_version(),
        "processor": platform.processor() or platform.machine(),
    }
    try:
        import jax

        meta["jax"] = jax.__version__
        meta["devices"] = [str(d) for d in jax.devices()]
    except Exception:  # pragma: no cover - jax always present in this image
        pass
    return meta


def brute_force_topk(x: np.ndarray, q: np.ndarray, k: int, metric: Metric) -> np.ndarray:
    """Ground truth ids [Q, k] (reference truthTopK, main.swift:310-320)."""
    if metric == Metric.L2:
        d = ((q[:, None, :] - x[None]) ** 2).sum(-1)
        return np.argsort(d, axis=1)[:, :k]
    if metric == Metric.INNER_PRODUCT:
        return np.argsort(-(q @ x.T), axis=1)[:, :k]
    if metric == Metric.COSINE:
        qn = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-30)
        xn = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-30)
        return np.argsort(-(qn @ xn.T), axis=1)[:, :k]
    if metric == Metric.MANHATTAN:
        d = np.abs(q[:, None, :] - x[None]).sum(-1)
        return np.argsort(d, axis=1)[:, :k]
    d = np.abs(q[:, None, :] - x[None]).max(-1)
    return np.argsort(d, axis=1)[:, :k]


def recall_at_k(results: list, truth: np.ndarray, id_of: Callable[[int], object]) -> float:
    """recall@k vs truth ids (reference :409)."""
    hits, total = 0, 0
    for b, row in enumerate(results):
        want = {id_of(int(i)) for i in truth[b]}
        hits += len({r.id for r in row} & want)
        total += len(want)
    return hits / max(total, 1)


def _emit(event: dict, progress: bool) -> None:
    if progress:
        print(json.dumps(event), file=sys.stderr, flush=True)


def bench_index(
    make_index: Callable[[], object],
    name: str,
    n: int,
    d: int,
    k: int,
    n_queries: int,
    metric: Metric = Metric.L2,
    seed: int = 42,
    trials: int = 3,
    batch: Optional[int] = None,
    params: Optional[dict] = None,
    progress: bool = False,
) -> BenchResult:
    """One suite: build → optimize → timed batched search → recall."""
    x = datagen.generate(n, d, seed=seed)
    q = datagen.queries_from(x, n_queries, seed=seed + 1)
    ids = [f"v{i}" for i in range(n)]

    idx = make_index()
    _emit({"event": "build_start", "index": name, "n": n}, progress)
    t0 = time.perf_counter()
    idx.insert_batch(ids, x)
    build_s = time.perf_counter() - t0
    _emit({"event": "build_done", "seconds": build_s}, progress)

    t0 = time.perf_counter()
    idx.optimize()
    opt_s = time.perf_counter() - t0
    if opt_s > 1e-4:
        _emit({"event": "optimize_done", "seconds": opt_s}, progress)

    b = batch or n_queries
    # warm (compile)
    results = idx.batch_search(q[:b], k)
    lat = []
    for _ in range(trials):
        t0 = time.perf_counter()
        out = []
        for c in range(0, n_queries, b):
            out.extend(idx.batch_search(q[c : c + b], k))
        lat.append((time.perf_counter() - t0) / n_queries)
    results = out
    lat_ms = np.asarray(lat) * 1e3
    truth = brute_force_topk(x, q, k, metric)
    rec = recall_at_k(results, truth, lambda i: f"v{i}")
    per_q = float(lat_ms.mean())
    res = BenchResult(
        index=name,
        n=n,
        d=d,
        k=k,
        queries=n_queries,
        metric=metric.value,
        build_seconds=round(build_s, 4),
        optimize_seconds=round(opt_s, 4),
        search_avg_ms=round(per_q, 4),
        search_p95_ms=round(float(np.percentile(lat_ms, 95)), 4),
        qps=round(1e3 / per_q, 1),
        recall_avg=round(rec, 4),
        params=params or {},
    )
    _emit({"event": "suite_done", **asdict(res)}, progress)
    return res


def make_run(results: list) -> BenchRun:
    return BenchRun(
        schema_version=SCHEMA_VERSION,
        created_at=time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        host=host_metadata(),
        results=[asdict(r) for r in results],
    )
