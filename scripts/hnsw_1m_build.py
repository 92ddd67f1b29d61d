#!/usr/bin/env python
"""Measure the 1M x 128 HNSW bulk build end-to-end (VERDICT r3 next #3).

Round 2's docs/HNSW_1M.json recorded 57 min — measured BEFORE the 8-wide
construction beam and the batched-chunk pipeline existed. This script
re-measures with the current construction path and overwrites that file:
build wall-clock, steady-state insert rate, recall@10 on held-out queries,
and the construction configuration, so the capacity story quotes numbers
from the code that ships.

Usage: python scripts/hnsw_1m_build.py [--n 1000000] [--chunk 1024]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import dataclasses  # noqa: E402

import numpy as np  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=1_000_000)
    p.add_argument("--d", type=int, default=128)
    p.add_argument("--chunk", type=int, default=None)
    p.add_argument("--expand", type=int, default=None)
    p.add_argument("--out", type=str, default=None)
    args = p.parse_args()

    import jax

    from vectorindex_tpu.bench.synth import (
        exact_truth,
        lowdim_corpus,
        lowdim_queries,
        recall_at_k,
    )
    from vectorindex_tpu.models.hnsw import HNSWConfig, HNSWIndex
    from vectorindex_tpu.utils.config import Metric

    n, d = args.n, args.d
    x, W = lowdim_corpus(n, d, dz=16, seed=41)
    cfg = HNSWConfig()
    if args.chunk:
        cfg = dataclasses.replace(cfg, build_chunk=args.chunk)
    if args.expand:
        cfg = dataclasses.replace(cfg, build_expand=args.expand)
    idx = HNSWIndex(d, Metric.L2, cfg)

    t0 = time.perf_counter()
    idx.insert_batch([str(i) for i in range(n)], x)
    stats = idx.statistics()  # flushes construction + refine
    t_build = time.perf_counter() - t0

    # recall probe at the serving operating point
    idx.config = dataclasses.replace(idx.config, ef_search=128)
    nq = 256
    qs = lowdim_queries(W, nq, seed=9)
    truth = exact_truth(qs, x, 10)
    found = np.full((nq, 10), -1, dtype=np.int64)
    for s in range(0, nq, 64):
        for i, row in enumerate(idx.batch_search(qs[s : s + 64], 10)):
            for j, r in enumerate(row):
                found[s + i, j] = int(r.id)
    rec = recall_at_k(found, truth)

    out = {
        "metric": "hnsw_1m_build",
        "n": n,
        "d": d,
        "build_s": round(t_build, 1),
        "build_min": round(t_build / 60.0, 2),
        "rows_per_s": round(n / t_build, 1),
        "recall_at_10_ef128": round(rec, 4),
        "config": {
            "m": idx.config.m,
            "ef_construction": idx.config.ef_construction,
            "build_chunk": idx.config.build_chunk,
            "build_expand": idx.config.build_expand,
        },
        "graph": {k: v for k, v in (stats.details or {}).items()
                  if k in ("max_level", "avg_degree_l0", "nodes")},
        "device": str(jax.devices()[0]),
        "measured": time.strftime("%Y-%m-%d"),
    }
    print(json.dumps(out))
    path = args.out or os.path.join(
        os.path.dirname(__file__), "..", "docs", "HNSW_1M.json"
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")


if __name__ == "__main__":
    main()
