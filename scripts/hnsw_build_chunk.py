#!/usr/bin/env python
"""Measure HNSW construction throughput vs build_chunk on the real chip.

ROADMAP remaining #3: the construction device loop is latency-bound, so
fewer, larger chunks should cut build wall-clock roughly linearly in the
number of chunk dispatch rounds — at the cost of within-chunk candidate
quality (chunk members can't see each other through the graph). This
script measures both axes (build seconds, recall@10 at efSearch=64).

Usage: python scripts/hnsw_build_chunk.py [--n 50000] [--chunks 1024,4096]
"""
import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vectorindex_tpu.bench.synth import (  # noqa: E402
    exact_truth,
    lowdim_corpus,
    lowdim_queries,
    recall_at_k,
)
from vectorindex_tpu.models.hnsw import HNSWConfig, HNSWIndex  # noqa: E402
from vectorindex_tpu.utils.config import Metric  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=50_000)
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--chunks", type=str, default="1024,4096")
    ap.add_argument("--out", type=str, default="")
    args = ap.parse_args()

    n, d = args.n, args.d
    x, W = lowdim_corpus(n, d, dz=16, seed=41)
    q = lowdim_queries(W, 256)
    truth = exact_truth(q, x, 10)

    points = []
    for chunk in (int(c) for c in args.chunks.split(",")):
        cfg = HNSWConfig(m=16, ef_construction=200, ef_search=64,
                         build_chunk=chunk)
        idx = HNSWIndex(d, Metric.L2, cfg)
        t0 = time.perf_counter()
        idx.insert_batch(list(range(n)), x)
        idx._ensure_built()
        t_build = time.perf_counter() - t0
        res = idx.batch_search(q, 10)
        found = np.full((256, 10), -1, dtype=np.int64)
        for i, row in enumerate(res):
            for j, r in enumerate(row):
                found[i, j] = int(r.id)
        rec = recall_at_k(found, truth)
        point = {"build_chunk": chunk, "build_s": round(t_build, 1),
                 "recall_at_10_efs64": round(rec, 4)}
        points.append(point)
        print(json.dumps(point), flush=True)

    if args.out:
        with open(args.out, "w") as f:
            json.dump({"n": n, "d": d, "points": points}, f, indent=1)


if __name__ == "__main__":
    main()
