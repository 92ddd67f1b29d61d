#!/usr/bin/env python
"""1M-node HNSW build + efSearch sweep on the real TPU chip.

Produces docs/HNSW_1M.json: build wall-clock, per-efSearch QPS and
recall@10 vs exact f32 brute force (VERDICT round-1 item 6a: 1M x 128 build
in minutes, efS sweep reaching recall@10 >= 0.95).

Run:  python scripts/hnsw_1m.py [--n 1000000] [--out docs/HNSW_1M.json]
"""

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=1_000_000)
    p.add_argument("--d", type=int, default=128)
    p.add_argument("--chunk", type=int, default=4096)
    p.add_argument("--out", type=str, default="docs/HNSW_1M.json")
    args = p.parse_args()

    from vectorindex_tpu.bench.synth import (
        exact_truth,
        lowdim_corpus,
        lowdim_queries,
        recall_at_k,
    )
    from vectorindex_tpu.bench.timing import time_host
    from vectorindex_tpu.models.hnsw import HNSWConfig, HNSWIndex
    from vectorindex_tpu.utils.config import Metric

    n, d = args.n, args.d
    x, W = lowdim_corpus(n, d, dz=16, seed=41)
    cfg = HNSWConfig(build_chunk=args.chunk)
    idx = HNSWIndex(d, Metric.L2, cfg)

    t0 = time.perf_counter()
    idx.insert_batch([str(i) for i in range(n)], x)
    idx.statistics()  # flush construction
    t_build = time.perf_counter() - t0
    stats = idx.statistics()
    print(f"build {n}x{d}: {t_build:.0f}s  avg_deg_l0={stats.details['avg_degree_l0']:.1f}"
          f" max_level={stats.details['max_level']}", flush=True)

    import jax.numpy as jnp

    from vectorindex_tpu.bench.timing import time_loop

    b, m = 256, 20
    qs = lowdim_queries(W, (m + 1) * b)
    q = qs[:b]
    qpool = jnp.asarray(qs)
    truth = exact_truth(q, x, 10)

    sweep = []
    for efs in (64, 128, 256):
        idx.config = dataclasses.replace(idx.config, ef_search=efs)
        # pipelined throughput: device M-scaling loop vs host assembly
        # (same model as bench.py bench_hnsw)
        fn, fargs = idx.device_search_closure(10)

        def dev(qb, *fa):
            kslot, kscore, kok = fn(qb, *fa)
            return jnp.sum(jnp.where(kok, kscore, 0.0)), jnp.sum(kslot)

        t_dev, _ = time_loop(dev, qpool, b, m, args=fargs)
        res_dev = idx.device_search(qpool[:b], 10)
        kslot, kscore, kok = (np.asarray(a) for a in res_dev)

        def asm():
            idx.assemble_results(kslot, kscore, kok)

        t_asm = time_host(asm)
        holder = {}

        def run():
            holder["res"] = idx.batch_search(q, 10)

        t_call = time_host(run)
        found = np.full((b, 10), -1, dtype=np.int64)
        for i, row in enumerate(holder["res"]):
            for j, r in enumerate(row):
                found[i, j] = int(r.id)
        rec = recall_at_k(found, truth)
        point = {"ef_search": efs,
                 "qps": round(b / max(t_dev, t_asm), 1),
                 "ms_device": round(t_dev * 1e3, 3),
                 "ms_assembly": round(t_asm * 1e3, 3),
                 "ms_per_call_e2e": round(t_call * 1e3, 3),
                 "recall_at_10": round(rec, 4)}
        sweep.append(point)
        print(point, flush=True)

    out = {
        "n": n, "d": d, "m": cfg.m, "ef_construction": cfg.ef_construction,
        "build_chunk": args.chunk, "build_s": round(t_build, 1),
        "avg_degree_l0": round(stats.details["avg_degree_l0"], 2),
        "max_level": stats.details["max_level"],
        "sweep": sweep, "batch": b,
        "throughput_model": "pipelined: b / max(ms_device, ms_assembly)",
        "device": "TPU v5 lite (1 chip)",
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
