"""Benchmark CLI (reference VectorIndexBenchmarks/main.swift flag surface
:36-88: index selection, n/d/k/queries, index params, JSON output modes).

Usage:
  python -m vectorindex_tpu.bench --index flat,ivf --n 10000 --d 64 --k 10
  python -m vectorindex_tpu.bench --index all --out run.json --vb
  python -m vectorindex_tpu.bench --microbench  # kernel-level rows/s & GB/s
"""

from __future__ import annotations

import argparse
import json
import time
from dataclasses import asdict


from vectorindex_tpu.bench.harness import BenchResult, bench_index, make_run
from vectorindex_tpu.utils.config import Metric

ALL_INDICES = ("flat", "hnsw", "ivf", "ivfpq")


def _suite(name: str, args) -> BenchResult:
    metric = Metric(args.metric)
    if name == "flat":
        from vectorindex_tpu.models import FlatIndex

        return bench_index(
            lambda: FlatIndex(args.d, metric),
            "flat", args.n, args.d, args.k, args.queries, metric,
            seed=args.seed, batch=args.batch, progress=args.progress,
        )
    if name == "hnsw":
        from vectorindex_tpu.models import HNSWConfig, HNSWIndex

        cfg = HNSWConfig(
            m=args.hnsw_m,
            ef_construction=args.hnsw_efc,
            ef_search=args.hnsw_efs,
        )
        return bench_index(
            lambda: HNSWIndex(args.d, metric, cfg),
            "hnsw", args.n, args.d, args.k, args.queries, metric,
            seed=args.seed, batch=args.batch, progress=args.progress,
            params={"m": cfg.m, "efC": cfg.ef_construction, "efS": cfg.ef_search},
        )
    if name == "ivf":
        from vectorindex_tpu.models import IVFConfig, IVFIndex

        cfg = IVFConfig(nlist=args.ivf_nlist, nprobe=args.ivf_nprobe)
        return bench_index(
            lambda: IVFIndex(args.d, metric, cfg),
            "ivf", args.n, args.d, args.k, args.queries, metric,
            seed=args.seed, batch=args.batch, progress=args.progress,
            params={"nlist": cfg.nlist, "nprobe": cfg.nprobe},
        )
    if name == "ivfpq":
        from vectorindex_tpu.models import IVFPQConfig, IVFPQIndex

        cfg = IVFPQConfig(
            nlist=args.ivf_nlist,
            nprobe=args.ivf_nprobe,
            m=args.pq_m,
            ks=args.pq_ks,
        )
        return bench_index(
            lambda: IVFPQIndex(args.d, metric, cfg),
            "ivfpq", args.n, args.d, args.k, args.queries, metric,
            seed=args.seed, batch=args.batch, progress=args.progress,
            params={
                "nlist": cfg.nlist, "nprobe": cfg.nprobe,
                "pq_m": cfg.m, "pq_ks": cfg.ks,
            },
        )
    raise SystemExit(f"unknown index: {name}")


def microbench(args) -> dict:
    """Kernel-level scoring microbench (reference L2SqrMicrobench/main.swift:
    6-13, 102-106: flags n/d/trials, reports rows/sec & GB/s)."""
    import jax
    import jax.numpy as jnp

    n, d, b = args.n, args.d, args.batch or 64
    key = jax.random.key(0)
    x = jax.random.normal(key, (n, d), dtype=jnp.bfloat16)
    sqn = jnp.sum(jnp.square(x.astype(jnp.float32)), axis=-1)
    q = jax.random.normal(jax.random.fold_in(key, 1), (b, d), dtype=jnp.bfloat16)

    def run_m(m):
        @jax.jit
        def f(q, x, sqn):
            def body(i, acc):
                qi = q + (i.astype(jnp.bfloat16) * jnp.bfloat16(1e-8))
                g = jax.lax.dot_general(
                    qi, x, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                qd = jnp.sum(jnp.square(qi.astype(jnp.float32)), axis=-1)
                dist = qd[:, None] + sqn[None, :] - 2.0 * g
                return acc + jnp.sum(dist)

            return jax.lax.fori_loop(0, m, body, 0.0)

        return f

    f1, fm = run_m(1), run_m(1 + args.trials)
    jax.device_get(f1(q, x, sqn))
    jax.device_get(fm(q, x, sqn))
    t0 = time.perf_counter()
    jax.device_get(f1(q, x, sqn))
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    jax.device_get(fm(q, x, sqn))
    tm = time.perf_counter() - t0
    per = (tm - t1) / args.trials
    rows_per_s = n * b / per
    gb_per_s = n * d * x.dtype.itemsize / per / 1e9
    # per-kernel counter sink (reference L2SqrMicrobench reports per-op
    # counters through the kernel's own recorder, L2SqrKernel.swift:46-57)
    from vectorindex_tpu.utils.telemetry import Telemetry

    # a LOCAL recorder instance: the process-global TELEM must not be
    # force-enabled or polluted with this run's synthetic counters
    telem = Telemetry(enabled=True)
    telem.record_kernel(
        "l2sqr_block",
        calls=2 + args.trials,
        rows=n * b * (2 + args.trials),
        bytes=n * d * x.dtype.itemsize * (2 + args.trials),
    )
    snap = telem.snapshot()
    kcounters = {
        k: v for k, v in snap["counters"].items() if k.startswith("kernel.")
    }
    return {
        "kernel": "l2sqr_block",
        "n": n,
        "d": d,
        "batch": b,
        "ms_per_pass": round(per * 1e3, 3),
        "row_queries_per_s": round(rows_per_s),
        "corpus_gb_per_s": round(gb_per_s, 1),
        "kernel_counters": kcounters,
        "device": str(jax.devices()[0]),
    }


def sweep(args) -> list:
    """Pareto sweep (recall@k vs QPS) over a search-time knob, one build."""
    import time as _time

    import numpy as np

    from vectorindex_tpu.bench import datagen
    from vectorindex_tpu.bench.harness import brute_force_topk, recall_at_k

    metric = Metric(args.metric)
    knob, values = args.sweep.split("=")
    values = [int(v) for v in values.split(",")]
    x = datagen.generate_clustered(args.n, args.d, seed=args.seed)
    q = datagen.queries_from(x, args.queries, noise=0.01, seed=args.seed + 1)
    ids = [f"v{i}" for i in range(args.n)]
    truth = brute_force_topk(x, q, args.k, metric)

    name = args.index.split(",")[0]
    if name in ("ivf", "ivfpq") and knob == "nprobe":
        if name == "ivf":
            from vectorindex_tpu.models import IVFConfig, IVFIndex

            idx = IVFIndex(args.d, metric, IVFConfig(nlist=args.ivf_nlist))
            mk_cfg = lambda v: IVFConfig(nlist=args.ivf_nlist, nprobe=v)
        else:
            from vectorindex_tpu.models import IVFPQConfig, IVFPQIndex

            idx = IVFPQIndex(
                args.d, metric,
                IVFPQConfig(nlist=args.ivf_nlist, m=args.pq_m, ks=args.pq_ks),
            )
            mk_cfg = lambda v: IVFPQConfig(
                nlist=args.ivf_nlist, nprobe=v, m=args.pq_m, ks=args.pq_ks
            )
        idx.insert_batch(ids, x)
        idx.optimize()

        def set_knob(v):
            idx.config = mk_cfg(v)

    elif name == "hnsw" and knob == "efs":
        from vectorindex_tpu.models import HNSWConfig, HNSWIndex

        idx = HNSWIndex(
            args.d, metric, HNSWConfig(m=args.hnsw_m, ef_construction=args.hnsw_efc)
        )
        idx.insert_batch(ids, x)
        idx._ensure_built()

        def set_knob(v):
            idx.config = HNSWConfig(
                m=args.hnsw_m, ef_construction=args.hnsw_efc, ef_search=v
            )

    else:
        raise SystemExit(f"unsupported sweep {args.sweep!r} for index {name!r}")

    points = []
    for v in values:
        set_knob(v)
        res = idx.batch_search(q, args.k)  # warm/compile
        t0 = _time.perf_counter()
        res = idx.batch_search(q, args.k)
        dt = _time.perf_counter() - t0
        points.append(
            {
                "index": name,
                knob: v,
                "recall_at_k": round(recall_at_k(res, truth, lambda i: f"v{i}"), 4),
                "qps": round(args.queries / dt, 1),
                "ms_per_query": round(dt / args.queries * 1e3, 4),
            }
        )
    return points


def main(argv=None):
    p = argparse.ArgumentParser(prog="vectorindex_tpu.bench")
    p.add_argument("--index", default="flat", help="comma list or 'all'")
    p.add_argument("--n", type=int, default=10_000)
    p.add_argument("--d", type=int, default=64)
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--queries", type=int, default=100)
    p.add_argument("--metric", default="l2", choices=[m.value for m in Metric])
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--batch", type=int, default=None)
    p.add_argument("--trials", type=int, default=5)
    p.add_argument("--hnsw-m", type=int, default=16)
    p.add_argument("--hnsw-efc", type=int, default=100)
    p.add_argument("--hnsw-efs", type=int, default=64)
    p.add_argument("--ivf-nlist", type=int, default=64)
    p.add_argument("--ivf-nprobe", type=int, default=8)
    p.add_argument("--pq-m", type=int, default=8)
    p.add_argument("--pq-ks", type=int, default=256)
    p.add_argument("--out", default=None, help="write JSON to file")
    p.add_argument("--vb", action="store_true", help="VectorBench run envelope")
    p.add_argument("--progress", action="store_true", help="JSON progress events to stderr")
    p.add_argument("--microbench", action="store_true", help="kernel-level bench")
    p.add_argument(
        "--sweep",
        default=None,
        help="recall/QPS tradeoff sweep: 'nprobe=1,8,32' (ivf/ivfpq) or "
        "'efs=16,64,128' (hnsw); builds once, varies the knob",
    )
    args = p.parse_args(argv)

    if args.microbench:
        payload = microbench(args)
    elif args.sweep:
        payload = sweep(args)
    else:
        names = ALL_INDICES if args.index == "all" else tuple(args.index.split(","))
        results = [_suite(nm.strip(), args) for nm in names]
        payload = (
            asdict(make_run(results))
            if args.vb
            else [asdict(r) for r in results]
        )
    text = json.dumps(payload, indent=2)
    if args.out:
        with open(args.out, "w") as f:
            f.write(text)
    print(text)


if __name__ == "__main__":
    main()
