#!/usr/bin/env python
"""Headline benchmark: flat exact L2 top-10 over a SIFT1M-scale corpus.

Config from BASELINE.json: "Flat exact L2 top-10 over SIFT1M (128-d fp32
brute-force scan)". The reference's measured flat-search throughput is 327 QPS
(Apple M2, .bench/runs/local/e2e-run.json — its harness only ran n=300; no
larger published numbers exist, see BASELINE.md). vs_baseline is QPS/chip
against that 327 QPS figure.

The measured program is the production flat-search path (ops/scan.py):
bf16 corpus scan on the MXU + verified two-phase exact top-k, plus the strict
per-query fallback for verification misses — so the reported QPS delivers
recall@10 = 1.0 (checked vs f32 brute force below and reported).

Timing methodology (required on this platform — see
.claude/skills/verify/SKILL.md gotchas): block_until_ready is unreliable under
the axon tunnel and identical loop bodies get hoisted/DCE'd by XLA, so we time
one jit call that runs M dependent iterations over *distinct* query batches
and fully reduces every output, then difference M=1 vs M=1+R timings. The
fallback cost is measured the same way and amortized at the observed
verification-miss rate.

Prints ONE JSON line.
"""

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def time_loop(search_outputs_fn, qpool, b, m):
    """(t_per_batch, aux_sum): difference M=1 vs M=1+m dependent in-jit
    iterations over distinct query slices, reducing all outputs."""

    def run_m(mm):
        @jax.jit
        def f(qpool):
            def body(i, acc):
                q = jax.lax.dynamic_slice_in_dim(qpool, i * b, b)
                s_d, s_i, s_x = search_outputs_fn(q)
                return (acc[0] + s_d, acc[1] + s_i, acc[2] + s_x)

            return jax.lax.fori_loop(0, mm, body, (0.0, jnp.int32(0), jnp.int32(0)))

        return f

    f1, fm = run_m(1), run_m(m + 1)
    jax.device_get(f1(qpool))
    jax.device_get(fm(qpool))
    # best-of-3: the tunnel adds ±25% run-to-run noise
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        jax.device_get(f1(qpool))
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        r = jax.device_get(fm(qpool))
        tm = time.perf_counter() - t0
        per = (tm - t1) / m
        if best is None or per < best:
            best = per
    return best, r


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=1_000_000)
    p.add_argument("--d", type=int, default=128)
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--iters", type=int, default=20)
    args = p.parse_args()

    from vectorindex_tpu.ops.scan import scan_topk_strict, scan_topk_verified
    from vectorindex_tpu.utils.config import Metric

    n, d, b, k, m = args.n, args.d, args.batch, args.k, args.iters
    key = jax.random.key(1234)
    x = jax.random.normal(key, (n, d), dtype=jnp.bfloat16)
    sqn = jnp.sum(jnp.square(x.astype(jnp.float32)), axis=-1)
    valid = None  # no tombstones: fast path skips the [B, N] mask op
    qpool = jax.random.normal(
        jax.random.fold_in(key, 1), ((m + 1) * b, d), dtype=jnp.bfloat16
    )

    # -- main verified path --
    def verified(q):
        sd, si, exact = scan_topk_verified(q, x, sqn, None, valid, metric=Metric.L2, k=k)
        return jnp.sum(sd), jnp.sum(si), jnp.sum((~exact).astype(jnp.int32))

    t_verified, r = time_loop(verified, qpool, b, m)
    miss_frac = float(r[2]) / ((m + 1) * b)

    # -- strict fallback at the flagged-query batch size (8) --
    def strict8(q):
        sd, si = scan_topk_strict(q, x, sqn, None, valid, metric=Metric.L2, k=k)
        return jnp.sum(sd), jnp.sum(si), jnp.int32(0)

    t_strict8, _ = time_loop(strict8, qpool, 8, m)

    # effective per-batch latency: verified pass + amortized fallback
    # (P(batch has >=1 flagged query) * strict cost at pad-8)
    p_any = 1.0 - (1.0 - miss_frac) ** b
    per_batch = t_verified + p_any * t_strict8
    qps = b / per_batch

    # -- recall@10 with fallback applied, vs f32-HIGHEST brute force --
    q_check = qpool[:b]
    sd, si, exact = scan_topk_verified(q_check, x, sqn, None, valid, metric=Metric.L2, k=k)
    si = np.array(si)
    exact_np = np.asarray(exact)
    if not exact_np.all():
        flagged = np.nonzero(~exact_np)[0]
        from vectorindex_tpu.ops.scan import pad_queries

        qf, nf = pad_queries(q_check[flagged])
        _, fi = scan_topk_strict(qf, x, sqn, None, valid, metric=Metric.L2, k=k)
        si[flagged] = np.asarray(fi)[:nf]
    xf = x.astype(jnp.float32)
    qf32 = q_check.astype(jnp.float32)
    dist_f32 = (
        jnp.sum(qf32**2, 1)[:, None]
        + jnp.sum(xf**2, 1)[None, :]
        - 2.0
        * jax.lax.dot_general(
            qf32,
            xf,
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    )
    _, ref_i = jax.lax.top_k(-dist_f32, k)
    ref_i = np.asarray(ref_i)
    recall = float(np.mean([len(set(si[i]) & set(ref_i[i])) / k for i in range(b)]))

    baseline_qps = 327.0  # reference flat search QPS (BASELINE.md row 1)
    print(
        json.dumps(
            {
                "metric": f"flat_exact_l2_top{k}_qps_per_chip_n{n}_d{d}",
                "value": round(qps, 1),
                "unit": "qps",
                "vs_baseline": round(qps / baseline_qps, 1),
                "recall_at_10": round(recall, 4),
                "verify_miss_frac": round(miss_frac, 6),
                "batch": b,
                "ms_per_batch": round(per_batch * 1e3, 3),
                "ms_verified_pass": round(t_verified * 1e3, 3),
                "ms_strict_fallback8": round(t_strict8 * 1e3, 3),
                "device": str(jax.devices()[0]),
            }
        )
    )


if __name__ == "__main__":
    main()
