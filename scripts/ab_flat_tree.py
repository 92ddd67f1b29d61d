#!/usr/bin/env python
"""A/B the flat fused pass-1 (VERDICT r4 next #9: 1.117 ms vs 0.668 ms
roofline floor; pass-1 alone measures 0.607 ms = 1.84x its own 0.33 ms
single-pass floor, 422 GB/s of 819 peak).

Variants, 2x2: reduction {sorted-2 insertion (current), hand-rolled
min-tree + eq-scan id recovery (ONE in-tile candidate per class)} x tile
rows {4096 (current), 8192}. The min-tree keeps the three cross-tile
tiers; exactness is unchanged (pass-2 verification + strict fallback,
analytical drop rate ~0.07%/query vs ~1e-5). argmin was tried first and
OOM'd scoped VMEM (21.67M > 16M) — the hand-rolled scan keeps
temporaries at [tb, C].
"""
import sys
import time
from functools import partial

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vectorindex_tpu.bench.timing import time_loop
from vectorindex_tpu.kernels.scan_fused import (
    C,
    _bin_candidates,
    _count_below,
    _dist_tile,
    _query_block,
    pad_corpus,
    scan_topk_fused,
)
from vectorindex_tpu.ops.topk import INVALID_DIST, topk
from vectorindex_tpu.utils.config import Metric

n, d, b, k = 1_000_000, 128, 256, 10
key = jax.random.key(1234)
x = jax.random.normal(key, (n, d), dtype=jnp.bfloat16)
sqn = jnp.sum(jnp.square(x.astype(jnp.float32)), axis=-1)
m = 400
qpool = jax.random.normal(jax.random.fold_in(key, 1), ((m + 1) * b, d),
                          dtype=jnp.bfloat16)
t0 = time.time()


def _kernel_param(q_ref, x_ref, bias_ref, *rest, metric, tb, tile, mode):
    d1_ref, i1_ref, d2_ref, i2_ref, d3_ref, i3_ref = rest[-6:]
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        for dref, iref in ((d1_ref, i1_ref), (d2_ref, i2_ref),
                           (d3_ref, i3_ref)):
            dref[:] = jnp.full(dref.shape, INVALID_DIST, jnp.float32)
            iref[:] = jnp.zeros(iref.shape, jnp.int32)

    dist = _dist_tile(q_ref, x_ref, bias_ref, None, metric)
    base = i * tile
    lane = jax.lax.broadcasted_iota(jnp.int32, (tb, C), 1)
    if mode == "tree":
        m1 = dist[:, :C]
        for j in range(1, tile // C):
            m1 = jnp.minimum(m1, dist[:, j * C : (j + 1) * C])
        ti1 = base + lane
        found = dist[:, :C] == m1
        for j in range(1, tile // C):
            eq = (dist[:, j * C : (j + 1) * C] == m1) & (~found)
            ti1 = jnp.where(eq, base + j * C + lane, ti1)
            found = found | eq
        pairs = ((m1, ti1),)
    else:  # sorted-2 (current shipping reduction)
        tm1 = dist[:, :C]
        ti1 = lane + base
        tm2 = jnp.full((tb, C), INVALID_DIST, jnp.float32)
        ti2 = jnp.zeros((tb, C), jnp.int32)
        for j in range(1, tile // C):
            blk = dist[:, j * C : (j + 1) * C]
            ids = lane + (base + j * C)
            b1 = blk < tm1
            b2 = blk < tm2
            tm2 = jnp.where(b1, tm1, jnp.where(b2, blk, tm2))
            ti2 = jnp.where(b1, ti1, jnp.where(b2, ids, ti2))
            tm1 = jnp.where(b1, blk, tm1)
            ti1 = jnp.where(b1, ids, ti1)
        pairs = ((tm1, ti1), (tm2, ti2))
    m1g, id1 = d1_ref[:], i1_ref[:]
    m2g, id2 = d2_ref[:], i2_ref[:]
    m3g, id3 = d3_ref[:], i3_ref[:]
    for v, w in pairs:
        c1 = v < m1g
        c2 = v < m2g
        c3 = v < m3g
        m3g, id3 = (
            jnp.where(c2, m2g, jnp.where(c3, v, m3g)),
            jnp.where(c2, id2, jnp.where(c3, w, id3)),
        )
        m2g, id2 = (
            jnp.where(c1, m1g, jnp.where(c2, v, m2g)),
            jnp.where(c1, id1, jnp.where(c2, w, id2)),
        )
        m1g, id1 = jnp.where(c1, v, m1g), jnp.where(c1, w, id1)
    d1_ref[:], i1_ref[:] = m1g, id1
    d2_ref[:], i2_ref[:] = m2g, id2
    d3_ref[:], i3_ref[:] = m3g, id3


@partial(jax.jit, static_argnames=("metric", "tile", "mode"))
def _bin_candidates_param(q, x, bias, *, metric, tile, mode):
    nq, dd = q.shape
    npad = x.shape[0]
    tb = _query_block(nq)
    q_spec = pl.BlockSpec((tb, dd), lambda qb, i: (qb, 0),
                          memory_space=pltpu.VMEM)
    x_spec = pl.BlockSpec((tile, dd), lambda qb, i: (i, 0),
                          memory_space=pltpu.VMEM)
    b_spec = pl.BlockSpec((1, tile), lambda qb, i: (0, i),
                          memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((tb, C), lambda qb, i: (qb, 0),
                            memory_space=pltpu.VMEM)
    grid_spec = pl.GridSpec(
        grid=(nq // tb, npad // tile),
        in_specs=[q_spec, x_spec, b_spec],
        out_specs=(out_spec,) * 6,
    )
    return pl.pallas_call(
        partial(_kernel_param, metric=metric, tb=tb, tile=tile, mode=mode),
        out_shape=(jax.ShapeDtypeStruct((nq, C), jnp.float32),
                   jax.ShapeDtypeStruct((nq, C), jnp.int32)) * 3,
        grid_spec=grid_spec,
        interpret=False,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * nq * npad * dd,
            bytes_accessed=npad * dd * x.dtype.itemsize + nq * dd * 4,
            transcendentals=0,
        ),
    )(q, x, bias)


results = {}
for tile in (4096, 8192):
    xp, sp, vp = pad_corpus(x, sqn, None)
    if xp.shape[0] % tile:
        pad = tile - xp.shape[0] % tile
        xp = jnp.concatenate([xp, jnp.zeros((pad, xp.shape[1]), xp.dtype)])
        sp = jnp.concatenate([sp, jnp.zeros((pad,), sp.dtype)])
        vp = jnp.concatenate([vp, jnp.zeros((pad,), vp.dtype)])
    bias = jnp.where(vp, sp, INVALID_DIST)[None, :]
    for mode in ("sorted2", "tree"):
        def p1(q, xp, bias):
            outs = _bin_candidates_param(q, xp, bias, metric=Metric.L2,
                                         tile=tile, mode=mode)
            return tuple(jnp.sum(o) for o in outs[:2])

        try:
            t, _ = time_loop(p1, qpool, b, m, args=(xp, bias))
            results[(tile, mode)] = t
            print(f"[{time.time()-t0:.0f}s] tile={tile} {mode}: "
                  f"{t*1e3:.3f} ms", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"[{time.time()-t0:.0f}s] tile={tile} {mode}: "
                  f"FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)

# pass-2 standalone at current shape
xp, sp, vp = pad_corpus(x, sqn, None)
bias = jnp.where(vp, sp, INVALID_DIST)[None, :]
thr = jnp.full((b, 1), 1.0, jnp.float32)


def p2(q, xp, bias, thr):
    lt, le = _count_below(q, xp, bias, None, thr, metric=Metric.L2,
                          interpret=False)
    return jnp.sum(lt), jnp.sum(le)


t_p2, _ = time_loop(p2, qpool, b, m, args=(xp, bias, thr))
print(f"[{time.time()-t0:.0f}s] pass2 count: {t_p2*1e3:.3f} ms", flush=True)

# exactness/fallback of the best tree variant vs the shipping kernel
q_check = qpool[:b].astype(jnp.float32)
d1, i1, d2, i2, d3, i3 = _bin_candidates_param(
    q_check, xp, bias, metric=Metric.L2, tile=4096, mode="tree"
)
cd = jnp.concatenate([d1, d2, d3], axis=1)
ci = jnp.concatenate([i1, i2, i3], axis=1)
sd, si = topk(cd, k, ids=ci, strict_ties=True)
tau = sd[:, k - 1][:, None]
lt, le = _count_below(q_check, xp, bias, None, tau, metric=Metric.L2,
                      interpret=False)
res_below = jnp.sum((sd < tau).astype(jnp.int32), axis=-1)
exact = (lt[:, 0] == res_below) & (le[:, 0] == k)
n_flag = int(jnp.sum((~exact).astype(jnp.int32)))
print(f"[{time.time()-t0:.0f}s] tree flagged {n_flag}/{b} queries", flush=True)
sd_c, si_c, exact_c = scan_topk_fused(q_check, xp, sp, vp,
                                      metric=Metric.L2, k=k)
ok = np.asarray(exact) & np.asarray(exact_c)
same = (np.asarray(si)[ok] == np.asarray(si_c)[ok]).all()
print(f"[{time.time()-t0:.0f}s] ids match on exact rows: {same}", flush=True)
print("DONE", flush=True)
