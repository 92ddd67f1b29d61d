#!/usr/bin/env python
"""A/B the flat fused pass-1 reduction (VERDICT r4 next #9: 1.117 ms vs a
0.668 ms roofline floor).

Hypothesis: pass 1 is VPU-bound on the sorted-2 insertion loop
(15 iterations x ~8 elementwise ops on [tb, C] per tile), not MXU-bound.
Variant: ONE per-tile min per residue class via a reshape min-tree +
argmin id recovery (~3x fewer VPU ops), keeping the three cross-tile
tiers. Exactness is unchanged — pass 2 still proves the selection and
flags drops to the strict fallback; the analytical drop rate rises from
~1e-5 to ~0.07 %/query (two true top-k in one (class, tile)), i.e. an
amortized ~0.16 x strict-fallback cost per 256-batch.

Run on the real chip; prints pass timings for both variants + fallback
rates. If tree wins net, promote it into kernels/scan_fused.py.
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
from vectorindex_tpu.kernels import scan_fused as sf
from vectorindex_tpu.kernels.scan_fused import (
    C,
    TILE,
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
xp, sp, vp = pad_corpus(x, sqn, None)
t0 = time.time()


def _tree_kernel(q_ref, x_ref, bias_ref, *rest, metric, tb):
    cs_ref = rest[0] if metric == Metric.COSINE else None
    d1_ref, i1_ref, d2_ref, i2_ref, d3_ref, i3_ref = rest[-6:]
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        for dref, iref in ((d1_ref, i1_ref), (d2_ref, i2_ref),
                           (d3_ref, i3_ref)):
            dref[:] = jnp.full(dref.shape, INVALID_DIST, jnp.float32)
            iref[:] = jnp.zeros(iref.shape, jnp.int32)

    dist = _dist_tile(q_ref, x_ref, bias_ref, cs_ref, metric)
    base = i * TILE
    r = dist.reshape(tb, TILE // C, C)
    m1 = jnp.min(r, axis=1)
    j1 = jnp.argmin(r, axis=1).astype(jnp.int32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (tb, C), 1)
    ti1 = base + j1 * C + lane
    # merge the single tile candidate into the three running tiers
    m1g, id1 = d1_ref[:], i1_ref[:]
    m2g, id2 = d2_ref[:], i2_ref[:]
    m3g, id3 = d3_ref[:], i3_ref[:]
    c1 = m1 < m1g
    c2 = m1 < m2g
    c3 = m1 < m3g
    m3g, id3 = (
        jnp.where(c2, m2g, jnp.where(c3, m1, m3g)),
        jnp.where(c2, id2, jnp.where(c3, ti1, id3)),
    )
    m2g, id2 = (
        jnp.where(c1, m1g, jnp.where(c2, m1, m2g)),
        jnp.where(c1, id1, jnp.where(c2, ti1, id2)),
    )
    m1g, id1 = jnp.where(c1, m1, m1g), jnp.where(c1, ti1, id1)
    d1_ref[:], i1_ref[:] = m1g, id1
    d2_ref[:], i2_ref[:] = m2g, id2
    d3_ref[:], i3_ref[:] = m3g, id3


@partial(jax.jit, static_argnames=("metric", "interpret"))
def _bin_candidates_tree(q, x, bias, colscale, *, metric, interpret=False):
    nq, dd = q.shape
    npad = x.shape[0]
    tb = _query_block(nq)
    q_spec = pl.BlockSpec((tb, dd), lambda qb, i: (qb, 0),
                          memory_space=pltpu.VMEM)
    x_spec = pl.BlockSpec((TILE, dd), lambda qb, i: (i, 0),
                          memory_space=pltpu.VMEM)
    b_spec = pl.BlockSpec((1, TILE), lambda qb, i: (0, i),
                          memory_space=pltpu.VMEM)
    in_specs = [q_spec, x_spec, b_spec]
    args = [q, x, bias]
    if metric == Metric.COSINE:
        in_specs.append(b_spec)
        args.append(colscale)
    out_spec = pl.BlockSpec((tb, C), lambda qb, i: (qb, 0),
                            memory_space=pltpu.VMEM)
    grid_spec = pl.GridSpec(
        grid=(nq // tb, npad // TILE),
        in_specs=in_specs,
        out_specs=(out_spec,) * 6,
    )
    return pl.pallas_call(
        partial(_tree_kernel, metric=metric, tb=tb),
        out_shape=(jax.ShapeDtypeStruct((nq, C), jnp.float32),
                   jax.ShapeDtypeStruct((nq, C), jnp.int32)) * 3,
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * nq * npad * dd,
            bytes_accessed=npad * dd * x.dtype.itemsize + nq * dd * 4,
            transcendentals=0,
        ),
    )(*args)


bias = jnp.where(vp, sp, INVALID_DIST)[None, :]

# --- pass-1 A/B ---
def p1_cur(q, xp, bias):
    outs = _bin_candidates(q, xp, bias, None, metric=Metric.L2,
                           interpret=False)
    return tuple(jnp.sum(o) for o in outs[:2])


def p1_tree(q, xp, bias):
    outs = _bin_candidates_tree(q, xp, bias, None, metric=Metric.L2)
    return tuple(jnp.sum(o) for o in outs[:2])


t_cur, _ = time_loop(p1_cur, qpool, b, m, args=(xp, bias))
print(f"[{time.time()-t0:.0f}s] pass1 sorted-2: {t_cur*1e3:.3f} ms", flush=True)
t_tree, _ = time_loop(p1_tree, qpool, b, m, args=(xp, bias))
print(f"[{time.time()-t0:.0f}s] pass1 tree:     {t_tree*1e3:.3f} ms", flush=True)

# --- pass-2 standalone ---
thr = jnp.full((b, 1), 1.0, jnp.float32)


def p2(q, xp, bias, thr):
    lt, le = _count_below(q, xp, bias, None, thr, metric=Metric.L2,
                          interpret=False)
    return jnp.sum(lt), jnp.sum(le)


t_p2, _ = time_loop(p2, qpool, b, m, args=(xp, bias, thr))
print(f"[{time.time()-t0:.0f}s] pass2 count:    {t_p2*1e3:.3f} ms", flush=True)

# --- full fused current, for reference ---
def fused(q, xp, sp, vp):
    sd, si, exact = scan_topk_fused(q.astype(jnp.float32), xp, sp, vp,
                                    metric=Metric.L2, k=k)
    return jnp.sum(sd), jnp.sum(si), jnp.sum((~exact).astype(jnp.int32))


t_f, r = time_loop(fused, qpool, b, m, args=(xp, sp, vp))
print(f"[{time.time()-t0:.0f}s] full fused cur: {t_f*1e3:.3f} ms "
      f"(miss {int(r[2])}/{(m+1)*b})", flush=True)

# --- tree-variant end-to-end exactness/fallback-rate check (XLA epilogue
# replicated here) ---
q_check = qpool[:b].astype(jnp.float32)
d1, i1, d2, i2, d3, i3 = _bin_candidates_tree(
    q_check, xp, bias, None, metric=Metric.L2
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
# ids must match the current kernel's verified output on unflagged queries
sd_c, si_c, exact_c = scan_topk_fused(q_check, xp, sp, vp,
                                      metric=Metric.L2, k=k)
ok = np.asarray(exact) & np.asarray(exact_c)
same = (np.asarray(si)[ok] == np.asarray(si_c)[ok]).all()
print(f"[{time.time()-t0:.0f}s] ids match on exact rows: {same}", flush=True)
print("DONE", flush=True)
