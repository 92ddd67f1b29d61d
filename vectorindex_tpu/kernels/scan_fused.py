"""Pallas TPU kernel: fused flat-scan exact top-k (single-kernel hot path).

The rebuild of the reference's flat hot path (FlatIndexOptimized.swift:400-420
ScoreBlock -> selectTopK) as two fused corpus passes that never materialize
the [B, N] distance matrix:

  pass 1 (candidates): grid over corpus tiles; per tile one MXU matmul
      [TB, d] x [d, TILE] -> f32 scores, fused bias epilogue (dot-trick sq
      norms / tombstone +inf), then *binned running minima*: bin = column mod
      C, the two best (dist, id) per bin per tile merged into three cross-
      tile tiers kept in the output blocks themselves
      (constant index_map keeps it VMEM-resident for the whole grid). This is
      the PartialReduce trick (lax.approx_min_k) done in-kernel so the matmul
      and the reduction share one HBM read of the corpus.
  epilogue (XLA): strict (score, id) two-key top-k over the C bin minima
      (reference TopK.swift:8-30 contract), tau = k-th distance.
  pass 2 (verification): same fused matmul, counts entries with dist < tau.
      Distances are computed by the *same* tiling and op sequence as pass 1,
      so the comparison is bit-exact: count(all) == count(selected) proves
      the selection exact; flagged queries are re-run by the caller through
      the always-exact strict path (ops/scan.scan_topk_strict).

A bin collision (two true top-k entries in the same residue class) makes the
per-bin min drop one of them -- pass 2 catches exactly this, so end-to-end
results are exact with probability 1, same contract as ops/scan.py.

Kernel-space distances omit the per-query ||q||^2 term (monotone per query);
the epilogue adds it back for L2 so public distances match scoring.distance_block.

HBM traffic = 2 corpus reads (vs 4+ for the unfused XLA pipeline that
materializes [B, N] f32 twice); MXU does 2x the minimum FLOPs -- on v5e both
passes sit near the compute/bandwidth roofline.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vectorindex_tpu.ops.topk import INVALID_DIST, INVALID_ID, topk
from vectorindex_tpu.utils.config import Metric

Array = jax.Array

#: corpus rows per grid step (per-tile f32 scores = tb*tile*4 bytes of
#: VMEM). Round-5 A/B on the chip: 8192-row tiles run pass-1 at 0.564 ms
#: vs 0.607 ms at 4096 (fewer grid steps -> better DMA amortization), but
#: the [tb, tile] f32 score block + double-buffered x tiles only fit the
#: 16 MB scoped-VMEM budget up to d_pad = 128 — wider corpora keep 4096.
#: (Also measured and REJECTED for the reduction itself: a min-tree +
#: eq-scan single-candidate variant at 0.818 ms — the compare/select
#: insertion chain is already the cheaper VPU form — and jnp.argmin,
#: which OOMs scoped VMEM at 21.7 MB.)
TILE = 4096
TILE_WIDE = 8192


def _tile_rows(dpad: int) -> int:
    return TILE_WIDE if dpad <= 128 else TILE
#: max queries per grid block (256q x 4096 tile = 4 MB f32 scores)
TB_MAX = 256
#: candidate bins per query (one candidate kept per bin)
C = 256


def _query_block(b: int) -> int:
    """Pow2 query-block size: small batches don't pad to 256."""
    return max(8, min(TB_MAX, 1 << (b - 1).bit_length()))


def _dist_tile(q_ref, x_ref, bias_ref, cs_ref, metric: Metric):
    """Fused score tile: one MXU matmul + VPU epilogue -> [TB, TILE] f32
    kernel-space distances (ascending; +inf for dead/padded slots).

    L2:  bias - 2*(q . x)          bias = ||x||^2 (+inf dead)   [no ||q||^2]
    IP:  bias - (q . x)            bias = 0 (+inf dead)
    COS: bias - (q . x)*inv||x||   bias = 0 (+inf dead), q pre-normalized
    """
    g = jax.lax.dot_general(
        q_ref[:].astype(x_ref.dtype),
        x_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [TB, TILE]
    bias = bias_ref[:]  # [1, TILE]
    if metric == Metric.L2:
        return bias - 2.0 * g
    if metric == Metric.INNER_PRODUCT:
        return bias - g
    if metric == Metric.COSINE:
        return bias - g * cs_ref[:]
    raise ValueError(f"unsupported metric {metric}")


def _candidates_kernel(q_ref, x_ref, bias_ref, *rest, metric: Metric, tb: int, tile: int):
    """Per tile: the TWO smallest (dist, id) per residue class (bin = column
    mod C), merged into a THREE-tier running state held in the output blocks.

    Loss analysis (k=10, C=256): a single per-tile min drops a true top-k
    entry whenever two of them share a class AND a tile (~0.07%/query at 1M
    rows); a single cross-tile tier whenever two share a class (~18%). Two
    in-tile minima + three global tiers require FOUR top-k entries in one
    residue class (~1e-5), so the strict fallback is vanishingly rare and
    its amortized cost disappears from the effective latency. Tier entries
    originate from distinct (tile, class, rank) slots, so ids never collide."""
    cs_ref = rest[0] if metric == Metric.COSINE else None
    d1_ref, i1_ref, d2_ref, i2_ref, d3_ref, i3_ref = rest[-6:]
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        for dref, iref in ((d1_ref, i1_ref), (d2_ref, i2_ref), (d3_ref, i3_ref)):
            dref[:] = jnp.full(dref.shape, INVALID_DIST, jnp.float32)
            iref[:] = jnp.zeros(iref.shape, jnp.int32)

    dist = _dist_tile(q_ref, x_ref, bias_ref, cs_ref, metric)
    _reduce_tile(
        dist, i * tile, tb, d1_ref, i1_ref, d2_ref, i2_ref, d3_ref, i3_ref
    )


def _reduce_tile(dist, base, tb, d1_ref, i1_ref, d2_ref, i2_ref, d3_ref, i3_ref):
    """Fold one tile's [tb, TILE] distances into the running three-tier
    per-class state (see _candidates_kernel docstring). `base` is the
    tile's first corpus row (may be a traced scalar).

    NOTE (round 4): a software-pipelined variant that scored tile i on the
    MXU into a parity VMEM scratch slot while folding tile i-1 on the VPU
    was built and A/B'd on the real chip — it measured 3.6x SLOWER (2.21 vs
    0.61 ms pass-1 at B=256/n=1M/d=128): the full-tile scratch store+load
    round-trip costs far more VMEM bandwidth than the MXU/VPU overlap
    recovers, and Mosaic already co-schedules the two units within a step.
    The serial form below is the measured optimum; don't re-add scratch."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (tb, C), 1)
    # two smallest per class within the tile (exact sorted-2 insertion)
    tile = dist.shape[1]
    tm1 = dist[:, :C]
    ti1 = lane + base
    tm2 = jnp.full((tb, C), INVALID_DIST, jnp.float32)
    ti2 = jnp.zeros((tb, C), jnp.int32)
    for j in range(1, tile // C):
        blk = dist[:, j * C : (j + 1) * C]  # static lane-aligned slice
        ids = lane + (base + j * C)
        b1 = blk < tm1
        b2 = blk < tm2
        tm2 = jnp.where(b1, tm1, jnp.where(b2, blk, tm2))
        ti2 = jnp.where(b1, ti1, jnp.where(b2, ids, ti2))
        tm1 = jnp.where(b1, blk, tm1)
        ti1 = jnp.where(b1, ids, ti1)
    # merge both tile minima into the three running tiers (invariant
    # m1 <= m2 <= m3 per class; insertion shifts the chain)
    m1, id1 = d1_ref[:], i1_ref[:]
    m2, id2 = d2_ref[:], i2_ref[:]
    m3, id3 = d3_ref[:], i3_ref[:]
    for v, w in ((tm1, ti1), (tm2, ti2)):
        c1 = v < m1
        c2 = v < m2
        c3 = v < m3
        m3, id3 = (
            jnp.where(c2, m2, jnp.where(c3, v, m3)),
            jnp.where(c2, id2, jnp.where(c3, w, id3)),
        )
        m2, id2 = (
            jnp.where(c1, m1, jnp.where(c2, v, m2)),
            jnp.where(c1, id1, jnp.where(c2, w, id2)),
        )
        m1, id1 = jnp.where(c1, v, m1), jnp.where(c1, w, id1)
    d1_ref[:], i1_ref[:] = m1, id1
    d2_ref[:], i2_ref[:] = m2, id2
    d3_ref[:], i3_ref[:] = m3, id3


def _count_kernel(q_ref, x_ref, bias_ref, *rest, metric: Metric):
    cs_ref = rest[0] if metric == Metric.COSINE else None
    thr_ref, lt_ref, le_ref = rest[-3], rest[-2], rest[-1]
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        lt_ref[:] = jnp.zeros(lt_ref.shape, jnp.int32)
        le_ref[:] = jnp.zeros(le_ref.shape, jnp.int32)

    dist = _dist_tile(q_ref, x_ref, bias_ref, cs_ref, metric)
    below = (dist < thr_ref[:]).astype(jnp.int32)  # thr [TB, 1] broadcasts
    at_most = (dist <= thr_ref[:]).astype(jnp.int32)
    lt_ref[:] = lt_ref[:] + jnp.sum(below, axis=1, keepdims=True)
    le_ref[:] = le_ref[:] + jnp.sum(at_most, axis=1, keepdims=True)


@partial(jax.jit, static_argnames=("metric", "interpret"))
def _bin_candidates(q, x, bias, colscale, *, metric: Metric, interpret: bool):
    nq, d = q.shape
    npad = x.shape[0]
    tb = _query_block(nq)
    tile = _tile_rows(d)
    q_spec = pl.BlockSpec((tb, d), lambda qb, i: (qb, 0), memory_space=pltpu.VMEM)
    x_spec = pl.BlockSpec((tile, d), lambda qb, i: (i, 0), memory_space=pltpu.VMEM)
    b_spec = pl.BlockSpec((1, tile), lambda qb, i: (0, i), memory_space=pltpu.VMEM)
    in_specs = [q_spec, x_spec, b_spec]
    args = [q, x, bias]
    if metric == Metric.COSINE:
        in_specs.append(b_spec)
        args.append(colscale)
    out_spec = pl.BlockSpec((tb, C), lambda qb, i: (qb, 0), memory_space=pltpu.VMEM)
    grid_spec = pl.GridSpec(
        grid=(nq // tb, npad // tile),
        in_specs=in_specs,
        out_specs=(out_spec,) * 6,
    )
    kernel = partial(_candidates_kernel, metric=metric, tb=tb, tile=tile)
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((nq, C), jnp.float32),
            jax.ShapeDtypeStruct((nq, C), jnp.int32),
            jax.ShapeDtypeStruct((nq, C), jnp.float32),
            jax.ShapeDtypeStruct((nq, C), jnp.int32),
            jax.ShapeDtypeStruct((nq, C), jnp.float32),
            jax.ShapeDtypeStruct((nq, C), jnp.int32),
        ),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * nq * npad * d,
            bytes_accessed=npad * d * x.dtype.itemsize + nq * d * 4,
            transcendentals=0,
        ),
    )(*args)


@partial(jax.jit, static_argnames=("metric", "interpret"))
def _count_below(q, x, bias, colscale, thresh, *, metric: Metric, interpret: bool):
    nq, d = q.shape
    npad = x.shape[0]
    tb = _query_block(nq)
    tile = _tile_rows(d)
    q_spec = pl.BlockSpec((tb, d), lambda qb, i: (qb, 0), memory_space=pltpu.VMEM)
    x_spec = pl.BlockSpec((tile, d), lambda qb, i: (i, 0), memory_space=pltpu.VMEM)
    b_spec = pl.BlockSpec((1, tile), lambda qb, i: (0, i), memory_space=pltpu.VMEM)
    t_spec = pl.BlockSpec((tb, 1), lambda qb, i: (qb, 0), memory_space=pltpu.VMEM)
    in_specs = [q_spec, x_spec, b_spec]
    args = [q, x, bias]
    if metric == Metric.COSINE:
        in_specs.append(b_spec)
        args.append(colscale)
    in_specs.append(t_spec)
    args.append(thresh)
    out_spec = pl.BlockSpec((tb, 1), lambda qb, i: (qb, 0), memory_space=pltpu.VMEM)
    grid_spec = pl.GridSpec(
        grid=(nq // tb, npad // tile),
        in_specs=in_specs,
        out_specs=(out_spec, out_spec),
    )
    return pl.pallas_call(
        partial(_count_kernel, metric=metric),
        out_shape=(
            jax.ShapeDtypeStruct((nq, 1), jnp.int32),
            jax.ShapeDtypeStruct((nq, 1), jnp.int32),
        ),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * nq * npad * d,
            bytes_accessed=npad * d * x.dtype.itemsize + nq * d * 4,
            transcendentals=0,
        ),
    )(*args)


def pad_corpus(
    x: Array, sqnorms: Optional[Array], valid: Optional[Array]
) -> Tuple[Array, Array, Array]:
    """Pad corpus rows to a TILE multiple and d to a lane multiple; returns
    (x_pad, sq_pad, valid_pad) with padded rows dead. Host-side, cached by
    the index alongside its device mirror."""
    n, d = x.shape
    rpad = (-n) % TILE_WIDE  # TILE divides TILE_WIDE, so both tile
    # choices divide the padded row count
    cpad = (-d) % 128
    if sqnorms is None:
        sqnorms = jnp.einsum(
            "nd,nd->n", x.astype(jnp.float32), x.astype(jnp.float32)
        )
    if valid is None:
        valid = jnp.ones((n,), bool)
    if rpad or cpad:
        x = jnp.pad(x, ((0, rpad), (0, cpad)))
        sqnorms = jnp.pad(sqnorms, (0, rpad))
        valid = jnp.pad(valid, (0, rpad))
    return x, sqnorms, valid


@partial(jax.jit, static_argnames=("metric", "k", "interpret"))
def scan_topk_fused(
    q: Array,  # [B, d] f32
    x_pad: Array,  # [N_pad, d_pad] storage dtype (pad_corpus output)
    sq_pad: Array,  # [N_pad] f32
    valid_pad: Array,  # [N_pad] bool
    *,
    metric: Metric,
    k: int,
    interpret: bool = False,
) -> Tuple[Array, Array, Array]:
    """Exact-verified top-k via the fused kernels. Same contract as
    ops.scan.scan_topk_verified: (dist [B,k], ids [B,k], exact [B] bool);
    rows with exact=False must be re-run through scan_topk_strict."""
    b, d = q.shape
    dpad = x_pad.shape[1]
    if dpad != d:
        q = jnp.pad(q, ((0, 0), (0, dpad - d)))
    qpad = (-b) % _query_block(b)
    if qpad:
        q = jnp.pad(q, ((0, qpad), (0, 0)))
    q = q.astype(jnp.float32)

    if metric == Metric.L2:
        bias = jnp.where(valid_pad, sq_pad, INVALID_DIST)[None, :]
        colscale = None
        qsq = jnp.sum(q * q, axis=1)
        qk = q
    elif metric == Metric.INNER_PRODUCT:
        bias = jnp.where(valid_pad, 0.0, INVALID_DIST)[None, :]
        colscale = None
        qk = q
    else:  # COSINE: pre-normalize q, scale columns by inv ||x||
        bias = jnp.where(valid_pad, 0.0, INVALID_DIST)[None, :]
        colscale = jnp.where(
            valid_pad & (sq_pad > 0),
            jax.lax.rsqrt(jnp.maximum(sq_pad, 1e-30)),
            0.0,
        )[None, :]
        qn = jnp.sqrt(jnp.maximum(jnp.sum(q * q, axis=1, keepdims=True), 1e-30))
        qk = q / qn

    d1, i1, d2, i2, d3, i3 = _bin_candidates(
        qk, x_pad, bias, colscale, metric=metric, interpret=interpret
    )
    cd = jnp.concatenate([d1, d2, d3], axis=1)  # [B, 3C]
    ci = jnp.concatenate([i1, i2, i3], axis=1)
    kk = min(k, 2 * C)
    sd, si = topk(cd, kk, ids=ci, strict_ties=True)
    tau = sd[:, kk - 1]  # kernel-space; bit-identical to pass-2 distances

    thresh = tau[:, None]
    counts_lt, counts_le = _count_below(
        qk, x_pad, bias, colscale, thresh, metric=metric, interpret=interpret
    )
    counts_lt, counts_le = counts_lt[:, 0], counts_le[:, 0]
    result_below = jnp.sum((sd < thresh).astype(jnp.int32), axis=-1)
    n_valid = jnp.sum(valid_pad.astype(jnp.int32))
    # exact requires (a) every strictly-better row selected and (b) no
    # corpus tau-ties beyond the kk selected: with extra rows at dist == tau
    # the strict (score, id) contract may demand a lower-id tie the binned
    # minima dropped — id-blind counting can't verify that, so flag and let
    # the caller's strict fallback resolve it (ADVICE r2 #2)
    exact = jnp.where(
        jnp.isfinite(tau),
        (counts_lt == result_below) & (counts_le == kk),
        n_valid <= kk,
    )

    # kernel-space -> public ascending distances
    if metric == Metric.L2:
        sd = jnp.where(jnp.isfinite(sd), jnp.maximum(sd + qsq[:, None], 0.0), sd)
    elif metric == Metric.COSINE:
        sd = 1.0 + sd
    si = jnp.where(jnp.isfinite(sd), si, INVALID_ID)
    if qpad:
        sd, si, exact = sd[:b], si[:b], exact[:b]
    if k > kk:  # k exceeds the candidate cap: ranks >= kk are padding, so
        # the result is NOT the exact top-k — report exact=False and let the
        # caller's strict path produce the real ranks (ADVICE r2 #1)
        sd = jnp.concatenate(
            [sd, jnp.full((b, k - kk), INVALID_DIST, sd.dtype)], axis=1
        )
        si = jnp.concatenate(
            [si, jnp.full((b, k - kk), INVALID_ID, si.dtype)], axis=1
        )
        exact = exact & (jnp.sum(valid_pad.astype(jnp.int32)) <= kk)
    return sd, si, exact
