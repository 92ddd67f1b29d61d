"""Pallas TPU kernel: scalar-prefetch IVF-PQ ADC probed search.

The probed counterpart of kernels/adc.py (full-corpus one-hot ADC) and the
PQ sibling of kernels/ivf_probe.py — together the rebuild of the reference's
ADC query pipeline (SURVEY.md §3.3 variant: pq_lut_residual_l2 PQLUT.swift:287
→ adc_scan_u8 over probed lists ADCScan.swift:99).

Key design: the fused per-(query, probe) residual LUT decomposes (see
ops/pq.pq_lut_q_l2) into
    dist = base(q, list) + Σ_j qlut[j, k_j] + t_row
so the kernel carries ONE per-query LUT (VMEM-stationary bf16, [B, m·ks])
instead of B·nprobe LUTs; the per-row constant t streams alongside the code
blocks; base comes from the coarse-select distances and is added in the XLA
epilogue. Per grid step (one (query, probe) pair):
  - double-buffered DMA of the list's live 256-row code blocks (m or m/2
    bytes per row — the whole point of PQ) + the t-correction rows,
  - code-major one-hot expansion in VMEM (never touches HBM),
  - one MXU contraction [B, m·ks] × [BLK, m·ks]ᵀ for the whole query batch,
    one-hot sublane select for the owning query,
  - lane-masked distances written to the candidate matrix.
Epilogue (XLA): + base, position top-C, id gather, optional exact rerank
(ops/ivf_pq.rerank_rows), strict (score, id) top-k.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vectorindex_tpu.kernels.ivf_probe import BLK, KB
from vectorindex_tpu.ops.topk import INVALID_DIST, INVALID_ID, topk
from vectorindex_tpu.utils.config import Metric

Array = jax.Array


def _adc_probe_kernel(
    sb_ref,  # scalar prefetch: [T] i32 start block per (query, probe)
    lr_ref,  # scalar prefetch: [T] i32 live rows per (query, probe)
    lut_ref,  # [B, m·ks] bf16/f32, code-major flat, VMEM-resident
    codes_ref,  # [NB, mb, BLK] u8 (block-transposed), stays in HBM
    tcorr_ref,  # [NB, 1, BLK] f32 per-row corrections, stays in HBM
    out_ref,  # block [1, 1, cap_rows] f32
    cbuf,  # VMEM (2, BLK, mb) u8
    tbuf,  # VMEM (2, 1, BLK) f32
    sems,  # DMA semaphores (2, 2)
    *,
    nprobe: int,
    m: int,
    ks: int,
    packed_u4: bool,
    mxu_dtype,
):
    t = pl.program_id(0)
    qi = t // nprobe
    sb = sb_ref[t]
    nrows = lr_ref[t]
    nch = pl.cdiv(pl.cdiv(nrows, BLK), KB)  # KB-block DMA chunks
    out_ref[:] = jnp.full(out_ref.shape, INVALID_DIST, jnp.float32)

    def code_dma(c, slot):
        return pltpu.make_async_copy(
            codes_ref.at[pl.ds(sb + c * KB, KB)], cbuf.at[slot],
            sems.at[slot, 0],
        )

    def t_dma(c, slot):
        return pltpu.make_async_copy(
            tcorr_ref.at[pl.ds(sb + c * KB, KB)], tbuf.at[slot],
            sems.at[slot, 1],
        )

    @pl.when(nch > 0)
    def _():
        code_dma(0, 0).start()
        t_dma(0, 0).start()

    nq = lut_ref.shape[0]
    sel = (
        jax.lax.broadcasted_iota(jnp.int32, (nq, 1), 0) == qi
    ).astype(jnp.float32)  # [B, 1]
    lut = lut_ref[:]  # [B, m·ks] stationary across the whole grid

    def body(c, carry):
        slot = jax.lax.rem(c, 2)

        @pl.when(c + 1 < nch)
        def _():
            code_dma(c + 1, 1 - slot).start()
            t_dma(c + 1, 1 - slot).start()

        code_dma(c, slot).wait()
        t_dma(c, slot).wait()
        for j in range(KB):  # per 256-row sub-block (static unroll)
            b = c * KB + j
            raw = cbuf[slot, j].astype(jnp.int32)  # [mb, BLK] (block-
            # transposed: codes need BLK on the lane axis — a 16-byte lane
            # dim violates the (32, 128) u8 tiling for DMA slices)
            if packed_u4:
                lo = raw & 0xF
                hi = raw >> 4
                codes = jnp.concatenate([lo, hi], axis=0)  # [m, BLK] lo|hi
            else:
                codes = raw
            # code-major transposed one-hot (adc.py pattern): pltpu.repeat
            # tiles the whole array, so row f encodes (subspace f % m, code
            # f // m) — the caller flattens the LUT code-major
            # (lo|hi-permuted for u4).
            codes_rep = pltpu.repeat(codes, ks, axis=0)  # [m·ks, BLK]
            val = jax.lax.broadcasted_iota(jnp.int32, (m * ks, BLK), 0) // m
            onehot = (codes_rep == val).astype(mxu_dtype)
            g_all = jax.lax.dot_general(
                lut,
                onehot,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [B, BLK]
            g = jnp.sum(g_all * sel, axis=0, keepdims=True)  # [1, BLK]
            dist = g + tbuf[slot, j]
            live = nrows - b * BLK
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, BLK), 1)
            dist = jnp.where(lane < live, dist, INVALID_DIST)
            out_ref[0, :, pl.ds(b * BLK, BLK)] = dist
        return carry

    jax.lax.fori_loop(0, nch, body, 0)


def _adc_rankseg_kernel(
    sb_ref,  # scalar prefetch: [nprobe*B] i32 start BLOCK, rank-major
    lr_ref,  # scalar prefetch: [nprobe*B] i32 live rows, rank-major
    lut_ref,  # [B, m·ks] bf16/f32, code-major flat, VMEM-resident
    codes_ref,  # [NB, mb, BLK] u8 (block-transposed), HBM
    tcorr_ref,  # [NB, 1, BLK] f32, HBM
    out_ref,  # block [1, B, seg_rows] f32
    cbuf,  # VMEM (2, B, sgb, mb, BLK) u8
    tbuf,  # VMEM (2, B, sgb, 1, BLK) f32
    sems,  # DMA semaphores (2, B, 2)
    *,
    nprobe: int,
    nseg: int,
    sgb: int,
    m: int,
    ks: int,
    packed_u4: bool,
    mxu_dtype,
):
    """Rank-segment ADC probe (the PQ sibling of ivf_probe's rank-major
    kernel): the per-(query, probe) grid costs a DMA-latency + sequencing
    wall per step — at B=8, nprobe=32 that is 256 steps for ~2 MB of code
    reads, and the kernel measures ~5x the flat probe that reads 12x the
    bytes. One rank-segment step instead DMAs EVERY query's rank-r list
    segment concurrently (B double-buffered copies in flight) and unrolls
    the one-hot contraction over the B·sgb resident blocks, so the grid
    shrinks to nprobe·nseg steps and the expansion arithmetic — not DMA
    latency — bounds the kernel.

    (A u8 one-hot compare would pack 4x denser on VPU sublanes, but
    Mosaic on v5e rejects vector i8 comparisons — "Target does not support
    this comparison" — so the compare stays in i32 like the pair kernel.)"""
    t = pl.program_id(0)
    b = lut_ref.shape[0]
    seg_rows = sgb * BLK
    r = t // nseg
    s = jax.lax.rem(t, nseg)

    def step_dmas(tt, slot):
        rr = tt // nseg
        ss = jax.lax.rem(tt, nseg)
        base = rr * b
        out = []
        for j in range(b):
            live = lr_ref[base + j] - ss * seg_rows
            start = sb_ref[base + j] + ss * sgb
            out.append(
                (
                    live > 0,
                    pltpu.make_async_copy(
                        codes_ref.at[pl.ds(start, sgb)],
                        cbuf.at[slot, j],
                        sems.at[slot, j, 0],
                    ),
                    pltpu.make_async_copy(
                        tcorr_ref.at[pl.ds(start, sgb)],
                        tbuf.at[slot, j],
                        sems.at[slot, j, 1],
                    ),
                )
            )
        return out

    slot = jax.lax.rem(t, 2)

    @pl.when(t == 0)
    def _():
        for cond, cc, ct in step_dmas(0, 0):
            @pl.when(cond)
            def _():
                cc.start()
                ct.start()

    @pl.when(t + 1 < nprobe * nseg)
    def _():
        for cond, cc, ct in step_dmas(t + 1, 1 - slot):
            @pl.when(cond)
            def _():
                cc.start()
                ct.start()

    for cond, cc, ct in step_dmas(t, slot):
        @pl.when(cond)
        def _():
            cc.wait()
            ct.wait()

    # class-id pattern for the one-hot compare (loop-invariant; the
    # compiler CSEs it across the unroll)
    val = jax.lax.broadcasted_iota(jnp.int32, (m * ks, BLK), 0) // m
    lut = lut_ref[:]  # [B, m·ks]

    for j in range(b):
        live_j = lr_ref[r * b + j] - s * seg_rows
        dists = []
        for u in range(sgb):
            raw = cbuf[slot, j, u].astype(jnp.int32)  # [mb, BLK]
            if packed_u4:
                lo = raw & 0xF
                hi = raw >> 4
                codes = jnp.concatenate([lo, hi], axis=0)  # [m, BLK]
            else:
                codes = raw
            codes_rep = pltpu.repeat(codes, ks, axis=0)  # [m·ks, BLK]
            onehot = (codes_rep == val).astype(mxu_dtype)
            g = jax.lax.dot_general(
                lut[j : j + 1],  # [1, m·ks] — this block belongs to query j
                onehot,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [1, BLK]
            dists.append(g + tbuf[slot, j, u])
        dist = jnp.concatenate(dists, axis=1)  # [1, seg_rows]
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, seg_rows), 1)
        # dead lanes (incl. whole dead segments with uninitialized VMEM)
        # are masked; where() selects INVALID regardless of NaN garbage
        out_ref[0, j : j + 1] = jnp.where(
            lane < live_j, dist, INVALID_DIST
        )


#: rank-segment VMEM budget for the double-buffered code tiles
_ADC_RANKSEG_VMEM = 4 * 1024 * 1024


def _adc_seg_blocks(b: int, kbr: int, mb: int) -> int:
    from vectorindex_tpu.kernels.ivf_probe import GUARD_BLOCKS

    sgb = max(1, _ADC_RANKSEG_VMEM // (2 * b * (mb + 4) * BLK))
    return min(sgb, kbr, GUARD_BLOCKS)


def adc_rankseg_fits(b: int) -> bool:
    """Rank-segment engages at serving batch sizes (B concurrent DMA
    streams + a B-way unrolled kernel body); large batches keep the
    per-pair grid, which pipelines more uniformly."""
    return 1 <= b <= 16


@partial(
    jax.jit,
    static_argnames=("nprobe", "probe_cap", "m", "ks", "packed_u4", "interpret"),
)
def adc_probe_scores_rankseg(
    lut_flat: Array,  # [B, m·ks] code-major flat (already permuted for u4)
    start_rows: Array,  # [B, nprobe] i32 (row units)
    live_rows: Array,  # [B, nprobe] i32
    codes_blocked: Array,  # [NB, mb, BLK] u8
    tcorr_blocked: Array,  # [NB, 1, BLK] f32
    *,
    nprobe: int,
    probe_cap: int,
    m: int,
    ks: int,
    packed_u4: bool = False,
    interpret: bool = False,
) -> Array:
    """Rank-segment ADC partials → [B, nprobe·probe_cap] f32 (+inf dead)."""
    b = lut_flat.shape[0]
    mb = codes_blocked.shape[1]
    assert probe_cap % BLK == 0
    kbr = probe_cap // BLK
    sgb = _adc_seg_blocks(b, kbr, mb)
    nseg = -(-kbr // sgb)
    seg_rows = sgb * BLK
    start_blk = (start_rows // BLK).T.reshape(-1).astype(jnp.int32)
    lens = live_rows.T.reshape(-1).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nprobe * nseg,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # lut (batch-stationary)
            pl.BlockSpec(memory_space=pltpu.HBM),  # codes
            pl.BlockSpec(memory_space=pltpu.HBM),  # tcorr
        ],
        out_specs=pl.BlockSpec(
            (1, b, seg_rows), lambda i, sb, lr: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, b, sgb, mb, BLK), jnp.uint8),
            pltpu.VMEM((2, b, sgb, 1, BLK), jnp.float32),
            pltpu.SemaphoreType.DMA((2, b, 2)),
        ],
    )
    mxu_dtype = jnp.float32 if interpret else jnp.bfloat16
    out = pl.pallas_call(
        partial(
            _adc_rankseg_kernel,
            nprobe=nprobe, nseg=nseg, sgb=sgb, m=m, ks=ks,
            packed_u4=packed_u4, mxu_dtype=mxu_dtype,
        ),
        out_shape=jax.ShapeDtypeStruct((nprobe * nseg, b, seg_rows), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(start_blk, lens, lut_flat.astype(mxu_dtype), codes_blocked, tcorr_blocked)
    # [nprobe·nseg, B, seg] → [B, nprobe, nseg·seg] → clip to probe_cap
    out = (
        out.reshape(nprobe, nseg, b, seg_rows)
        .transpose(2, 0, 1, 3)
        .reshape(b, nprobe, nseg * seg_rows)[:, :, :probe_cap]
    )
    return out.reshape(b, nprobe * probe_cap)


@partial(
    jax.jit,
    static_argnames=("nprobe", "probe_cap", "m", "ks", "packed_u4", "interpret"),
)
def adc_probe_scores(
    lut_q: Array,  # [B, m, ks] f32 query-only LUT (pq_lut_q_l2 / pq_lut_ip)
    start_rows: Array,  # [B, nprobe] i32
    live_rows: Array,  # [B, nprobe] i32
    codes: Array,  # [N_pad, m] u8 or [N_pad, m//2] packed u4
    tcorr: Array,  # [N_pad] f32 per-row corrections (zeros for IP)
    *,
    nprobe: int,
    probe_cap: int,
    m: int,
    ks: int,
    packed_u4: bool = False,
    interpret: bool = False,
) -> Array:
    """ADC partial distances (WITHOUT the base(q, list) term) for every
    (query, probe, slot) → [B, nprobe·probe_cap] f32, +inf in dead slots.
    Serving batches (B <= 16) route through the rank-segment grid."""
    b = lut_q.shape[0]
    n_pad, mb = codes.shape
    assert probe_cap % BLK == 0 and n_pad % BLK == 0
    cap_rows = -(-probe_cap // (KB * BLK)) * (KB * BLK)
    t = b * nprobe
    nb = n_pad // BLK
    # block-transpose: [NB, mb, BLK] keeps the 256 rows on the lane axis
    # packers allocate KB-1 trailing guard blocks (see kernels/ivf_probe) —
    # padding here would copy the code array every search call
    codes_blocked = codes.reshape(nb, BLK, mb).transpose(0, 2, 1)
    tcorr_blocked = tcorr.astype(jnp.float32).reshape(nb, 1, BLK)
    start_blk = (start_rows // BLK).reshape(t).astype(jnp.int32)
    lens = live_rows.reshape(t).astype(jnp.int32)

    mxu_dtype = jnp.float32 if interpret else jnp.bfloat16
    if packed_u4:
        # kernel unpacks lo|hi-concatenated; permute subspaces to match,
        # then flatten code-major (adc.py u4 pattern)
        perm = jnp.concatenate(
            [jnp.arange(0, m, 2, dtype=jnp.int32), jnp.arange(1, m, 2, dtype=jnp.int32)]
        )
        lut_flat = (
            lut_q[:, perm, :].transpose(0, 2, 1).reshape(b, ks * m)
        )
    else:
        lut_flat = lut_q.transpose(0, 2, 1).reshape(b, ks * m)
    lut_flat = lut_flat.astype(mxu_dtype)

    if adc_rankseg_fits(b):
        return adc_probe_scores_rankseg(
            lut_flat, start_rows, live_rows, codes_blocked, tcorr_blocked,
            nprobe=nprobe, probe_cap=probe_cap, m=m, ks=ks,
            packed_u4=packed_u4, interpret=interpret,
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(t,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # lut (batch-stationary)
            pl.BlockSpec(memory_space=pltpu.HBM),  # codes
            pl.BlockSpec(memory_space=pltpu.HBM),  # tcorr
        ],
        out_specs=pl.BlockSpec(
            (1, 1, cap_rows), lambda i, sb, lr: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, KB, mb, BLK), jnp.uint8),
            pltpu.VMEM((2, KB, 1, BLK), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    out = pl.pallas_call(
        partial(
            _adc_probe_kernel,
            nprobe=nprobe, m=m, ks=ks, packed_u4=packed_u4,
            mxu_dtype=mxu_dtype,
        ),
        out_shape=jax.ShapeDtypeStruct((t, 1, cap_rows), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(start_blk, lens, lut_flat, codes_blocked, tcorr_blocked)
    out = out.reshape(b, nprobe, cap_rows)[:, :, :probe_cap]
    return out.reshape(b, nprobe * probe_cap)


def _dedup_missing(iids: Array, missing: Array) -> Array:
    """Mark all-but-the-first occurrence of each candidate id as missing —
    required under spill multi-assignment (ops.ivf.spill_assign), where a
    corpus row can reach the top-C from two lists. Kernel #32's
    position-preserving dedup (ops.dedup.dedup_mask)."""
    from vectorindex_tpu.ops.dedup import dedup_mask

    return dedup_mask(iids, missing)


@partial(
    jax.jit,
    static_argnames=(
        "nprobe", "probe_cap", "k", "metric", "packed_u4", "rerank_c",
        "dedup", "interpret",
    ),
)
def ivf_search_pq_pallas(
    q: Array,
    centroids: Array,
    arrays,  # ops.ivf.IVFListArrays
    codes: Array,  # [N_pad, m] u8 / [N_pad, m//2] u4, CSR layout
    tcorr: Array,  # [N_pad] f32 (pq_row_corrections; zeros for IP)
    books,  # ops.pq.PQCodebooks
    *,
    nprobe: int,
    probe_cap: int,
    k: int,
    metric: Metric = Metric.L2,
    packed_u4: bool = False,
    rerank_c: int = 0,
    slot_rows: Optional[Array] = None,  # needed when rerank_c > 0
    rerank_vecs: Optional[Array] = None,  # [n, d_pad] rerank source in
    #   ORIGINAL row order, gathered by internal id instead of CSR row.
    #   Under spill multi-assignment this keeps ONE copy of the corpus on
    #   device (CSR-ordered vecs would duplicate every spilled row), and
    #   the same buffer can back a fused flat scan (bench crossover leg).
    rerank_sqnorms: Optional[Array] = None,  # [n] f32 ‖x‖² (original order)
    row_allow: Optional[Array] = None,  # [N_pad] bool allow mask in CSR row
    #   order — masked BEFORE top-C selection (reference IDFilter.swift:104
    #   allow/deny threading), so k results survive selective filters
    disabled_lists: Optional[Array] = None,  # [kc] bool (IVFSelect.swift:16)
    dedup: bool = False,  # required under spill multi-assignment: a row's
    #   two CSR copies share an internal id — keep one (kernel #32 contract)
    interpret: bool = False,
) -> Tuple[Array, Array]:
    """IVF-PQ ADC probed search → (dist [B,k], internal ids [B,k]).

    Drop-in for ops.ivf_pq.ivf_search_pq with the Pallas ADC kernel in the
    hot seat (+ optional fused exact rerank of the ADC top-C)."""
    from vectorindex_tpu.ops import pq as pq_ops
    from vectorindex_tpu.ops.ivf import ivf_select

    b, d = q.shape
    q = q.astype(jnp.float32)
    m, ks, _ = books.centroids.shape
    # ivf_select clamps nprobe to nlist; the kernel's scalar tables must
    # agree or the grid would read past the prefetched (start, len) entries
    nprobe = min(nprobe, centroids.shape[0])
    sel_dist, probe_lists = ivf_select(
        q, centroids, nprobe=nprobe, metric=metric, disabled=disabled_lists
    )
    if metric == Metric.L2:
        lut_q = pq_ops.pq_lut_q_l2(q, books)
        base = sel_dist  # ‖q−c_l‖² from the coarse select
    elif metric == Metric.INNER_PRODUCT:
        lut_q = pq_ops.pq_lut_ip(q, books)
        base = sel_dist  # −⟨q, c_l⟩
    else:
        raise ValueError("ivf_search_pq_pallas supports L2 and IP")

    start_rows = arrays.starts[probe_lists]
    live_rows = arrays.lengths[probe_lists]
    if disabled_lists is not None:
        # nprobe == nlist still selects disabled lists (ranked last by
        # +inf) — zero their live length so no row of them is scanned
        live_rows = jnp.where(jnp.isfinite(sel_dist), live_rows, 0)
    partial_d = adc_probe_scores(
        lut_q, start_rows, live_rows, codes, tcorr,
        nprobe=nprobe, probe_cap=probe_cap, m=m, ks=ks,
        packed_u4=packed_u4, interpret=interpret,
    )  # [B, nprobe·cap] (no base term; +inf dead)
    dist = (
        partial_d.reshape(b, nprobe, probe_cap) + base[:, :, None]
    ).reshape(b, nprobe * probe_cap)
    if row_allow is not None:
        # mask BEFORE top-C: dead slots are already +inf, so clipping onto
        # row 0 only ever masks more, never leaks a denied row
        slot_of = jnp.clip(
            start_rows[:, :, None]
            + jax.lax.broadcasted_iota(jnp.int32, (1, 1, probe_cap), 2),
            0,
            row_allow.shape[0] - 1,
        )
        allow = row_allow[slot_of].reshape(b, nprobe * probe_cap)
        dist = jnp.where(allow, dist, INVALID_DIST)

    p = dist.shape[1]
    kk = min(k, p)
    c = min(max(rerank_c, 4 * kk, 128), p)
    cd, cp = topk(dist, c, strict_ties=False)
    probe_of = cp // probe_cap
    off = cp % probe_cap
    rows = jnp.take_along_axis(start_rows, probe_of, axis=1) + off
    rows = jnp.clip(rows, 0, arrays.row_ids.shape[0] - 1)
    iids = arrays.row_ids[rows]
    missing = ~jnp.isfinite(cd)
    if dedup:
        missing = _dedup_missing(iids, missing)
        # mask the DISTANCES of dedup'd duplicates as well: the
        # rerank_c=0 path ranks by cd directly, and a duplicate keeping
        # its finite ADC distance would land an INVALID_ID mid-top-k —
        # consumers break at the first invalid slot and silently
        # truncate the row (round-5 review finding)
        cd = jnp.where(missing, INVALID_DIST, cd)
    iids = jnp.where(missing, INVALID_ID, iids)

    if rerank_c:
        # exact rerank of the ADC top-C against the original vectors
        # (reference IVFPostADC.rerankTopKFlat + #40)
        if rerank_vecs is not None:
            # id-keyed gather into the ORIGINAL-order source (iids carry
            # original corpus ids via arrays.row_ids)
            gidx = jnp.clip(
                jnp.where(missing, 0, iids), 0, rerank_vecs.shape[0] - 1
            )
            xg = rerank_vecs[gidx].astype(jnp.float32)
            sg = rerank_sqnorms[gidx]
        else:
            rrows = jnp.where(missing, 0, rows)
            xg = arrays.vecs[rrows].astype(jnp.float32)
            sg = arrays.sqnorms[rrows]
        qr = q
        if q.shape[1] != xg.shape[-1]:  # lane-padded rerank source
            qr = jnp.pad(q, ((0, 0), (0, xg.shape[-1] - q.shape[1])))
        g = jnp.einsum(
            "bd,bcd->bc", qr, xg,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        if metric == Metric.L2:
            qn = jnp.sum(jnp.square(q), axis=-1)
            ex = jnp.maximum(qn[:, None] + sg - 2.0 * g, 0.0)
        else:
            ex = -g
        ex = jnp.where(missing, INVALID_DIST, ex)
        sd, si = topk(ex, kk, ids=iids, strict_ties=True)
    else:
        sd, si = topk(cd, kk, ids=iids, strict_ties=True)
        if metric == Metric.L2:
            sd = jnp.where(jnp.isfinite(sd), jnp.maximum(sd, 0.0), sd)
    if kk < k:
        padk = k - kk
        sd = jnp.concatenate(
            [sd, jnp.full((b, padk), INVALID_DIST, sd.dtype)], axis=1
        )
        si = jnp.concatenate(
            [si, jnp.full((b, padk), INVALID_ID, si.dtype)], axis=1
        )
    return sd, si


# ---------------------------------------------------------------------------
# host-memory rerank tier (VectorReader seam)
# ---------------------------------------------------------------------------


@partial(
    jax.jit,
    static_argnames=(
        "nprobe", "probe_cap", "c", "metric", "packed_u4", "dedup",
        "interpret",
    ),
)
def pq_probe_candidates(
    q: Array,
    centroids: Array,
    arrays,  # ops.ivf.IVFListArrays (vecs/sqnorms may be None — unused)
    codes: Array,
    tcorr: Array,
    books,
    *,
    nprobe: int,
    probe_cap: int,
    c: int,
    metric: Metric = Metric.L2,
    packed_u4: bool = False,
    row_allow: Optional[Array] = None,  # [N_pad] bool, CSR row order
    disabled_lists: Optional[Array] = None,  # [kc] bool
    dedup: bool = False,  # spill multi-assignment: drop duplicate-id copies
    interpret: bool = False,
) -> Tuple[Array, Array, Array]:
    """ADC probe → top-C candidates only: (adc_dist [B,c] f32,
    csr_rows [B,c] i32 clipped, internal ids [B,c] i32, INVALID where dead).

    The device half of the host-rerank tier: nothing here touches the
    full-precision vectors, so `arrays` may carry vecs=None/sqnorms=None —
    HBM holds codes (+tcorr +row_ids) only, ~24 B/row at pq16."""
    from vectorindex_tpu.ops import pq as pq_ops
    from vectorindex_tpu.ops.ivf import ivf_select

    b, d = q.shape
    q = q.astype(jnp.float32)
    m, ks, _ = books.centroids.shape
    nprobe = min(nprobe, centroids.shape[0])
    sel_dist, probe_lists = ivf_select(
        q, centroids, nprobe=nprobe, metric=metric, disabled=disabled_lists
    )
    if metric == Metric.L2:
        lut_q = pq_ops.pq_lut_q_l2(q, books)
    elif metric == Metric.INNER_PRODUCT:
        lut_q = pq_ops.pq_lut_ip(q, books)
    else:
        raise ValueError("pq_probe_candidates supports L2 and IP")
    base = sel_dist

    start_rows = arrays.starts[probe_lists]
    live_rows = arrays.lengths[probe_lists]
    if disabled_lists is not None:
        # nprobe == nlist still selects disabled lists (ranked last by
        # +inf) — zero their live length so no row of them is scanned
        live_rows = jnp.where(jnp.isfinite(sel_dist), live_rows, 0)
    partial_d = adc_probe_scores(
        lut_q, start_rows, live_rows, codes, tcorr,
        nprobe=nprobe, probe_cap=probe_cap, m=m, ks=ks,
        packed_u4=packed_u4, interpret=interpret,
    )
    dist = (
        partial_d.reshape(b, nprobe, probe_cap) + base[:, :, None]
    ).reshape(b, nprobe * probe_cap)
    if row_allow is not None:
        slot_of = jnp.clip(
            start_rows[:, :, None]
            + jax.lax.broadcasted_iota(jnp.int32, (1, 1, probe_cap), 2),
            0,
            row_allow.shape[0] - 1,
        )
        allow = row_allow[slot_of].reshape(b, nprobe * probe_cap)
        dist = jnp.where(allow, dist, INVALID_DIST)
    cc = min(c, dist.shape[1])
    cd, cp = topk(dist, cc, strict_ties=False)
    probe_of = cp // probe_cap
    off = cp % probe_cap
    rows = jnp.take_along_axis(start_rows, probe_of, axis=1) + off
    rows = jnp.clip(rows, 0, arrays.row_ids.shape[0] - 1)
    iids = arrays.row_ids[rows]
    missing = ~jnp.isfinite(cd)
    if dedup:
        missing = _dedup_missing(iids, missing)
        cd = jnp.where(missing, INVALID_DIST, cd)
    rows = jnp.where(missing, 0, rows)
    iids = jnp.where(missing, INVALID_ID, iids)
    return cd, rows, iids


def ivf_search_pq_hostrerank(
    q,
    centroids: Array,
    arrays,  # vecs/sqnorms may be None (codes-only HBM residency)
    codes: Array,
    tcorr: Array,
    books,
    reader,  # ops.rerank.VectorReader — host/full-precision source
    *,
    nprobe: int,
    probe_cap: int,
    k: int,
    rerank_c: int = 128,
    metric: Metric = Metric.L2,
    packed_u4: bool = False,
    row_allow: Optional[Array] = None,
    disabled_lists: Optional[Array] = None,
    dedup: bool = False,  # REQUIRED under spill multi-assignment, like the
    #   HBM path: duplicate-id candidates otherwise waste top-k slots
    host_rerank: bool = True,
    interpret: bool = False,
) -> Tuple[Array, Array]:
    """IVF-PQ search with the exact-rerank source OUTSIDE device memory
    (reference VectorReader seam, ExactRerank.swift:81-96).

    Three stages: (1) on-device ADC probe + top-C (pq_probe_candidates),
    (2) host gather of ONLY the B·C winning rows through `reader`,
    (3) exact f32 rerank + strict (score, id) top-k — on the HOST by
    default (rerank_gathered_host: the rows are already in host RAM and
    the reference reranks on CPU too, ExactRerank.swift:655; shipping
    them back to the device costs B·C·d·4 bytes of PCIe each way for
    ~25 MFLOP of work). host_rerank=False keeps the round-3 device-rerank
    path (ops.rerank.rerank_gathered) for sources already near the device."""
    from vectorindex_tpu.ops.rerank import rerank_gathered, rerank_gathered_host

    qnp = np.asarray(q, dtype=np.float32)
    q = jnp.asarray(qnp)
    b, d = q.shape
    p = min(nprobe, centroids.shape[0]) * probe_cap
    kk = min(k, p)
    c = min(max(rerank_c, 4 * kk, 128), p)
    cd, rows, iids = pq_probe_candidates(
        q, centroids, arrays, codes, tcorr, books,
        nprobe=nprobe, probe_cap=probe_cap, c=c, metric=metric,
        packed_u4=packed_u4, row_allow=row_allow,
        disabled_lists=disabled_lists, dedup=dedup, interpret=interpret,
    )
    if host_rerank and hasattr(reader, "gather_ids"):
        # iids double as gather key and missing/dedup sentinel: ONE [B,C]
        # i32 array crosses the link per batch instead of (rows, iids) —
        # half the per-batch PCIe/relay bytes of the rows-keyed path
        iids_np = np.asarray(iids)
        # explicit contract gate: reader.vecs must be ORIGINAL-id-indexed
        # (CSRReader.vecs_id_indexed) — a reader exposing a CSR-ordered or
        # otherwise non-id-indexed `vecs` must not reach the native kernel
        src = (
            getattr(reader, "vecs", None)
            if getattr(reader, "vecs_id_indexed", False)
            else None
        )
        if src is not None:
            # FUSED native gather+score+topk (hostops.cpp): one streaming
            # pass over the candidate rows, no [B,C,d] intermediate — the
            # id-indexed `vecs` array IS gather_ids' source, so semantics
            # match exactly (~7x the numpy pipeline on a 1-core host)
            from vectorindex_tpu.ops.rerank import rerank_ids_host

            out = rerank_ids_host(src, iids_np, qnp, k=k, metric=metric)
            if out is not None:
                return out
        g = reader.gather_ids(iids_np.reshape(-1))
        if g.shape[-1] > d:
            g = np.ascontiguousarray(g[:, :d])
        xg = g.reshape(b, iids_np.shape[1], g.shape[-1])
        return rerank_gathered_host(
            qnp, xg, iids_np, k=k, metric=metric
        )
    rows_np = np.asarray(rows)  # [B, c] device→host
    g = reader.gather(rows_np.reshape(-1))  # [B·c, d or d_pad] — a reader
    # may serve lane-padded rows (e.g. ArrayReader over packed storage);
    # keep only the logical-d columns (pad cols are zeros)
    if g.shape[-1] > d:
        g = np.ascontiguousarray(g[:, :d])
    xg = g.reshape(b, rows_np.shape[1], g.shape[-1])
    if host_rerank:
        # results stay host-side (numpy): nothing returns to the device
        return rerank_gathered_host(
            qnp, xg, np.asarray(iids), k=k, metric=metric
        )
    return rerank_gathered(
        q, jnp.asarray(xg), cd, iids, k=k, metric=metric
    )


def ivf_search_pq_hostrerank_stream(
    q_batches,  # iterable of [B, d] query batches (numpy or device)
    centroids: Array,
    arrays,
    codes: Array,
    tcorr: Array,
    books,
    reader,
    *,
    nprobe: int,
    probe_cap: int,
    k: int,
    rerank_c: int = 128,
    metric: Metric = Metric.L2,
    packed_u4: bool = False,
    row_allow: Optional[Array] = None,
    disabled_lists: Optional[Array] = None,
    dedup: bool = False,
    host_rerank: bool = True,
    lookahead: int = 3,
    interpret: bool = False,
):
    """PIPELINED host-rerank serving (VERDICT r3 next #7): the device
    candidate kernels for the next `lookahead` batches are dispatched
    BEFORE batch i's host gather + rerank complete, so the device stage,
    the PCIe transfers, and the host rerank overlap — steady-state
    throughput approaches max(stage) instead of their sum (the reference
    pipelines gather tiles the same way — ExactRerank.swift:21-64
    gatherTile/reorderBySegment).

    host_rerank=True (default) reranks on the CPU (rerank_gathered_host):
    only the candidate ids cross the link per batch (B·C·4 bytes via
    reader.gather_ids; B·C·8 for rows-keyed readers without it),
    and results never touch the device — the production host-tier loop.
    The device-rerank mode additionally ships the B·C gathered rows back
    (B·C·d·4 bytes each way), which round 3 measured as the entire e2e
    gap under the axon tunnel. Yields (dist [B,k], ids [B,k]) per batch,
    in order."""
    from collections import deque
    from concurrent.futures import ThreadPoolExecutor

    from vectorindex_tpu.ops.rerank import (
        native_rerank_available,
        rerank_gathered,
        rerank_gathered_host,
    )

    use_ids = host_rerank and hasattr(reader, "gather_ids")
    native_src = (
        getattr(reader, "vecs", None)
        if use_ids and getattr(reader, "vecs_id_indexed", False)
        else None
    )
    if native_src is not None and not native_rerank_available(native_src):
        # probe native usability ONCE at setup: when the fused kernel
        # would decline (no g++, non-f32/strided vecs), fall back NOW so
        # dispatch() keeps the worker-side gather overlap instead of
        # running a synchronous 25 MB gather per batch in finish()
        native_src = None
    # one fetch worker: device→host transfers for batch i+1 overlap with
    # batch i's host gather+rerank (the transfer is link-wait, not CPU, so
    # the overlap is real even on a single-core host); order is preserved
    # by the single worker + the pending deque
    fetcher = ThreadPoolExecutor(max_workers=1)

    def dispatch(qb):
        qnp = np.asarray(qb, dtype=np.float32)
        qd = jnp.asarray(qnp)
        b, d = qd.shape
        p = min(nprobe, centroids.shape[0]) * probe_cap
        kk = min(k, p)
        c = min(max(rerank_c, 4 * kk, 128), p)
        cd, rows, iids = pq_probe_candidates(
            qd, centroids, arrays, codes, tcorr, books,
            nprobe=nprobe, probe_cap=probe_cap, c=c, metric=metric,
            packed_u4=packed_u4, row_allow=row_allow,
            disabled_lists=disabled_lists, dedup=dedup, interpret=interpret,
        )
        if use_ids:
            # iids alone key the gather (reader.gather_ids) AND carry the
            # missing/dedup sentinel — one [B,C] i32 crosses the link.
            # Start the D2H copy NOW: with `lookahead` batches in flight
            # the runtime overlaps their link transfers, so per-batch
            # relay latency amortizes without any thread fan-out.
            if hasattr(iids, "copy_to_host_async"):
                iids.copy_to_host_async()
            if native_src is not None:
                # fused native rerank reads rows straight out of
                # reader.vecs in finish(); the worker only lands the ids
                fut = fetcher.submit(np.asarray, iids)
            else:
                # numpy path: the worker also runs the host GATHER, so on
                # multi-core hosts the 25 MB row copy for batch i+1
                # overlaps batch i's rerank (numpy releases the GIL).
                def _fetch(i_dev=iids, dd=d):
                    iids_np = np.asarray(i_dev)
                    g = reader.gather_ids(iids_np.reshape(-1))
                    if g.shape[-1] > dd:
                        g = np.ascontiguousarray(g[:, :dd])
                    return iids_np, g

                fut = fetcher.submit(_fetch)
        elif host_rerank:

            def _fetch_rows(r_dev=rows, i_dev=iids, dd=d):
                rows_np = np.asarray(r_dev)
                g = reader.gather(rows_np.reshape(-1))
                if g.shape[-1] > dd:
                    g = np.ascontiguousarray(g[:, :dd])
                return np.asarray(i_dev), g

            fut = fetcher.submit(_fetch_rows)
        else:
            fut = fetcher.submit(np.asarray, rows)
        return qnp, qd, cd, iids, fut, d

    def finish(pend):
        qnp, qd, cd, iids, fut, d = pend
        if use_ids and native_src is not None:
            from vectorindex_tpu.ops.rerank import rerank_ids_host

            iids_np = fut.result()  # blocks on THIS batch's link fetch only
            out = rerank_ids_host(
                native_src, iids_np, qnp, k=k, metric=metric
            )
            if out is not None:
                return out
            g = reader.gather_ids(np.asarray(iids_np).reshape(-1))
            if g.shape[-1] > d:
                g = np.ascontiguousarray(g[:, :d])
            xg = g.reshape(qnp.shape[0], iids_np.shape[1], g.shape[-1])
            return rerank_gathered_host(
                qnp, xg, iids_np, k=k, metric=metric
            )
        if host_rerank:
            iids_np, g = fut.result()  # blocks on THIS batch only
            xg = g.reshape(qnp.shape[0], iids_np.shape[1], g.shape[-1])
            return rerank_gathered_host(
                qnp, xg, iids_np, k=k, metric=metric
            )
        rows_np = fut.result()
        g = reader.gather(rows_np.reshape(-1))
        if g.shape[-1] > d:
            g = np.ascontiguousarray(g[:, :d])
        xg = g.reshape(qd.shape[0], rows_np.shape[1], g.shape[-1])
        return rerank_gathered(
            qd, jnp.asarray(xg), cd, iids, k=k, metric=metric
        )

    pending = deque()
    try:
        for qb in q_batches:
            # drain BEFORE dispatching so at most `lookahead` batches are
            # ever in flight (dispatch-then-drain held lookahead+1)
            if len(pending) >= max(lookahead, 1):
                yield finish(pending.popleft())
            pending.append(dispatch(qb))  # enqueued async
        while pending:
            yield finish(pending.popleft())
    finally:
        fetcher.shutdown(wait=False)
