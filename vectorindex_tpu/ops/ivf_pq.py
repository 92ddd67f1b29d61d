"""IVF-PQ probed search: residual LUTs + ADC over probed lists + rerank.

Parity target: the reference's ADC query pipeline (SURVEY.md §3.3 variant):
  pq_query_subnorms → pq_lut_residual_l2 (#21, PQLUT.swift:287) →
  adc_scan_u8 over probed lists (#22, ADCScan.swift:99) →
  IVFPostADC.rerankTopKFlat exact re-rank (IVFPostADC.swift:21),
plus the pq8/pq4 list formats of ivf_append (IVFAppendOpts.format,
IVFAppend.swift:30).

TPU-native design: for a query batch and its probed lists, the residual LUTs
[B, P, m, ks] build in one batched einsum; ADC is a doubly-vmapped gather
over block-contiguous code rows; candidates come back through the strict
masked top-k; optional exact rerank re-scores the top-C against the original
vectors (kept in the same CSR layout).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from vectorindex_tpu.ops import pq as pq_ops
from vectorindex_tpu.ops import scoring
from vectorindex_tpu.ops.ivf import IVFListArrays, ivf_select
from vectorindex_tpu.ops.topk import INVALID_ID, topk_padded
from vectorindex_tpu.utils.config import Metric

Array = jax.Array


@partial(
    jax.jit,
    static_argnames=("nprobe", "probe_cap", "k", "metric", "query_chunk", "packed_u4"),
)
def ivf_search_pq(
    q: Array,
    centroids: Array,
    arrays: IVFListArrays,  # .vecs unused here; starts/lengths/row_ids used
    codes: Array,  # [N_pad, m] u8 (or [N_pad, m//2] packed u4), CSR layout
    books: pq_ops.PQCodebooks,
    *,
    nprobe: int,
    probe_cap: int,
    k: int,
    metric: Metric = Metric.L2,
    query_chunk: int = 8,
    packed_u4: bool = False,
    row_allow: Optional[Array] = None,  # [N_pad] bool, CSR row order —
    #   masked into vmask BEFORE top-k (IDFilter.swift:104 allow/deny)
    disabled_lists: Optional[Array] = None,  # [kc] bool (IVFSelect.swift:16)
) -> Tuple[Array, Array]:
    """ADC search over probed lists → (adc_dist [B,k], internal ids [B,k]).

    L2 only uses residual LUTs (IVF-PQ codes are residuals r = x − c_list);
    for IP the LUT is −⟨q, c_j[·]⟩ plus the −⟨q, c_list⟩ offset per list.
    """
    b = q.shape[0]
    m, ks, dsub = books.centroids.shape
    if packed_u4:
        # pq4 format (reference IVFFormat.pq4): codes live packed at rest;
        # the transient unpack happens on-device per search
        from vectorindex_tpu.ops.dtypes import unpack_u4

        codes = unpack_u4(codes)
    sel_d, probe_lists = ivf_select(
        q, centroids, nprobe=nprobe, metric=metric, disabled=disabled_lists
    )
    sel_live = jnp.isfinite(sel_d) if disabled_lists is not None else None

    offsets = (jnp.arange(m, dtype=jnp.int32) * ks)[None, :]  # [1, m]

    def chunk_fn(args):
        qc, pl, plive = args  # [C, d], [C, nprobe], [C, nprobe]
        c = qc.shape[0]
        if metric == Metric.L2:
            lut = pq_ops.pq_lut_residual_l2(qc, centroids, pl, books)
        elif metric == Metric.INNER_PRODUCT:
            # codes quantize residuals; −⟨q,x⟩ = −⟨q,c_list⟩ − ⟨q,r⟩, so use
            # the plain IP LUT here and add the per-list coarse term after ADC
            base = pq_ops.pq_lut_ip(qc, books)  # [C, m, ks]
            lut = jnp.broadcast_to(base[:, None], (c, pl.shape[1], m, ks))
        else:
            raise ValueError("ivf_search_pq supports L2 and IP")
        lut_flat = lut.reshape(c, pl.shape[1], m * ks)

        starts = arrays.starts[pl]  # [C, P]
        lens = jnp.where(plive, arrays.lengths[pl], 0)
        offs = jax.lax.broadcasted_iota(jnp.int32, (1, 1, probe_cap), 2)
        rows = jnp.where(offs < lens[:, :, None], starts[:, :, None] + offs, 0)
        vmask = (offs < lens[:, :, None])  # [C, P, cap]
        if row_allow is not None:
            vmask = vmask & row_allow[rows]
        code_rows = codes[rows]  # [C, P, cap, m] u8
        flat_idx = code_rows.astype(jnp.int32) + offsets[None, None]  # [C,P,cap,m]

        def per_probe(lutf, fc):
            # lutf [m*ks], fc [cap, m] → [cap]
            return jnp.sum(lutf[fc], axis=-1)

        adc = jax.vmap(jax.vmap(per_probe))(lut_flat, flat_idx)  # [C, P, cap]

        if metric == Metric.INNER_PRODUCT:
            coarse_dot = jnp.einsum(
                "cd,cpd->cp", qc.astype(jnp.float32), centroids[pl]
            )
            adc = adc - coarse_dot[:, :, None]

        ids = arrays.row_ids[rows]  # [C, P, cap]
        adc = adc.reshape(c, -1)
        return topk_padded(
            adc, vmask.reshape(c, -1), k, ids=ids.reshape(c, -1)
        )

    cq = min(query_chunk, b)
    pad = (-b) % cq
    if pad:
        q = jnp.concatenate([q, jnp.zeros((pad, q.shape[1]), q.dtype)])
        probe_lists = jnp.concatenate(
            [probe_lists, jnp.zeros((pad, probe_lists.shape[1]), probe_lists.dtype)]
        )
    if sel_live is None:
        sel_live = jnp.ones(probe_lists.shape, bool)
    elif pad:
        sel_live = jnp.concatenate(
            [sel_live, jnp.zeros((pad, sel_live.shape[1]), bool)]
        )
    qs = q.reshape(-1, cq, q.shape[1])
    pls = probe_lists.reshape(-1, cq, probe_lists.shape[1])
    plv = sel_live.reshape(-1, cq, sel_live.shape[1])
    dists, ids = jax.lax.map(chunk_fn, (qs, pls, plv))
    return dists.reshape(-1, k)[:b], ids.reshape(-1, k)[:b]


@partial(jax.jit, static_argnames=("k", "metric"))
def rerank_rows(
    q: Array,
    cand_ids: Array,  # [B, C] internal ids (INVALID_ID padded)
    slot_rows: Array,  # [max_slot+1] int32: internal id -> CSR row (-1 absent)
    vecs: Array,
    sqnorms: Array,
    *,
    k: int,
    metric: Metric = Metric.L2,
) -> Tuple[Array, Array]:
    """Exact rerank of ADC candidates against original vectors (reference
    IVFPostADC.rerankTopKFlat + #40). cand ids map to CSR rows via the
    device-side slot→row table."""
    if q.shape[1] != vecs.shape[1]:  # lane-padded rerank source
        q = jnp.pad(q, ((0, 0), (0, vecs.shape[1] - q.shape[1])))
    missing = cand_ids == INVALID_ID
    rows = slot_rows[jnp.where(missing, 0, cand_ids)]
    missing = missing | (rows < 0)
    rows = jnp.where(missing, 0, rows)
    xg = vecs[rows]
    sg = sqnorms[rows]
    g = jnp.einsum(
        "bd,bcd->bc", q.astype(jnp.float32), xg.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    if metric == Metric.L2:
        qn = jnp.sum(jnp.square(q.astype(jnp.float32)), axis=-1)
        dist = jnp.maximum(qn[:, None] + sg - 2.0 * g, 0.0)
    elif metric == Metric.INNER_PRODUCT:
        dist = -g
    else:
        qinv = scoring.inv_norms(q)
        xinv = jnp.where(sg > 0, jax.lax.rsqrt(jnp.maximum(sg, 1e-30)), 0.0)
        dist = 1.0 - g * qinv[:, None] * xinv
    return topk_padded(dist, ~missing, k, ids=cand_ids)
