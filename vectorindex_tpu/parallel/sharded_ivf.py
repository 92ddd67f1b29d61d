"""Sharded IVF: inverted lists partitioned across the device mesh.

The distributed extension of ops/ivf.py (no reference analog — the
reference is single-node; SURVEY.md §5.8 maps its partition-then-merge
threading to exactly this): centroids replicate, the CSR list storage
shards by *list* (contiguous list groups balanced by row count), every
device scores the probed lists it owns for the whole query batch, and the
per-shard top-k lists merge deterministically over ICI.

Search contract: identical results to single-device ivf_search_flat for the
same nprobe (each probed list lives on exactly one shard; union of shards
== union of probes; the merge keeps the strict (score, id) order).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from vectorindex_tpu.ops import scoring
from vectorindex_tpu.ops.ivf import IVFListStore, ivf_select
from vectorindex_tpu.ops.topk import INVALID_DIST, INVALID_ID, merge_topk, topk_padded
from vectorindex_tpu.parallel.mesh import DATA_AXIS
from vectorindex_tpu.parallel.sharded_search import shard_map

Array = jax.Array


class ShardedIVFArrays(NamedTuple):
    """Device-sharded CSR views. Rows shard along axis 0; per-list tables
    are per-shard (leading shard axis folded into row blocks)."""

    vecs: Array  # [S*rows_per_shard, d] sharded on rows
    row_ids: Array  # [S*rows_per_shard]
    sqnorms: Array  # [S*rows_per_shard]
    starts: Array  # [S, kc] local start (−1: list not on this shard)
    lengths: Array  # [S, kc] local length (0 when absent)
    rows_per_shard: int
    codes: Optional[Array] = None  # [S*rows_per_shard, m or m//2] PQ codes


def partition_store(
    store: IVFListStore, mesh, storage_dtype=jnp.float32, codes=None,
    axis: str = DATA_AXIS,
) -> ShardedIVFArrays:
    """Greedy-balance whole lists across shards by row count, pack each
    shard's lists contiguously, pad shards to a common row count. When PQ
    `codes` are given (single-device CSR layout, [N_pad, m] u8 or packed
    u4), they shard row-for-row alongside the vectors (SURVEY §5.8 /
    round-1 VERDICT #7: codes shard like vectors)."""
    s = int(np.prod([mesh.shape[a] for a in (axis,)]))
    store.sync_device()  # ensure packed
    p = store._packed
    lengths = p["lengths"]
    kc = store.n_lists
    order = np.argsort(-lengths, kind="stable")
    shard_rows = np.zeros(s, dtype=np.int64)
    shard_of = np.zeros(kc, dtype=np.int32)
    for l in order:
        t = int(np.argmin(shard_rows))
        shard_of[l] = t
        shard_rows[t] += int(lengths[l])
    rows_per_shard = int(
        max(1, ((shard_rows.max() + 127) // 128) * 128)
    )

    d = store.dim
    codes_np = None if codes is None else np.asarray(codes)
    vecs = np.zeros((s * rows_per_shard, d), dtype=np.float32)
    row_ids = np.full(s * rows_per_shard, -1, dtype=np.int32)
    scodes = (
        None
        if codes_np is None
        else np.zeros((s * rows_per_shard, codes_np.shape[1]), dtype=codes_np.dtype)
    )
    starts = np.full((s, kc), -1, dtype=np.int32)
    lens = np.zeros((s, kc), dtype=np.int32)
    cursor = np.zeros(s, dtype=np.int64)
    for l in range(kc):
        n = int(lengths[l])
        if n == 0:
            continue
        t = int(shard_of[l])
        src0 = int(p["starts"][l])
        dst0 = t * rows_per_shard + int(cursor[t])
        # the store's packed host vecs are lane-padded to 128 columns for
        # the single-chip Pallas DMA tiling; the sharded XLA path keeps
        # logical width
        vecs[dst0 : dst0 + n] = p["vecs"][src0 : src0 + n, :d]
        row_ids[dst0 : dst0 + n] = p["row_ids"][src0 : src0 + n]
        if scodes is not None:
            scodes[dst0 : dst0 + n] = codes_np[src0 : src0 + n]
        starts[t, l] = int(cursor[t])
        lens[t, l] = n
        cursor[t] += n
    sqn = np.einsum("nd,nd->n", vecs, vecs, dtype=np.float32)

    rows_sharding = NamedSharding(mesh, P(axis))
    table_sharding = NamedSharding(mesh, P(axis, None))
    return ShardedIVFArrays(
        vecs=jax.device_put(jnp.asarray(vecs, dtype=storage_dtype), rows_sharding),
        row_ids=jax.device_put(jnp.asarray(row_ids), rows_sharding),
        sqnorms=jax.device_put(jnp.asarray(sqn), rows_sharding),
        starts=jax.device_put(jnp.asarray(starts), table_sharding),
        lengths=jax.device_put(jnp.asarray(lens), table_sharding),
        rows_per_shard=rows_per_shard,
        codes=(
            None
            if scodes is None
            else jax.device_put(jnp.asarray(scodes), rows_sharding)
        ),
    )


def sharded_ivf_search(
    mesh,
    q: Array,  # [B, d] replicated
    centroids: Array,  # [kc, d] replicated
    arrays: ShardedIVFArrays,
    *,
    nprobe: int,
    probe_cap: int,
    k: int,
    axis: str = DATA_AXIS,
):
    """Probed search over list-sharded storage → (dist [B,k], ids [B,k]),
    replicated. Every shard scans the probed lists it owns (others masked),
    then k-lists all_gather + merge over ICI."""
    _, probe_lists = ivf_select(q, centroids, nprobe=nprobe)

    def shard_fn(q, pl, vecs, row_ids, sqn, starts, lens):
        b = q.shape[0]
        my_starts = starts[0][pl]  # [B, P] (−1 if not mine)
        my_lens = lens[0][pl]
        mine = my_starts >= 0
        offs = jax.lax.broadcasted_iota(jnp.int32, (1, 1, probe_cap), 2)
        rows = jnp.where(
            mine[:, :, None] & (offs < my_lens[:, :, None]),
            jnp.maximum(my_starts, 0)[:, :, None] + offs,
            0,
        )
        vmask = mine[:, :, None] & (offs < my_lens[:, :, None])
        cand = rows.reshape(b, -1)
        vm = vmask.reshape(b, -1)
        xg = vecs[cand]
        sg = sqn[cand]
        ig = row_ids[cand]
        g = jnp.einsum(
            "bd,bcd->bc", q.astype(xg.dtype), xg, preferred_element_type=jnp.float32
        )
        qn = jnp.sum(jnp.square(q.astype(jnp.float32)), axis=-1)
        dist = qn[:, None] + sg - 2.0 * g
        ld, li = topk_padded(dist, vm, k, ids=ig)
        ds = jax.lax.all_gather(ld, axis)  # [S, B, k]
        is_ = jax.lax.all_gather(li, axis)
        return merge_topk(ds.transpose(1, 0, 2), is_.transpose(1, 0, 2), k)

    fn = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(
            P(),
            P(),
            P(axis),
            P(axis),
            P(axis),
            P(axis, None),
            P(axis, None),
        ),
        out_specs=(P(), P()),
    )
    d, i = fn(
        q,
        probe_lists,
        arrays.vecs,
        arrays.row_ids,
        arrays.sqnorms,
        arrays.starts,
        arrays.lengths,
    )
    return jnp.maximum(d, 0.0), i


def sharded_ivf_pq_search(
    mesh,
    q: Array,  # [B, d] replicated
    centroids: Array,  # [kc, d] replicated
    arrays: ShardedIVFArrays,  # with .codes sharded alongside rows
    books,  # ops.pq.PQCodebooks (replicated)
    *,
    nprobe: int,
    probe_cap: int,
    k: int,
    rerank_c: int = 0,  # 0 = pure ADC; >0 = per-shard exact rerank of top-C
    packed_u4: bool = False,
    metric=None,
    axis: str = DATA_AXIS,
):
    """IVF-PQ ADC search over list-sharded storage → (dist [B,k], ids [B,k]),
    replicated (round-1 VERDICT #7: codes shard like vectors).

    Per shard: residual LUTs build replicated (tiny vs the scan), ADC runs
    over the probed lists this shard owns, then either the ADC partials merge
    directly or each shard exact-reranks its own top-C against its local
    vectors first (a superset of the global top-C restricted to this shard,
    so the merged rerank result is exact for the probed candidate set) —
    followed by one all_gather + strict (score, id) merge over ICI."""
    from vectorindex_tpu.ops import pq as pq_ops
    from vectorindex_tpu.utils.config import Metric

    metric = Metric.L2 if metric is None else metric
    assert arrays.codes is not None, "partition_store(..., codes=...) required"
    m, ks, _ = books.centroids.shape
    _, probe_lists = ivf_select(q, centroids, nprobe=nprobe, metric=metric)
    offsets = (jnp.arange(m, dtype=jnp.int32) * ks)[None, :]

    def shard_fn(q, pl_, vecs, codes, row_ids, sqn, starts, lens):
        b = q.shape[0]
        if packed_u4:
            from vectorindex_tpu.ops.dtypes import unpack_u4

            codes = unpack_u4(codes)
        if metric == Metric.L2:
            lut = pq_ops.pq_lut_residual_l2(q, centroids, pl_, books)
        elif metric == Metric.INNER_PRODUCT:
            base = pq_ops.pq_lut_ip(q, books)
            lut = jnp.broadcast_to(
                base[:, None], (b, pl_.shape[1], m, ks)
            )
        else:
            raise ValueError("sharded IVF-PQ supports L2 and IP")
        lut_flat = lut.reshape(b, pl_.shape[1], m * ks)

        my_starts = starts[0][pl_]  # [B, P] (−1 if not mine)
        my_lens = lens[0][pl_]
        mine = my_starts >= 0
        offs = jax.lax.broadcasted_iota(jnp.int32, (1, 1, probe_cap), 2)
        vmask = mine[:, :, None] & (offs < my_lens[:, :, None])
        rows = jnp.where(vmask, jnp.maximum(my_starts, 0)[:, :, None] + offs, 0)
        code_rows = codes[rows]  # [B, P, cap, m]
        flat_idx = code_rows.astype(jnp.int32) + offsets[None, None]

        def per_probe(lutf, fc):
            return jnp.sum(lutf[fc], axis=-1)

        adc = jax.vmap(jax.vmap(per_probe))(lut_flat, flat_idx)  # [B, P, cap]
        if metric == Metric.INNER_PRODUCT:
            coarse_dot = jnp.einsum(
                "bd,bpd->bp", q.astype(jnp.float32), centroids[pl_]
            )
            adc = adc - coarse_dot[:, :, None]

        adc_flat = adc.reshape(b, -1)
        vm_flat = vmask.reshape(b, -1)
        rows_flat = rows.reshape(b, -1)
        if rerank_c:
            c = min(rerank_c, adc_flat.shape[1])
            # local ADC top-C by candidate row, then exact local rerank
            cd, cpos = topk_padded(
                adc_flat, vm_flat, c,
                ids=jax.lax.broadcasted_iota(jnp.int32, adc_flat.shape, 1),
            )
            crows = jnp.take_along_axis(rows_flat, jnp.minimum(cpos, rows_flat.shape[1] - 1), axis=1)
            missing = ~jnp.isfinite(cd)
            crows = jnp.where(missing, 0, crows)
            xg = vecs[crows]
            sg = sqn[crows]
            g = jnp.einsum(
                "bd,bcd->bc", q.astype(xg.dtype), xg,
                preferred_element_type=jnp.float32,
            )
            qn = jnp.sum(jnp.square(q.astype(jnp.float32)), axis=-1)
            if metric == Metric.L2:
                ex = jnp.maximum(qn[:, None] + sg - 2.0 * g, 0.0)
            else:
                ex = -g
            ld, li = topk_padded(ex, ~missing, k, ids=row_ids[crows])
        else:
            ld, li = topk_padded(adc_flat, vm_flat, k, ids=row_ids[rows_flat])
        ds = jax.lax.all_gather(ld, axis)
        is_ = jax.lax.all_gather(li, axis)
        return merge_topk(ds.transpose(1, 0, 2), is_.transpose(1, 0, 2), k)

    fn = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(
            P(),
            P(),
            P(axis),
            P(axis),
            P(axis),
            P(axis),
            P(axis, None),
            P(axis, None),
        ),
        out_specs=(P(), P()),
    )
    return fn(
        q,
        probe_lists,
        arrays.vecs,
        arrays.codes,
        arrays.row_ids,
        arrays.sqnorms,
        arrays.starts,
        arrays.lengths,
    )
