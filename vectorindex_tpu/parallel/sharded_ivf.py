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

from typing import NamedTuple

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


def partition_store(
    store: IVFListStore, mesh, storage_dtype=jnp.float32
) -> ShardedIVFArrays:
    """Greedy-balance whole lists across shards by row count, pack each
    shard's lists contiguously, pad shards to a common row count."""
    s = mesh.devices.size
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
    vecs = np.zeros((s * rows_per_shard, d), dtype=np.float32)
    row_ids = np.full(s * rows_per_shard, -1, dtype=np.int32)
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
        vecs[dst0 : dst0 + n] = p["vecs"][src0 : src0 + n]
        row_ids[dst0 : dst0 + n] = p["row_ids"][src0 : src0 + n]
        starts[t, l] = int(cursor[t])
        lens[t, l] = n
        cursor[t] += n
    sqn = np.einsum("nd,nd->n", vecs, vecs, dtype=np.float32)

    rows_sharding = NamedSharding(mesh, P(DATA_AXIS))
    table_sharding = NamedSharding(mesh, P(DATA_AXIS, None))
    return ShardedIVFArrays(
        vecs=jax.device_put(jnp.asarray(vecs, dtype=storage_dtype), rows_sharding),
        row_ids=jax.device_put(jnp.asarray(row_ids), rows_sharding),
        sqnorms=jax.device_put(jnp.asarray(sqn), rows_sharding),
        starts=jax.device_put(jnp.asarray(starts), table_sharding),
        lengths=jax.device_put(jnp.asarray(lens), table_sharding),
        rows_per_shard=rows_per_shard,
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
