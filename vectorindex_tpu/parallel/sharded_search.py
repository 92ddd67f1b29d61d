"""Sharded exact search: per-shard scan + deterministic ICI top-k merge.

TPU-native replacement for the reference's partition-then-merge concurrency
(IVFSelect.swift:127-145 partitions rows across threads, TopKMerge.swift:11
k-way merges partials; SURVEY.md §2.4). Here each device scans its corpus
shard on the MXU, selects a local top-k, and the k-lists all-gather over ICI
and merge with the strict (score, id) contract — so results are bit-identical
to a single-device scan regardless of shard count (validated by the 8-device
CPU-mesh tests, SURVEY.md §4).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import inspect

try:
    from jax import shard_map as _shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map as _shard_map

# jax renamed check_rep (≤0.8, jax.experimental) → check_vma (0.9+, jax.shard_map)
_CHECK_KW = (
    "check_vma" if "check_vma" in inspect.signature(_shard_map).parameters else "check_rep"
)


def shard_map(f, *, mesh, in_specs, out_specs):
    return _shard_map(
        f, mesh=mesh, in_specs=in_specs, out_specs=out_specs, **{_CHECK_KW: False}
    )
from jax.sharding import Mesh, PartitionSpec as P

from vectorindex_tpu.ops import scoring
from vectorindex_tpu.ops.topk import merge_topk, topk_padded
from vectorindex_tpu.parallel.mesh import DATA_AXIS
from vectorindex_tpu.utils.config import Metric

Array = jax.Array


def sharded_flat_search(
    mesh: Mesh,
    q: Array,
    x: Array,
    valid: Array,
    k: int,
    metric: Metric = Metric.L2,
    x_sqnorms: Optional[Array] = None,
    x_invnorms: Optional[Array] = None,
    axis: str = DATA_AXIS,
):
    """Exact top-k over a row-sharded corpus.

    q: [B, d] replicated. x: [N, d] sharded on N (N divisible by mesh size;
    use pad_rows + valid mask). Returns (dist [B, k], global_ids [B, k]),
    replicated, ascending-distance convention.

    Collective pattern: local scan → local top-k → all_gather(k-lists) → merge
    (every device computes the same merged result; k·S ≪ N so the gather is
    tiny ICI traffic — the scaling-book "pick mesh, annotate, let collectives
    ride ICI" recipe).
    """
    n_local_sq = x_sqnorms is not None
    n_local_inv = x_invnorms is not None

    def shard_fn(q, x, valid, sqn, inv):
        size = jax.lax.axis_size(axis)
        my = jax.lax.axis_index(axis)
        n_shard = x.shape[0]
        norms = scoring.NormCache(
            sq=sqn[0] if n_local_sq else None, inv=inv[0] if n_local_inv else None
        )
        dist = scoring.distance_block(q, x, metric, norms=norms)
        local_ids = jax.lax.broadcasted_iota(jnp.int32, dist.shape, 1) + my * n_shard
        d, i = topk_padded(dist, valid[0][None, :], k, ids=local_ids)
        # gather all shards' partials: [S, B, k] → merge on every device
        ds = jax.lax.all_gather(d, axis)
        is_ = jax.lax.all_gather(i, axis)
        md, mi = merge_topk(ds.transpose(1, 0, 2), is_.transpose(1, 0, 2), k)
        return md, mi

    # valid/sqn/inv get a leading dummy axis so rank-1 shards stay rank-1
    sqn_in = x_sqnorms[None] if n_local_sq else jnp.zeros((1, 1), jnp.float32)
    inv_in = x_invnorms[None] if n_local_inv else jnp.zeros((1, 1), jnp.float32)
    fn = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(
            P(),
            P(axis),
            P(None, axis),
            P(None, axis) if n_local_sq else P(),
            P(None, axis) if n_local_inv else P(),
        ),
        out_specs=(P(), P()),
    )
    return fn(q, x, valid[None], sqn_in, inv_in)


def make_sharded_search_fn(mesh: Mesh, k: int, metric: Metric, axis: str = DATA_AXIS):
    """jit-wrapped closure for repeated querying."""

    @jax.jit
    def run(q, x, valid, sqn, inv):
        return sharded_flat_search(
            mesh, q, x, valid, k, metric, x_sqnorms=sqn, x_invnorms=inv, axis=axis
        )

    return run


def sharded_flat_search_2d(
    mesh: Mesh,
    q: Array,
    x: Array,
    valid: Array,
    k: int,
    metric: Metric = Metric.L2,
    replica_axis: str = "replica",
    data_axis: str = DATA_AXIS,
):
    """Exact top-k on a 2-D (replica × data) mesh (SURVEY.md §5.8 DCN axis):
    the corpus shards along `data` and replicates across `replica`; the query
    batch shards across `replica` so each slice serves its own request
    stream. All corpus-sized collectives (the per-shard top-k all_gather)
    stay inside a replica group — on multi-slice hardware that keeps them on
    ICI, with nothing corpus-sized crossing the DCN axis.

    q: [B, d] with B divisible by the replica-axis size. Returns
    (dist [B, k], ids [B, k]) sharded like q on the replica axis."""

    def shard_fn(q, x, valid):
        size = jax.lax.axis_size(data_axis)
        my = jax.lax.axis_index(data_axis)
        n_shard = x.shape[0]
        dist = scoring.distance_block(q, x, metric)
        local_ids = jax.lax.broadcasted_iota(jnp.int32, dist.shape, 1) + my * n_shard
        d, i = topk_padded(dist, valid[0][None, :], k, ids=local_ids)
        ds = jax.lax.all_gather(d, data_axis)  # within the replica group
        is_ = jax.lax.all_gather(i, data_axis)
        return merge_topk(ds.transpose(1, 0, 2), is_.transpose(1, 0, 2), k)

    fn = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(
            P(replica_axis),  # queries shard across replicas
            P(data_axis),  # corpus shards within a replica group
            P(None, data_axis),
        ),
        out_specs=(P(replica_axis), P(replica_axis)),
    )
    return fn(q, x, valid[None])
