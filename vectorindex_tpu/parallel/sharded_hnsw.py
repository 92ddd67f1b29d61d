"""Sharded HNSW: independent per-shard graphs + ICI top-k merge.

BASELINE config 5 ("HNSW-style graph on Deep10M sharded across v5e-8 with
ICI top-k merge"). The corpus shards by row; each device holds an
independent fixed-degree graph over its shard, built host-side (the
standard sharded-ANN serving layout). A query batch replicates to every
device, runs the batched-frontier beam (ops/graph.beam_search) on the local
subgraph, and the per-shard top-k lists all_gather over ICI and merge with
the strict (score, id) contract — the reference's partition-then-merge
(IVFSelect.swift:127-145 across threads, TopKMerge.swift:11), lifted to the
device mesh exactly like parallel/sharded_search.py does for the flat scan.

Graph layout per shard: row-indexed tables (local row -> local neighbor
rows), so the beam runs with lookup=None (identity); results map back to
global ids through a row->global table. Each subgraph carries its own entry
point; searching S independent subgraphs at equal ef and unioning results
matches (or slightly beats) single-graph quality — each subgraph is N/S
nodes, so the same ef covers a larger fraction of its shard.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh
from jax.sharding import PartitionSpec as P

from vectorindex_tpu.ops import graph as gops
from vectorindex_tpu.ops.topk import INVALID_DIST, INVALID_ID, merge_topk, topk
from vectorindex_tpu.parallel.mesh import DATA_AXIS
from vectorindex_tpu.parallel.sharded_search import shard_map
from vectorindex_tpu.utils.config import Metric

Array = jax.Array


class ShardedHNSWState(NamedTuple):
    """Stacked per-shard graph state, shardable on the leading S axis."""

    vecs: Array  # [S, rows_pad, d] graph-space vectors (dead rows zero)
    sqn: Array  # [S, rows_pad] routed squared norms (+inf dead rows)
    nbrs: Array  # [S, rows_pad, deg] local neighbor rows (-1 empty)
    entries: Array  # [S] local entry row per shard
    row_global: Array  # [S, rows_pad] local row -> global id (-1 dead)


def build_sharded_hnsw(
    x: np.ndarray,
    mesh_size: int,
    metric: Metric = Metric.L2,
    config=None,
    global_ids: Optional[np.ndarray] = None,
) -> ShardedHNSWState:
    """Host-side build: contiguous row partition, one HNSWIndex per shard,
    level-0 tables extracted/re-rowed/padded/stacked. Construction cost is
    the per-shard builds (device-accelerated beam construction); on a real
    pod each shard's build would run on its own host — here they run
    sequentially (single-controller)."""
    from vectorindex_tpu.models.hnsw import HNSWConfig, HNSWIndex

    cfg = config or HNSWConfig()
    n, d = x.shape
    if global_ids is None:
        global_ids = np.arange(n, dtype=np.int64)
    bounds = np.linspace(0, n, mesh_size + 1).astype(np.int64)

    per = []
    rows_max = 0
    r2_global = 0.0
    for s in range(mesh_size):
        lo, hi = int(bounds[s]), int(bounds[s + 1])
        idx = HNSWIndex(d, metric, cfg)
        idx.insert_batch([str(i) for i in range(hi - lo)], x[lo:hi])
        idx._ensure_built()
        layer0 = idx._layers[0]
        rows = layer0.count
        rows_max = max(rows_max, rows)
        r2_global = max(r2_global, idx._r2)
        # slot-id edges -> local-row edges
        nbrs_slots = layer0.nbrs[:rows]
        nbrs_rows = np.where(
            nbrs_slots >= 0, idx._lookup0[np.maximum(nbrs_slots, 0)], -1
        ).astype(np.int32)
        node_slots = np.asarray(layer0.node_ids, dtype=np.int64)
        gvecs = idx._graph_vecs[node_slots]
        per.append(
            (
                gvecs,  # [rows, d] graph space
                np.einsum("rd,rd->r", gvecs, gvecs).astype(np.float32),
                nbrs_rows,
                int(idx._lookup0[idx._entry]),
                global_ids[lo:hi][node_slots],
            )
        )
    if metric == Metric.INNER_PRODUCT:
        # ONE virtual R² across shards — per-shard R² would make routed
        # distances (‖q‖² + R² − 2⟨q,x⟩) incomparable at the merge
        per = [
            (v, np.full_like(sq, np.float32(r2_global)), nb, ent, gl)
            for (v, sq, nb, ent, gl) in per
        ]

    rp = max(8, 1 << (rows_max - 1).bit_length())
    deg = per[0][2].shape[1]
    vecs = np.zeros((mesh_size, rp, d), np.float32)
    sqn = np.full((mesh_size, rp), np.inf, np.float32)
    nbrs = np.full((mesh_size, rp, deg), -1, np.int32)
    entries = np.zeros((mesh_size,), np.int32)
    row_global = np.full((mesh_size, rp), -1, np.int64)
    for s, (v, sq, nb, ent, gl) in enumerate(per):
        r = v.shape[0]
        vecs[s, :r] = v
        sqn[s, :r] = sq
        nbrs[s, :r] = nb
        entries[s] = ent
        row_global[s, :r] = gl
    return ShardedHNSWState(
        jnp.asarray(vecs),
        jnp.asarray(sqn),
        jnp.asarray(nbrs),
        jnp.asarray(entries),
        jnp.asarray(row_global),
    )


def sharded_hnsw_search(
    mesh: Mesh,
    q: Array,  # [B, d] replicated, graph-space queries
    state: ShardedHNSWState,
    *,
    ef: int,
    iters: int,
    k: int,
    expand: int = 4,
    axis: str = DATA_AXIS,
):
    """Replicated queries × sharded subgraphs → merged global top-k.

    Returns (dist [B, k] routed-space ascending, global ids [B, k]),
    replicated. Per shard: batched beam from the shard entry → local top-k
    → all_gather(k-lists) over ICI → strict (score, id) merge (bit-identical
    on every device)."""

    def shard_fn(q, vecs, sqn, nbrs, entry, row_global):
        b = q.shape[0]
        beam = gops.beam_search(
            q,
            vecs[0],
            sqn[0],
            nbrs[0],
            None,
            jnp.full((b,), entry[0], jnp.int32),
            ef=ef,
            iters=iters,
            expand=expand,
        )
        # local rows -> global ids; dead/INVALID rows stay INVALID
        safe = jnp.maximum(beam.ids, 0)
        gl = row_global[0][safe].astype(jnp.int32)
        gl = jnp.where(beam.ids == INVALID_ID, INVALID_ID, gl)
        dist = jnp.where(beam.ids == INVALID_ID, INVALID_DIST, beam.dists)
        d, i = topk(dist, k, ids=gl, strict_ties=True)
        ds = jax.lax.all_gather(d, axis)  # [S, B, k] — tiny ICI traffic
        is_ = jax.lax.all_gather(i, axis)
        return merge_topk(ds.transpose(1, 0, 2), is_.transpose(1, 0, 2), k)

    fn = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis), P(axis), P(axis)),
        out_specs=(P(), P()),
    )
    return fn(q, state.vecs, state.sqn, state.nbrs, state.entries, state.row_global)
