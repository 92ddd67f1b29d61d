"""ShardedFlatIndex — exact search over a corpus sharded across a device
mesh.

This is the component the reference *doesn't have* and the rebuild's scaling
story requires (SURVEY.md §2.4/§5.8): the corpus N-dimension shards across a
1-D `data` mesh axis; every query batch scans all shards in SPMD, each shard
selects a local top-k on its chip, and the k-lists merge deterministically
over ICI (parallel/sharded_search.py). Results are bit-identical to a
single-device FlatIndex regardless of shard count (the partition-then-merge
contract of IVFSelect.swift:127-145 + TopKMerge.swift:66-71, lifted to
chips).

Mutation model: host-authoritative arrays (same control plane as FlatIndex)
re-placed onto the mesh on sync; growth doubles capacity per shard so the
jitted program recompiles O(log N) times.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from vectorindex_tpu.models.base import (
    FilterFn,
    IndexStats,
    Metadata,
    SearchResult,
    VectorID,
    VectorIndex,
)
from vectorindex_tpu.models.flat import MIN_CAPACITY, FlatIndex
from vectorindex_tpu.ops.topk import INVALID_ID
from vectorindex_tpu.parallel.mesh import corpus_sharding, make_mesh, replicated
from vectorindex_tpu.parallel.sharded_search import sharded_flat_search
from vectorindex_tpu.utils.config import Metric


class ShardedFlatIndex(FlatIndex):
    """FlatIndex whose storage and scan are sharded over a device mesh."""

    TYPE = "sharded_flat"

    def __init__(
        self,
        dimension: int,
        metric: Metric = Metric.L2,
        capacity: int = MIN_CAPACITY,
        storage_dtype=jnp.float32,
        n_devices: Optional[int] = None,
    ):
        super().__init__(dimension, metric, capacity, storage_dtype)
        self.mesh = make_mesh(n_devices)
        self.n_shards = self.mesh.devices.size
        # capacity must divide evenly across shards
        if self.capacity % self.n_shards:
            raise ValueError("capacity must be divisible by mesh size")
        self._search_jit = None

    def _sync_device(self):
        """Place arrays row-sharded over the mesh (overrides the
        single-device placement)."""
        if self._dev is None:
            shard = corpus_sharding(self.mesh)
            rep = replicated(self.mesh)
            vecs = jax.device_put(
                jnp.asarray(self._vectors, dtype=self.storage_dtype), shard
            )
            sqn_h = np.einsum(
                "nd,nd->n", self._vectors, self._vectors, dtype=np.float32
            )
            sqn = jax.device_put(jnp.asarray(sqn_h), shard)
            inv_h = np.where(sqn_h > 0, 1.0 / np.sqrt(np.maximum(sqn_h, 1e-30)), 0.0)
            inv = jax.device_put(jnp.asarray(inv_h.astype(np.float32)), shard)
            valid = jax.device_put(jnp.asarray(self._valid), shard)
            self._dev = (vecs, sqn, inv, valid)
        return self._dev

    def _grow(self) -> None:
        # grow by one full mesh-width multiple so shards stay even
        super()._grow()
        self._search_jit = None

    def _search_fn(self, kk: int):
        """Cached jitted search closure per k (a fresh jit(lambda) per call
        retraces every search)."""
        if self._search_jit is None:
            self._search_jit = {}
        fn = self._search_jit.get(kk)
        if fn is None:
            use_inv = self.metric == Metric.COSINE

            def run(qq, xx, vv, ss, ii):
                return sharded_flat_search(
                    self.mesh, qq, xx, vv, kk, self.metric,
                    x_sqnorms=ss, x_invnorms=ii if use_inv else None,
                )

            fn = jax.jit(run)
            self._search_jit[kk] = fn
        return fn

    def batch_search(
        self, queries, k: int, filter: Optional[FilterFn] = None
    ) -> list[list[SearchResult]]:
        q = np.asarray(queries, dtype=np.float32)
        if q.ndim == 1:
            q = q[None, :]
        if self.count == 0 or k <= 0:
            return [[] for _ in range(q.shape[0])]
        vecs, sqn, inv, valid = self._sync_device()
        if filter is not None:
            valid = jax.device_put(
                jnp.asarray(self._filter_valid(filter)), corpus_sharding(self.mesh)
            )
        kk = min(k, self.capacity)
        dist, ids = self._search_fn(kk)(jnp.asarray(q), vecs, valid, sqn, inv)
        dist = np.asarray(dist)
        ids = np.asarray(ids)
        scores = self._public_score(dist)
        out: list[list[SearchResult]] = []
        for b in range(q.shape[0]):
            row: list[SearchResult] = []
            for j in range(kk):
                slot = ids[b, j]
                if slot == INVALID_ID or not np.isfinite(dist[b, j]):
                    break
                row.append(
                    SearchResult(
                        id=self._idmap.external_for(int(slot)),
                        score=float(scores[b, j]),
                        metadata=self._metadata[slot],
                    )
                )
                if len(row) == k:
                    break
            out.append(row)
        return out

    def statistics(self) -> IndexStats:
        st = super().statistics()
        st.details["n_shards"] = self.n_shards
        st.details["mesh"] = str(self.mesh.shape)
        return st
