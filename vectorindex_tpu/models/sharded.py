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
        self,
        queries,
        k: int,
        filter: Optional[FilterFn] = None,
        *,
        allow_ids=None,
        deny_ids=None,
    ) -> list[list[SearchResult]]:
        """allow_ids / deny_ids fold into the sharded scan's validity mask
        BEFORE the per-shard top-k + ICI merge (same pre-selection contract
        as the single-chip path, reference IDFilter.swift:104)."""
        q = np.asarray(queries, dtype=np.float32)
        if q.ndim == 1:
            q = q[None, :]
        if self.count == 0 or k <= 0:
            return [[] for _ in range(q.shape[0])]
        vecs, sqn, inv, valid = self._sync_device()
        if filter is not None or allow_ids is not None or deny_ids is not None:
            valid = jax.device_put(
                jnp.asarray(self._filter_valid(filter, allow_ids, deny_ids)),
                corpus_sharding(self.mesh),
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


class ShardedHNSWIndex(VectorIndex):
    """Graph index served from per-shard subgraphs with ICI top-k merge
    (BASELINE config 5's model-level surface; ops in parallel/sharded_hnsw).

    Serving semantics (the classic sharded-ANN layout): the bulk build
    produces immutable per-shard graphs; subsequent inserts land in a host
    TAIL BUFFER that search scans exactly and merges with the graph
    candidates — a single insert never rebuilds any shard (VERDICT r2
    weak #7). Graphs are rebuilt to absorb the tail only when it outgrows
    max(1024, built/8) rows, or on compact(). Removals are tombstones
    filtered at result assembly (the searches over-fetch).
    """

    TYPE = "sharded_hnsw"

    def __init__(
        self,
        dimension: int,
        metric: Metric = Metric.L2,
        config=None,
        n_devices: Optional[int] = None,
    ):
        from vectorindex_tpu.models.hnsw import HNSWConfig

        if metric not in (Metric.L2, Metric.INNER_PRODUCT, Metric.COSINE):
            raise ValueError(f"sharded HNSW supports L2/IP/cosine, got {metric}")
        self.dimension = dimension
        self.metric = metric
        self.config = config or HNSWConfig()
        self.mesh = make_mesh(n_devices)
        self.n_shards = int(self.mesh.devices.size)
        self._vectors: list[np.ndarray] = []
        self._ids: list[VectorID] = []
        self._metadata: list[Metadata] = []
        self._id_to_row: dict = {}
        self._dead: set[int] = set()
        self._state = None  # parallel.sharded_hnsw.ShardedHNSWState
        self._built_rows = 0
        self._stacked = None  # cached np.stack of _vectors (rescoring)

    # -- CRUD ----------------------------------------------------------

    @property
    def count(self) -> int:
        return len(self._ids) - len(self._dead)

    def insert(self, id: VectorID, vector, metadata: Metadata = None) -> None:
        from vectorindex_tpu.utils.errors import dimension_mismatch, duplicate_id

        if id in self._id_to_row:
            raise duplicate_id(id, "sharded_hnsw.insert")
        v = np.asarray(vector, dtype=np.float32).reshape(-1)
        if v.shape[0] != self.dimension:
            raise dimension_mismatch(self.dimension, v.shape[0], "sharded_hnsw")
        self._id_to_row[id] = len(self._ids)
        self._ids.append(id)
        self._vectors.append(v)
        self._metadata.append(metadata)
        # NO state invalidation: the new row serves from the tail buffer
        # until _ensure_built decides a rebuild amortizes

    def insert_batch(self, ids, vectors, metadatas=None) -> None:
        vectors = np.asarray(vectors, dtype=np.float32)
        for i, id_ in enumerate(ids):
            self.insert(
                id_, vectors[i], None if metadatas is None else metadatas[i]
            )

    def remove(self, id: VectorID) -> None:
        from vectorindex_tpu.utils.errors import not_found

        row = self._id_to_row.pop(id, None)
        if row is None:
            raise not_found(id, "sharded_hnsw.remove")
        self._dead.add(row)

    def contains(self, id: VectorID) -> bool:
        return id in self._id_to_row

    def update(self, id: VectorID, vector=None, metadata: Metadata = None):
        row = self._id_to_row[id]
        if vector is not None:
            meta = self._metadata[row] if metadata is None else metadata
            self.remove(id)
            self.insert(id, vector, meta)
        elif metadata is not None:
            self._metadata[row] = metadata

    # -- build + search ------------------------------------------------

    def _tail_count(self) -> int:
        return len(self._ids) - self._built_rows

    def _ensure_built(self):
        from vectorindex_tpu.parallel.sharded_hnsw import build_sharded_hnsw

        if self._state is not None:
            if self._tail_count() <= max(1024, self._built_rows // 8):
                return  # serve the tail from the exact side buffer
        x = np.stack(self._vectors) if self._vectors else np.zeros(
            (0, self.dimension), np.float32
        )
        self._stacked = x
        self._state = build_sharded_hnsw(
            x, self.n_shards, self.metric, self.config,
            global_ids=np.arange(len(self._ids), dtype=np.int64),
        )
        self._built_rows = len(self._ids)

    def batch_search(self, queries, k: int, filter=None, *,
                     allow_ids=None, deny_ids=None):
        """allow_ids / deny_ids: external-id set filters. The sharded graph
        over-fetches ef >= 4k candidates per query (plus the exactly-scanned
        tail buffer), and the sets mask during assembly — selective filters
        beyond ~75% should raise ef_search (the single-chip HNSW routes
        small allow-sets through an exact gather-scan instead)."""
        from vectorindex_tpu.parallel.sharded_hnsw import sharded_hnsw_search
        from vectorindex_tpu.utils.errors import dimension_mismatch

        allow_set = None if allow_ids is None else set(allow_ids)
        deny_set = None if deny_ids is None else set(deny_ids)
        q = np.asarray(queries, dtype=np.float32)
        if q.ndim == 1:
            q = q[None, :]
        if q.shape[1] != self.dimension:
            raise dimension_mismatch(self.dimension, q.shape[1], "sharded_hnsw")
        if self.count == 0 or k <= 0:
            return [[] for _ in range(q.shape[0])]
        self._ensure_built()
        qg = q
        if self.metric == Metric.COSINE:
            qg = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-30)
        ef = max(self.config.ef_search, 4 * k)
        kk = min(ef, len(self._ids))
        _, ids = sharded_hnsw_search(
            self.mesh, jnp.asarray(qg), self._state,
            ef=ef, iters=-(-ef // 4), k=kk,
        )
        ids = np.asarray(ids)
        x = self._stacked  # built rows (cached by _ensure_built)

        def _scores(vs: np.ndarray) -> np.ndarray:
            """True-metric ascending scores, q [B, d] vs vs [..., d]."""
            if self.metric == Metric.L2:
                if vs.ndim == 2:  # [T, d] tail block, all queries
                    return np.linalg.norm(q[:, None, :] - vs[None], axis=-1)
                return np.linalg.norm(vs - q[:, None, :], axis=-1)
            if vs.ndim == 2:
                dots = q @ vs.T
                vn = np.linalg.norm(vs, axis=-1)[None]
            else:
                dots = np.einsum("bkd,bd->bk", vs, q)
                vn = np.linalg.norm(vs, axis=-1)
            if self.metric == Metric.INNER_PRODUCT:
                return -dots  # ascending internal convention
            qn = np.maximum(np.linalg.norm(q, axis=-1), 1e-30)[:, None]
            return -(dots / (np.maximum(vn, 1e-30) * qn))

        okg = (ids != INVALID_ID) & (ids >= 0)
        safe = np.where(okg, ids, 0)
        gscore = _scores(x[safe])  # [B, kk]
        gscore = np.where(okg, gscore, np.inf)
        # tail buffer: rows inserted since the bulk build — scanned exactly
        # and merged (they are never in the graphs, so no dedup needed)
        tail_lo = self._built_rows
        tail_rows = np.arange(tail_lo, len(self._ids), dtype=np.int64)
        if tail_rows.size:
            xt = np.stack(self._vectors[tail_lo:])
            tscore = _scores(xt)  # [B, T]
            cand_rows = np.concatenate(
                [safe, np.broadcast_to(tail_rows, (q.shape[0], tail_rows.size))],
                axis=1,
            )
            cand_scores = np.concatenate([gscore, tscore], axis=1)
        else:
            cand_rows, cand_scores = safe, gscore

        out = []
        for b in range(q.shape[0]):
            order = np.argsort(cand_scores[b], kind="stable")
            row = []
            for j in order:
                if not np.isfinite(cand_scores[b, j]):
                    break
                r = int(cand_rows[b, j])
                if r in self._dead:
                    continue
                ext = self._ids[r]
                if allow_set is not None and ext not in allow_set:
                    continue
                if deny_set is not None and ext in deny_set:
                    continue
                meta = self._metadata[r]
                if filter is not None and not filter(meta):
                    continue
                val = float(cand_scores[b, j])
                if self.metric != Metric.L2:
                    val = -val  # public IP/cosine scores are higher-better
                row.append(
                    SearchResult(id=ext, score=val, metadata=meta)
                )
                if len(row) == k:
                    break
            out.append(row)
        return out

    def search(self, query, k: int, filter=None, *,
               allow_ids=None, deny_ids=None):
        return self.batch_search(
            np.asarray(query)[None, :], k, filter,
            allow_ids=allow_ids, deny_ids=deny_ids,
        )[0]

    def statistics(self) -> IndexStats:
        self._ensure_built()
        return IndexStats(
            count=self.count,
            dimension=self.dimension,
            metric=self.metric.value,
            memory_bytes=int(
                sum(v.nbytes for v in self._vectors)
                + (self._state.nbrs.size * 4 if self._state is not None else 0)
            ),
            details={
                "n_shards": self.n_shards,
                "mesh": str(self.mesh.shape),
                "m": self.config.m,
                "ef_search": self.config.ef_search,
            },
        )

    def compact(self) -> None:
        live = [
            (self._ids[r], self._vectors[r], self._metadata[r])
            for r in range(len(self._ids))
            if r not in self._dead
        ]
        cfg, mesh_n = self.config, self.n_shards
        self.__init__(self.dimension, self.metric, cfg, n_devices=mesh_n)
        for ext, v, meta in live:
            self.insert(ext, v, meta)

    def save(self, path: str) -> None:
        from vectorindex_tpu.persistence.json_snapshot import (
            PersistedIndex,
            PersistedRecord,
            save_snapshot,
        )

        records = [
            PersistedRecord(
                id=self._ids[r], vector=self._vectors[r], metadata=self._metadata[r]
            )
            for r in range(len(self._ids))
            if r not in self._dead
        ]
        save_snapshot(
            path,
            PersistedIndex(
                type=self.TYPE,
                dimension=self.dimension,
                metric=self.metric.value,
                records=records,
                config={
                    "m": self.config.m,
                    "ef_construction": self.config.ef_construction,
                    "ef_search": self.config.ef_search,
                    "seed": self.config.seed,
                },
            ),
        )

    @classmethod
    def load(cls, path: str) -> "ShardedHNSWIndex":
        from vectorindex_tpu.models.hnsw import HNSWConfig
        from vectorindex_tpu.persistence.json_snapshot import load_snapshot

        snap = load_snapshot(path, expected_type=cls.TYPE)
        c = snap.config
        idx = cls(
            snap.dimension,
            Metric(snap.metric),
            HNSWConfig(
                m=c.get("m", 16),
                ef_construction=c.get("ef_construction", 200),
                ef_search=c.get("ef_search", 64),
                seed=c.get("seed", 0xDEADBEEFCAFEBABE),
            ),
        )
        for r in snap.records:
            idx.insert(r.id, r.vector, r.metadata)
        return idx
