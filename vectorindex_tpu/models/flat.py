"""FlatIndex — exact brute-force search, the minimum end-to-end slice.

Parity targets:
  - FlatIndexOptimized (the "real" flat path)  FlatIndexOptimized.swift:20-420
    contiguous vector storage + id→offset map + free-list (:20-30), search =
    ScoreBlock over the whole store → selectTopK (:400-420), fused cosine
    norm cache (:33-34), compaction (:91-114)
  - FlatIndex (naive baseline)                 FlatIndex.swift — subsumed; all
    five metrics supported incl. manhattan/chebyshev

TPU-native design decisions:
  - Storage is a power-of-two-capacity [cap, d] device array plus a validity
    mask; growth doubles capacity so jit only recompiles O(log N) times
    (SURVEY.md §7 "bucketed capacities to bound recompiles").
  - Queries are batched through one MXU scoring call + masked top-k; the
    reference's per-query TaskGroup fan-out (FlatIndex.swift:88-101) becomes
    the batch dimension.
  - Metadata filters compile to a device-side allow mask fused into top-k
    padding (exact-k results, no oversampling) rather than a host post-filter.
  - Removal = tombstone in the validity mask + free-list slot reuse;
    compact() repacks (reference FlatIndexOptimized.swift:91-114).
  - Optional bf16 storage: the MXU-native fast path at half the HBM traffic.
"""

from __future__ import annotations

from typing import Optional, Sequence

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
from vectorindex_tpu.ops.idmap import IDMap
from vectorindex_tpu.ops.scan import pad_queries, scan_topk_strict, scan_topk_verified
from vectorindex_tpu.ops.topk import INVALID_ID
from vectorindex_tpu.persistence.json_snapshot import (
    PersistedIndex,
    PersistedRecord,
    load_snapshot,
    save_snapshot,
)
from vectorindex_tpu.utils.config import Metric
from vectorindex_tpu.utils.telemetry import TELEM, QueryStats
from vectorindex_tpu.utils.errors import (
    ErrorBuilder,
    IndexErrorKind,
    dimension_mismatch,
    duplicate_id,
)

MIN_CAPACITY = 1024


def _next_pow2(n: int) -> int:
    return 1 << max(n - 1, 1).bit_length() if n > 2 else max(n, 2)


# Above this corpus size the verified two-phase scan (ops/scan.py) beats the
# strict-sort path by ~20× on TPU (lax.top_k is the bottleneck at scale).
LARGE_SCAN_THRESHOLD = 1 << 17


def _use_pallas_scan() -> bool:
    """Large-scan backend switch: the fused Pallas kernel (kernels/scan_fused)
    on TPU, the XLA verified pipeline elsewhere. Env toggles mirror the
    reference's runtime C-backend switch (VECTORINDEX_DISABLE_C_PQ,
    PQEncode+CBackend.swift)."""
    import os

    if os.environ.get("VECTORINDEX_TPU_DISABLE_PALLAS_SCAN"):
        return False
    if os.environ.get("VECTORINDEX_TPU_FORCE_PALLAS_SCAN"):
        return True  # tests: runs in interpret mode off-TPU
    return jax.default_backend() == "tpu"


class FlatIndex(VectorIndex):
    """Exact index over a contiguous device array."""

    TYPE = "flat"

    def __init__(
        self,
        dimension: int,
        metric: Metric = Metric.L2,
        capacity: int = MIN_CAPACITY,
        storage_dtype=jnp.float32,
    ):
        if dimension <= 0:
            raise (
                ErrorBuilder(IndexErrorKind.INVALID_CONFIGURATION)
                .message(f"dimension must be positive, got {dimension}")
                .build()
            )
        self.dimension = dimension
        self.metric = metric
        self.storage_dtype = storage_dtype
        cap = _next_pow2(max(capacity, MIN_CAPACITY))
        # host mirrors (control plane)
        self._vectors = np.zeros((cap, dimension), dtype=np.float32)
        self._valid = np.zeros((cap,), dtype=bool)
        self._metadata: list[Metadata] = [None] * cap
        self._idmap = IDMap()
        self._free: list[int] = []
        self._next_slot = 0
        # device cache (data plane), rebuilt lazily after mutation
        self._dev = None
        # fused-scan padded view, keyed on the _dev tuple's identity
        self._dev_fused = None

    # ------------------------------------------------------------------
    # storage management
    # ------------------------------------------------------------------

    @property
    def capacity(self) -> int:
        return self._vectors.shape[0]

    @property
    def count(self) -> int:
        return len(self._idmap)

    def _alloc_slot(self) -> int:
        if self._free:
            return self._free.pop()
        if self._next_slot >= self.capacity:
            self._grow()
        slot = self._next_slot
        self._next_slot += 1
        return slot

    def _grow(self) -> None:
        old_cap = self.capacity
        new_cap = old_cap * 2
        self._vectors = np.vstack([self._vectors, np.zeros_like(self._vectors)])
        self._valid = np.concatenate([self._valid, np.zeros(old_cap, dtype=bool)])
        self._metadata.extend([None] * (new_cap - len(self._metadata)))
        self._dev = None

    def _check_vector(self, vector) -> np.ndarray:
        v = np.asarray(vector, dtype=np.float32).reshape(-1)
        if v.shape[0] != self.dimension:
            raise dimension_mismatch(self.dimension, v.shape[0], "insert")
        if not np.all(np.isfinite(v)):
            raise (
                ErrorBuilder(IndexErrorKind.INVALID_VECTOR)
                .message("vector contains non-finite values")
                .build()
            )
        return v

    def _sync_device(self):
        if self._dev is None:
            vecs = jnp.asarray(self._vectors, dtype=self.storage_dtype)
            sqn = jnp.asarray(
                np.einsum("nd,nd->n", self._vectors, self._vectors, dtype=np.float32)
            )
            inv = jnp.where(sqn > 0, jax.lax.rsqrt(jnp.maximum(sqn, 1e-30)), 0.0)
            self._dev = (vecs, sqn, inv, jnp.asarray(self._valid))
        return self._dev

    def _sync_device_fused(self):
        """Padded corpus view for the fused Pallas scan (kernels/scan_fused):
        rows to a TILE multiple, d to a lane multiple, padded rows dead.
        Rebuilt only when the base device mirror is (identity check)."""
        from vectorindex_tpu.kernels.scan_fused import pad_corpus

        dev = self._sync_device()
        if self._dev_fused is None or self._dev_fused[0] is not dev:
            vecs, sqn, _, valid = dev
            self._dev_fused = (dev, pad_corpus(vecs, sqn, valid))
        return self._dev_fused[1]

    # ------------------------------------------------------------------
    # CRUD
    # ------------------------------------------------------------------

    def insert(self, id: VectorID, vector, metadata: Metadata = None) -> None:
        if id in self._idmap:
            raise duplicate_id(id, "insert")
        v = self._check_vector(vector)
        slot = self._alloc_slot()
        self._vectors[slot] = v
        self._valid[slot] = True
        self._metadata[slot] = metadata
        self._idmap.append(id, slot)
        self._dev = None

    def insert_batch(
        self,
        ids: Sequence[VectorID],
        vectors,
        metadatas: Optional[Sequence[Metadata]] = None,
    ) -> None:
        vectors = np.asarray(vectors, dtype=np.float32)
        if vectors.ndim != 2 or vectors.shape[1] != self.dimension:
            raise dimension_mismatch(
                self.dimension, vectors.shape[-1], "insert_batch"
            )
        if len(ids) != vectors.shape[0]:
            raise (
                ErrorBuilder(IndexErrorKind.INVALID_ARGUMENT)
                .message("ids and vectors length mismatch")
                .build()
            )
        for id_ in ids:
            if id_ in self._idmap:
                raise duplicate_id(id_, "insert_batch")
        if not np.all(np.isfinite(vectors)):
            raise (
                ErrorBuilder(IndexErrorKind.INVALID_VECTOR)
                .message("batch contains non-finite values")
                .build()
            )
        n = vectors.shape[0]
        while self._next_slot + n > self.capacity and not self._free:
            self._grow()
        for i, id_ in enumerate(ids):
            slot = self._alloc_slot()
            self._vectors[slot] = vectors[i]
            self._valid[slot] = True
            self._metadata[slot] = None if metadatas is None else metadatas[i]
            self._idmap.append(id_, slot)
        self._dev = None

    def remove(self, id: VectorID) -> None:
        slot = self._idmap.erase(id)
        self._valid[slot] = False
        self._metadata[slot] = None
        self._free.append(slot)
        self._dev = None

    def update(self, id: VectorID, vector=None, metadata: Metadata = None) -> None:
        slot = self._idmap.lookup(id)
        if vector is not None:
            self._vectors[slot] = self._check_vector(vector)
            self._dev = None
        if metadata is not None:
            self._metadata[slot] = metadata

    def contains(self, id: VectorID) -> bool:
        return id in self._idmap

    def get(self, id: VectorID):
        slot = self._idmap.lookup(id)
        return self._vectors[slot].copy(), self._metadata[slot]

    # ------------------------------------------------------------------
    # search
    # ------------------------------------------------------------------

    def _public_score(self, dist: np.ndarray) -> np.ndarray:
        """Internal ascending distance → public metric score. L2 gets the
        sqrt at the API boundary (reference HNSWIndex.swift:158)."""
        if self.metric == Metric.L2:
            return np.sqrt(np.maximum(dist, 0.0))
        if self.metric == Metric.INNER_PRODUCT:
            return -dist
        if self.metric == Metric.COSINE:
            return 1.0 - dist
        return dist

    def _filter_valid(
        self,
        filter: Optional[FilterFn],
        allow_ids=None,
        deny_ids=None,
    ) -> np.ndarray:
        from vectorindex_tpu.ops.filtering import slot_mask_np

        idm = slot_mask_np(self.capacity, self._idmap, allow_ids, deny_ids)
        if filter is None and idm is None:
            return self._valid
        mask = self._valid.copy() if idm is None else (self._valid & idm)
        if filter is not None:
            for slot in np.nonzero(mask)[0]:
                if not filter(self._metadata[slot]):
                    mask[slot] = False
        return mask

    def batch_search(
        self,
        queries,
        k: int,
        filter: Optional[FilterFn] = None,
        *,
        allow_ids=None,
        deny_ids=None,
    ) -> list[list[SearchResult]]:
        """allow_ids / deny_ids: external-id set filters fused into the scan
        mask BEFORE top-k (reference IDFilter.swift:104 allow/deny modes
        threaded through the kernels) — exact k results under arbitrarily
        selective filters, never k-minus-filtered."""
        q = np.asarray(queries, dtype=np.float32)
        if q.ndim == 1:
            q = q[None, :]
        if q.shape[1] != self.dimension:
            raise dimension_mismatch(self.dimension, q.shape[1], "search")
        if self.count == 0 or k <= 0:
            return [[] for _ in range(q.shape[0])]
        vecs, sqn, inv, _ = self._sync_device()
        has_id_filter = allow_ids is not None or deny_ids is not None
        # valid=None fast path when every slot is live and unfiltered (the
        # [B, N] mask op costs ~1.3 ms at 256×1M by breaking matmul fusion)
        if filter is not None or has_id_filter:
            valid = jnp.asarray(
                self._filter_valid(filter, allow_ids, deny_ids)
            )
        elif self._free or self._next_slot < self.capacity:
            valid = self._sync_device()[3]
        else:
            valid = None
        kk = min(k, self.capacity)
        qj = jnp.asarray(q)
        stats = QueryStats(batch=q.shape[0], rows_scored=q.shape[0] * self.count)
        fused_ok = self.metric in (
            Metric.L2,
            Metric.INNER_PRODUCT,
            Metric.COSINE,
        ) and _use_pallas_scan()
        if fused_ok:
            # the fused kernel keeps at most 2·C candidates per query; larger
            # k must go through the always-exact strict path (ADVICE r2 #1)
            from vectorindex_tpu.kernels.scan_fused import C as _SCAN_C

            fused_ok = kk <= 2 * _SCAN_C
        if self.capacity >= LARGE_SCAN_THRESHOLD:
            with TELEM.timer("score_flat", stats):
                if fused_ok:
                    from vectorindex_tpu.kernels.scan_fused import scan_topk_fused

                    x_pad, sq_pad, valid_pad = self._sync_device_fused()
                    if filter is not None or has_id_filter:
                        vmask = np.asarray(
                            self._filter_valid(filter, allow_ids, deny_ids)
                        )
                        valid_pad = jnp.asarray(
                            np.pad(vmask, (0, x_pad.shape[0] - vmask.shape[0]))
                        )
                    dist, ids, exact = scan_topk_fused(
                        qj,
                        x_pad,
                        sq_pad,
                        valid_pad,
                        metric=self.metric,
                        k=kk,
                        interpret=jax.default_backend() != "tpu",
                    )
                else:
                    dist, ids, exact = scan_topk_verified(
                        qj, vecs, sqn, inv, valid, metric=self.metric, k=kk
                    )
                exact = np.asarray(exact)
            if not exact.all():
                # rare PartialReduce miss: rerun only the flagged queries
                # through the always-exact strict path and splice results
                TELEM.inc("flat.verify_fallback", int((~exact).sum()))
                stats.flags.add("verify_fallback")
                flagged = np.nonzero(~exact)[0]
                qf, nf = pad_queries(qj[flagged])
                with TELEM.timer("rerank", stats):
                    fd, fi = scan_topk_strict(
                        qf, vecs, sqn, inv, valid, metric=self.metric, k=kk
                    )
                dist = np.array(dist)
                ids = np.array(ids)
                dist[flagged] = np.asarray(fd)[:nf]
                ids[flagged] = np.asarray(fi)[:nf]
        else:
            with TELEM.timer("score_flat", stats):
                dist, ids = scan_topk_strict(
                    qj, vecs, sqn, inv, valid, metric=self.metric, k=kk
                )
        stats.flags.add("dot_trick")
        stats.bytes_read["vecs"] = self.count * self.dimension * 4
        TELEM.add_bytes("vecs", stats.bytes_read["vecs"])
        # per-kernel sink (reference L2SqrKernel.swift:46-57 recorder)
        TELEM.record_kernel(
            "scan_fused", rows=stats.rows_scored,
            bytes=stats.bytes_read["vecs"],
        )
        TELEM.record_query(stats)
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

    def search(
        self,
        query,
        k: int,
        filter: Optional[FilterFn] = None,
        *,
        allow_ids=None,
        deny_ids=None,
    ) -> list[SearchResult]:
        return self.batch_search(
            np.asarray(query)[None, :], k, filter,
            allow_ids=allow_ids, deny_ids=deny_ids,
        )[0]

    def range_search(
        self,
        query,
        radius: float,
        max_results: int = 128,
        filter: Optional[FilterFn] = None,
    ) -> list[SearchResult]:
        """Threshold query (#07): all vectors within `radius` (L2 distance)
        or with score ≥ radius (IP/cosine), nearest-first, capped at
        max_results (reference rangeScanBlock compacted mode)."""
        from vectorindex_tpu.ops.range_query import range_scan

        q = np.asarray(query, dtype=np.float32)[None, :]
        if q.shape[1] != self.dimension:
            raise dimension_mismatch(self.dimension, q.shape[1], "range_search")
        if self.count == 0:
            return []
        vecs, sqn, inv, valid = self._sync_device()
        vmask = (
            jnp.asarray(self._filter_valid(filter)) if filter is not None else valid
        )
        res = range_scan(
            jnp.asarray(q),
            vecs,
            radius,
            metric=self.metric,
            max_results=min(max_results, self.capacity),
            valid=vmask,
            x_sqnorms=sqn,
            x_invnorms=inv,
        )
        dists = np.asarray(res.dists)[0]
        ids = np.asarray(res.ids)[0]
        scores = self._public_score(dists)
        out: list[SearchResult] = []
        for j in range(len(ids)):
            if ids[j] == INVALID_ID or not np.isfinite(dists[j]):
                break
            out.append(
                SearchResult(
                    id=self._idmap.external_for(int(ids[j])),
                    score=float(scores[j]),
                    metadata=self._metadata[int(ids[j])],
                )
            )
        return out

    # ------------------------------------------------------------------
    # maintenance
    # ------------------------------------------------------------------

    def compact(self) -> None:
        """Repack valid slots to the front (reference
        FlatIndexOptimized.swift:91-114)."""
        order = np.nonzero(self._valid)[0]
        remap = {int(old): new for new, old in enumerate(order)}
        self._vectors[: len(order)] = self._vectors[order]
        self._vectors[len(order) :] = 0.0
        new_meta: list[Metadata] = [None] * self.capacity
        for old, new in remap.items():
            new_meta[new] = self._metadata[old]
        self._metadata = new_meta
        self._valid[:] = False
        self._valid[: len(order)] = True
        self._idmap.remap_internal(remap)
        self._idmap.clear_tombstones()
        self._free = []
        self._next_slot = len(order)
        self._dev = None

    def statistics(self) -> IndexStats:
        mem = self._vectors.nbytes + self._valid.nbytes
        return IndexStats(
            count=self.count,
            dimension=self.dimension,
            metric=self.metric.value,
            memory_bytes=mem,
            details={
                "capacity": self.capacity,
                "free_slots": len(self._free),
                "storage_dtype": str(np.dtype(self.storage_dtype) if self.storage_dtype != jnp.bfloat16 else "bfloat16"),
            },
        )

    # ------------------------------------------------------------------
    # persistence (JSON tier — reference Persistence.swift)
    # ------------------------------------------------------------------

    def save_container(self, path: str) -> None:
        """Binary-container tier (ROADMAP #7): CRC'd mmap sections instead
        of the JSON snapshot — same contract, zero-parse load."""
        from vectorindex_tpu.persistence.container_index import (
            save_flat_container,
        )

        save_flat_container(self, path)

    @classmethod
    def load_container(cls, path: str) -> "FlatIndex":
        from vectorindex_tpu.persistence.container_index import (
            load_flat_container,
        )

        return load_flat_container(path)

    def save(self, path: str) -> None:
        records = [
            PersistedRecord(
                id=ext,
                vector=self._vectors[slot],
                metadata=self._metadata[slot],
            )
            for ext, slot in sorted(self._idmap.items(), key=lambda kv: kv[1])
        ]
        save_snapshot(
            path,
            PersistedIndex(
                type=self.TYPE,
                dimension=self.dimension,
                metric=self.metric.value,
                records=records,
            ),
        )

    @classmethod
    def load(cls, path: str) -> "FlatIndex":
        snap = load_snapshot(path, expected_type=cls.TYPE)
        idx = cls(snap.dimension, Metric(snap.metric), capacity=max(len(snap.records), MIN_CAPACITY))
        if snap.records:
            idx.insert_batch(
                [r.id for r in snap.records],
                np.stack([r.vector for r in snap.records]),
                [r.metadata for r in snap.records],
            )
        return idx
