"""Serving sessions: the production query-stream entry points.

The reference serves every flow through the index protocol
(`IVFIndex.swift:413` search / batchSearch); its rerank stage pipelines
gather tiles against scoring (ExactRerank.swift:21-64). The TPU-native
equivalent is a *serving session*: a long-lived object holding the
device-resident index state plus the host-side VectorReader, whose
`stream()` overlaps the device candidate stage, the device→host link
transfer, and the host rerank across a lookahead window of batches —
steady-state throughput approaches max(stage) instead of their sum.

`IVFPQIndex.batch_search_stream` builds a session from live index state;
capacity-tier deployments that load packed state directly (containers,
bench harnesses) construct `HostRerankSession` themselves. Either way,
serving flows through THIS seam, not through kernel internals.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Iterable, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vectorindex_tpu.utils.config import Metric

Array = jax.Array


@dataclass
class HostRerankSession:
    """Host-memory rerank tier serving session (kernel #40 behind the
    VectorReader seam, reference ExactRerank.swift:81-96): PQ codes + CSR
    metadata stay in HBM (~24 B/row); the f32 corpus serves the exact
    rerank from host RAM. Only candidate ids cross the link per batch.

    `stream(q_batches)` is the production loop (double-buffered, lookahead
    device dispatch); `search(q)` is the per-call latency path."""

    centroids: Array
    arrays: object  # ops.ivf.IVFListArrays (vecs/sqnorms may be None)
    codes: Array
    tcorr: Array
    books: object  # ops.pq.PQCodebooks
    reader: object  # ops.rerank.VectorReader
    nprobe: int
    probe_cap: int
    rerank_c: int = 1024
    metric: Metric = Metric.L2
    packed_u4: bool = False
    dedup: bool = False
    row_allow: Optional[Array] = None
    disabled_lists: Optional[Array] = None
    lookahead: int = 3
    interpret: bool = False
    _kw: dict = field(init=False, repr=False)

    def __post_init__(self):
        self._kw = dict(
            nprobe=self.nprobe, probe_cap=self.probe_cap,
            rerank_c=self.rerank_c, metric=self.metric,
            packed_u4=self.packed_u4, dedup=self.dedup,
            row_allow=self.row_allow, disabled_lists=self.disabled_lists,
            interpret=self.interpret,
        )

    def search(self, q, k: int) -> Tuple[np.ndarray, np.ndarray]:
        """Per-call (dist [B,k], internal ids [B,k]) — the cold/latency
        path; results are host arrays."""
        from vectorindex_tpu.kernels.adc_probe import ivf_search_pq_hostrerank

        sd, si = ivf_search_pq_hostrerank(
            jnp.asarray(np.asarray(q, np.float32)), self.centroids,
            self.arrays, self.codes, self.tcorr, self.books, self.reader,
            k=k, **self._kw,
        )
        return np.asarray(sd), np.asarray(si)

    def probe_candidates(self, q, k: int):
        """Device candidate stage standalone (ADC probe → top-C ids) —
        the stage-decomposition hook benchmarks/telemetry use to show
        which pipeline stage binds. Returns DEVICE arrays
        (adc_dist [B,C], csr_rows [B,C], ids [B,C])."""
        from vectorindex_tpu.kernels.adc_probe import pq_probe_candidates

        p = min(self.nprobe, self.centroids.shape[0]) * self.probe_cap
        c = min(max(self.rerank_c, 4 * min(k, p), 128), p)
        # jnp.asarray only: q may be a tracer (timing harnesses trace this
        # method inside their dependent-loop jit)
        return pq_probe_candidates(
            jnp.asarray(q), self.centroids,
            self.arrays, self.codes, self.tcorr, self.books,
            nprobe=self.nprobe, probe_cap=self.probe_cap, c=c,
            metric=self.metric, packed_u4=self.packed_u4, dedup=self.dedup,
            row_allow=self.row_allow, disabled_lists=self.disabled_lists,
            interpret=self.interpret,
        )

    def candidates_closure(self, k: int):
        """(fn, args) where fn(q_dev, *args) -> (adc_dist, rows, ids) is
        safely traceable inside a timing harness's dependent-loop jit: the
        large device state (centroids/CSR/codes/tcorr) is passed as
        ARGUMENTS, not closure-captured — captured arrays lower as HLO
        constants and a 250+ MB constant blows the remote compile request
        (same discipline as HNSWIndex.device_search_closure)."""
        from vectorindex_tpu.kernels.adc_probe import pq_probe_candidates

        p = min(self.nprobe, self.centroids.shape[0]) * self.probe_cap
        c = min(max(self.rerank_c, 4 * min(k, p), 128), p)
        books = self.books
        kw = dict(
            nprobe=self.nprobe, probe_cap=self.probe_cap, c=c,
            metric=self.metric, packed_u4=self.packed_u4, dedup=self.dedup,
            interpret=self.interpret,
        )
        # row_allow/disabled_lists ride the args tuple too — a [N_pad]
        # bool mask over a 10-30M-row index is itself a multi-MB array
        # that must not lower as an HLO constant
        has_allow = self.row_allow is not None
        has_disabled = self.disabled_lists is not None

        def fn(q, centroids, arrays, codes, tcorr, *extra):
            i = 0
            row_allow = disabled = None
            if has_allow:
                row_allow = extra[i]
                i += 1
            if has_disabled:
                disabled = extra[i]
            return pq_probe_candidates(
                q, centroids, arrays, codes, tcorr, books,
                row_allow=row_allow, disabled_lists=disabled, **kw
            )

        extra = tuple(
            a for a in (self.row_allow, self.disabled_lists)
            if a is not None
        )
        return fn, (self.centroids, self.arrays, self.codes,
                    self.tcorr) + extra

    def rerank_host(self, iids: np.ndarray, q: np.ndarray, k: int):
        """Host rerank stage standalone over candidate ids (native fused
        kernel when the reader layout allows, else the numpy pipeline) —
        the other stage-decomposition hook."""
        from vectorindex_tpu.ops.rerank import (
            rerank_gathered_host,
            rerank_ids_host,
        )

        qnp = np.asarray(q, np.float32)
        iids = np.asarray(iids)
        if getattr(self.reader, "vecs_id_indexed", False):
            out = rerank_ids_host(
                self.reader.vecs, iids, qnp, k=k, metric=self.metric
            )
            if out is not None:
                return out
        if not hasattr(self.reader, "gather_ids"):
            # rows-keyed readers (ArrayReader over CSR-packed storage)
            # cannot serve an id-keyed gather — the full search/stream
            # paths handle them, but this decomposition hook is id-keyed
            # by contract
            raise ValueError(
                "rerank_host requires an id-keyed reader (gather_ids); "
                "this session's reader is rows-keyed — use search()/"
                "stream() instead"
            )
        g = self.reader.gather_ids(iids.reshape(-1))
        d = qnp.shape[1]
        if g.shape[-1] > d:
            g = np.ascontiguousarray(g[:, :d])
        xg = g.reshape(iids.shape[0], iids.shape[1], g.shape[-1])
        return rerank_gathered_host(qnp, xg, iids, k=k, metric=self.metric)

    def stream(
        self, q_batches: Iterable, k: int
    ) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        """PIPELINED serving: yields (dist [B,k], ids [B,k]) per batch, in
        order, with up to `lookahead` device dispatches in flight."""
        from vectorindex_tpu.kernels.adc_probe import (
            ivf_search_pq_hostrerank_stream,
        )

        for sd, si in ivf_search_pq_hostrerank_stream(
            q_batches, self.centroids, self.arrays, self.codes, self.tcorr,
            self.books, self.reader, k=k, lookahead=self.lookahead,
            **self._kw,
        ):
            yield np.asarray(sd), np.asarray(si)
