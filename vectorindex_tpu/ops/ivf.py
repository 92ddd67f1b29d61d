"""IVF ops: coarse centroid selection, CSR list storage, probed search.

Parity targets:
  - #29 IVF select (nprobe)  Kernels/IVFSelect.swift:78 (ivf_select_nprobe_f32;
    batch variant :242; disabledLists bitset, centroid norms, dot-trick opts
    :16-56; partition+merge multithreading :103-145)
  - #30 IVF append           Kernels/IVFAppend.swift:665 (ivf_append /
    IVFListHandle :220: per-list growable storage, reserve_factor 2.0,
    reserve_min 256 :38-39, zero-copy readList :366, getListStats :317)
  - #40 exact rerank         Operations/Rerank/ExactRerank.swift:655
    (rerank_exact_topk: gather tiles → ScoreBlock → TopK; ±inf sentinels
    :76-78; IVFListVecsReader :153)

TPU-native design:
  - Coarse selection is one small MXU matmul + top-k — the reference's
    kc-row scan with thread partition+merge collapses into the batch dim.
  - List storage is *CSR over a sorted corpus*: vectors live in one flat
    [N_pad, d] array ordered by list, with per-list (start, length) and a
    bucketed per-list capacity (pow2 of reserve_factor·len, min reserve_min)
    so appends don't move data until a list overflows (then the host repacks
    — the analog of the reference's grow-with-copy, IVFAppend.swift:633).
    Contiguous lists make probed gathers block-contiguous in HBM.
  - Probed search gathers candidate rows for (query, probe) pairs and scores
    them with one batched matmul per query chunk; invalid slots get ±inf
    sentinels exactly like rerank. Exactness within probed lists ==
    reference kernel-30 searchKernel30Flat (IVFIndex.swift:862-985).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vectorindex_tpu.ops import scoring
from vectorindex_tpu.ops.topk import INVALID_DIST, INVALID_ID, topk, topk_padded
from vectorindex_tpu.utils.config import Metric

Array = jax.Array

RESERVE_FACTOR = 2.0  # reference IVFAppendOpts.reserve_factor
RESERVE_MIN = 256  # reference IVFAppendOpts.reserve_min


# ---------------------------------------------------------------------------
# #29 — coarse selection
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("nprobe", "metric"))
def ivf_select(
    q: Array,
    centroids: Array,
    *,
    nprobe: int,
    metric: Metric = Metric.L2,
    centroid_sqnorms: Optional[Array] = None,
    centroid_invnorms: Optional[Array] = None,
    disabled: Optional[Array] = None,
) -> Tuple[Array, Array]:
    """Top-nprobe centroids per query → (dist [B,nprobe], list_ids [B,nprobe]).

    Reference ivf_select_nprobe_f32 (IVFSelect.swift:78) with the
    disabledLists mask (IVFSelectOpts.disabledLists) as a boolean array.
    """
    norms = scoring.NormCache(sq=centroid_sqnorms, inv=centroid_invnorms)
    dist = scoring.distance_block(q, centroids, metric, norms=norms)
    if disabled is not None:
        dist = jnp.where(disabled[None, :], INVALID_DIST, dist)
    return topk(dist, min(nprobe, centroids.shape[0]), strict_ties=True)


def spill_assign(
    x,
    centroids,
    *,
    eps: float = 0.2,
    chunk: int = 131072,
    max_spill: int = 2,
) -> Tuple[np.ndarray, np.ndarray, float]:
    """Boundary multi-assignment ("list spill"): rows whose second-nearest
    centroid is nearly as close as their first get encoded into BOTH lists.

    Returns (src [n_exp] i32, assign [n_exp] i32, spill_frac): row j of the
    expanded corpus is x[src[j]] assigned to list assign[j]; the first n
    entries are the primary assignment in corpus order, spilled copies
    follow. A row spills when d2 <= (1+eps)·d1 (squared L2), the classic
    boundary criterion: queries landing between two clusters find their
    neighbors even when only one of the two lists is probed, lifting the
    nprobe-routing recall ceiling without raising nprobe (the grid-step
    cost of the probe kernels scales with nprobe, not rows, so spilling is
    the cheap direction on TPU). The reference has no multi-assignment —
    its recall knob is nprobe alone (IVFSelect.swift:78); this is the
    TPU-native extension the crossover analysis (docs/ROUND3_NOTES.md §5b)
    called for. Search paths must dedup candidate ids (spilled copies share
    their internal id — kernels/adc_probe dedup flag).

    Top-2 distances are computed on device in row chunks ([chunk, kc]
    blocks), same memory discipline as bench/synth.trained_quantizer.
    max_spill is fixed at 2 (primary + one spill) — the measured recall
    gain of a third copy is marginal while memory grows linearly."""
    assert max_spill == 2, "only primary + one spill copy is supported"
    n = x.shape[0]
    cent_dev = jnp.asarray(centroids)

    @jax.jit
    def top2(xc):
        d = scoring.l2sqr_block(xc, cent_dev)
        negd, ids = jax.lax.top_k(-d, 2)
        return -negd, ids

    a1 = np.empty(n, np.int32)
    a2 = np.empty(n, np.int32)
    d1 = np.empty(n, np.float32)
    d2 = np.empty(n, np.float32)
    for s in range(0, n, chunk):
        dd, ii = top2(jnp.asarray(x[s : s + chunk]))
        dd, ii = np.asarray(dd), np.asarray(ii)
        a1[s : s + chunk] = ii[:, 0]
        a2[s : s + chunk] = ii[:, 1]
        d1[s : s + chunk] = dd[:, 0]
        d2[s : s + chunk] = dd[:, 1]
    spill = d2 <= (1.0 + eps) * np.maximum(d1, 1e-30)
    idx = np.flatnonzero(spill).astype(np.int32)
    src = np.concatenate([np.arange(n, dtype=np.int32), idx])
    assign = np.concatenate([a1, a2[idx]])
    return src, assign, float(idx.size) / max(n, 1)


# ---------------------------------------------------------------------------
# #30 — CSR list storage (host control plane / device data plane)
# ---------------------------------------------------------------------------


@partial(jax.jit, donate_argnums=(0,))
def _patch_rows(dst: Array, rows: Array, vals: Array) -> Array:
    """Scatter vals into dst[rows]; out-of-range rows (padding) drop. The
    destination buffer is donated so XLA updates it in place."""
    return dst.at[rows].set(vals, mode="drop")


class IVFListArrays(NamedTuple):
    """Device-side view of the CSR list storage."""

    vecs: Array  # [N_pad, d] sorted by list, storage dtype
    row_ids: Array  # [N_pad] int32 internal id per row (-1 for padding)
    sqnorms: Array  # [N_pad] f32
    starts: Array  # [kc] int32 list start offsets
    lengths: Array  # [kc] int32 live lengths
    timestamps: Optional[Array] = None  # [N_pad] i64, when enabled


class IVFListStore:
    """Host-managed per-list growable storage (reference IVFListHandle,
    IVFAppend.swift:220). Rows are (internal_id, vector); assignment to lists
    comes from the coarse quantizer. Appending within a list's reserved
    capacity is O(1); overflow triggers a repack of the flat arrays (the
    reference grows a single list with copy, IVFAppend.swift:633-712)."""

    def __init__(self, n_lists: int, dim: int, timestamps: bool = False):
        self.n_lists = n_lists
        self.dim = dim
        self.timestamps = timestamps  # reference IVFAppendOpts.timestamps
        self.version = 0  # bumped on every mutation (cache invalidation key)
        # bumped only when packed rows MOVE (repack); in-place appends keep
        # the layout so downstream caches (device arrays, PQ codes) can be
        # patched incrementally instead of rebuilt
        self.layout_version = 0
        self._lists_ids: list[list[int]] = [[] for _ in range(n_lists)]
        self._lists_vecs: list[list[np.ndarray]] = [[] for _ in range(n_lists)]
        self._lists_ts: list[list[int]] = [[] for _ in range(n_lists)]
        self._caps = np.zeros(n_lists, dtype=np.int64)
        self._dirty = True  # needs repack/resync
        self._packed = None  # host CSR mirror
        self._dev: Optional[IVFListArrays] = None
        # in-place appends since the last repack: (version, packed_row, list)
        self._patch_log: list[tuple[int, int, int]] = []
        # packed rows not yet patched into the device mirror
        self._dev_pending: list[int] = []
        # codes-only (host-rerank tier) device view: CSR metadata without
        # vecs/sqnorms ever touching HBM; separate pending list because the
        # two views sync independently
        self._dev_meta: Optional[IVFListArrays] = None
        self._dev_meta_pending: list[int] = []

    # -- mutation --

    def append(
        self, list_id: int, internal_id: int, vec: np.ndarray, ts: int = 0
    ) -> None:
        self.version += 1
        self._lists_ids[list_id].append(internal_id)
        self._lists_vecs[list_id].append(np.asarray(vec, dtype=np.float32))
        if self.timestamps:
            self._lists_ts[list_id].append(int(ts))
        if len(self._lists_ids[list_id]) > self._caps[list_id]:
            self._dirty = True  # overflow → repack on next sync
        else:
            # in-place append into the packed mirror; the device mirror is
            # patched incrementally on the next sync (one bucketed scatter)
            if self._packed is not None and not self._dirty:
                start = self._packed["starts"][list_id]
                ln = self._packed["lengths"][list_id]
                row = int(start + ln)
                self._packed["vecs"][row, : self.dim] = (
                    self._lists_vecs[list_id][-1]
                )
                self._packed["row_ids"][row] = internal_id
                self._packed["sqnorms"][row] = float(np.dot(vec, vec))
                self._packed["lengths"][list_id] += 1
                self._patch_log.append((self.version, row, list_id))
                self._dev_pending.append(row)
                self._dev_meta_pending.append(row)

    def append_batch(self, list_ids, internal_ids, vecs, ts=None) -> None:
        self.version += 1
        vecs = np.asarray(vecs, dtype=np.float32)
        for n_, (l, i, v) in enumerate(
            zip(np.asarray(list_ids), np.asarray(internal_ids), vecs)
        ):
            self._lists_ids[int(l)].append(int(i))
            self._lists_vecs[int(l)].append(v)
            if self.timestamps:
                self._lists_ts[int(l)].append(
                    0 if ts is None else int(np.asarray(ts)[n_])
                )
        self._dirty = True

    def remove(self, list_id: int, internal_id: int) -> bool:
        try:
            pos = self._lists_ids[list_id].index(internal_id)
        except ValueError:
            return False
        self.version += 1
        self._lists_ids[list_id].pop(pos)
        self._lists_vecs[list_id].pop(pos)
        if self.timestamps and pos < len(self._lists_ts[list_id]):
            self._lists_ts[list_id].pop(pos)
        self._dirty = True
        return True

    def clear(self) -> None:
        self.version += 1
        self._lists_ids = [[] for _ in range(self.n_lists)]
        self._lists_vecs = [[] for _ in range(self.n_lists)]
        self._lists_ts = [[] for _ in range(self.n_lists)]
        self._caps[:] = 0
        self._dirty = True
        self._dev = None
        self._dev_meta = None

    # -- packing --

    @staticmethod
    def _cap_for(n: int) -> int:
        want = max(int(n * RESERVE_FACTOR), RESERVE_MIN)
        return 1 << (want - 1).bit_length()

    def _repack(self) -> None:
        lengths = np.array([len(l) for l in self._lists_ids], dtype=np.int32)
        self._caps = np.array([self._cap_for(n) for n in lengths], dtype=np.int64)
        starts = np.zeros(self.n_lists, dtype=np.int32)
        total = 0
        for i in range(self.n_lists):
            starts[i] = total
            total += int(self._caps[i])
        # trailing guard blocks: the Pallas probe kernels DMA KB blocks per
        # wait, so a short last list must have KB-1 blocks of dead rows
        # behind it (kernels/ivf_probe.KB; overshoot is lane-masked)
        from vectorindex_tpu.kernels.ivf_probe import (
            BLK as _BLK,
            GUARD_BLOCKS as _GB,
        )

        total += _GB * _BLK
        # lane padding: Mosaic DMAs reject HBM arrays whose last dim is not
        # a 128-lane multiple (the probe kernels stream [KB, BLK, d] blocks)
        # — zero columns are metric-neutral for L2/IP/cosine
        dpad = self.dim + (-self.dim) % 128
        vecs = np.zeros((max(total, 1), dpad), dtype=np.float32)
        row_ids = np.full(max(total, 1), -1, dtype=np.int32)
        for i in range(self.n_lists):
            n = lengths[i]
            if n:
                v = np.stack(self._lists_vecs[i])
                vecs[starts[i] : starts[i] + n, : self.dim] = v
                row_ids[starts[i] : starts[i] + n] = self._lists_ids[i]
        sqnorms = np.einsum("nd,nd->n", vecs, vecs, dtype=np.float32)
        tsarr = None
        if self.timestamps:
            tsarr = np.zeros(max(total, 1), dtype=np.int64)
            for i in range(self.n_lists):
                n = lengths[i]
                if n:
                    tsarr[starts[i] : starts[i] + n] = self._lists_ts[i]
        self._packed = {
            "vecs": vecs,
            "row_ids": row_ids,
            "sqnorms": sqnorms,
            "starts": starts,
            "lengths": lengths,
            "timestamps": tsarr,
        }
        self._dirty = False
        self._dev = None
        self.layout_version += 1  # rows moved — downstream caches rebuild
        self._patch_log.clear()
        self._dev_pending.clear()
        self._dev_meta = None
        self._dev_meta_pending.clear()

    def sync_device(
        self, storage_dtype=jnp.float32, with_vecs: bool = True
    ) -> IVFListArrays:
        if self._dirty or self._packed is None:
            self._repack()
        p = self._packed
        if not with_vecs:
            # codes-only view (host-memory rerank tier): CSR metadata only —
            # the f32 vectors never leave host RAM (ops/rerank VectorReader)
            if self._dev_meta is None:
                self._dev_meta = IVFListArrays(
                    vecs=None,
                    row_ids=jnp.asarray(p["row_ids"]),
                    sqnorms=None,
                    starts=jnp.asarray(p["starts"]),
                    lengths=jnp.asarray(p["lengths"]),
                    timestamps=(
                        None if p.get("timestamps") is None
                        else jnp.asarray(p["timestamps"])
                    ),
                )
                self._dev_meta_pending.clear()
            elif self._dev_meta_pending:
                rows = np.asarray(
                    sorted(set(self._dev_meta_pending)), dtype=np.int32
                )
                pad = (1 << int(max(len(rows) - 1, 0)).bit_length()) - len(rows)
                n_pad = p["row_ids"].shape[0]
                rows_p = np.concatenate([rows, np.full(pad, n_pad, np.int32)])
                dm = self._dev_meta
                self._dev_meta = IVFListArrays(
                    vecs=None,
                    row_ids=_patch_rows(
                        dm.row_ids, jnp.asarray(rows_p),
                        jnp.asarray(p["row_ids"][rows_p % n_pad]),
                    ),
                    sqnorms=None,
                    starts=dm.starts,
                    lengths=jnp.asarray(p["lengths"]),
                    timestamps=dm.timestamps,
                )
                self._dev_meta_pending.clear()
            return self._dev_meta
        if self._dev is not None and self._dev.vecs.dtype != storage_dtype:
            self._dev = None  # dtype switch — full re-upload
        if self._dev is None:
            self._dev = IVFListArrays(
                vecs=jnp.asarray(p["vecs"], dtype=storage_dtype),
                row_ids=jnp.asarray(p["row_ids"]),
                sqnorms=jnp.asarray(p["sqnorms"]),
                starts=jnp.asarray(p["starts"]),
                lengths=jnp.asarray(p["lengths"]),
                timestamps=(
                    None if p.get("timestamps") is None
                    else jnp.asarray(p["timestamps"])
                ),
            )
            self._dev_pending.clear()
        elif self._dev_pending:
            # incremental device patch: one bucketed scatter for the rows
            # appended in place since the last sync (pow2-padded so shapes —
            # and therefore compiled programs — repeat across calls)
            rows = np.asarray(sorted(set(self._dev_pending)), dtype=np.int32)
            pad = (1 << int(max(len(rows) - 1, 0)).bit_length()) - len(rows)
            n_pad = p["vecs"].shape[0]
            rows_p = np.concatenate(
                [rows, np.full(pad, n_pad, np.int32)]
            )  # OOB rows drop in the scatter
            d = self._dev
            self._dev = IVFListArrays(
                vecs=_patch_rows(
                    d.vecs, jnp.asarray(rows_p),
                    jnp.asarray(p["vecs"][rows_p % n_pad], dtype=d.vecs.dtype),
                ),
                row_ids=_patch_rows(
                    d.row_ids, jnp.asarray(rows_p),
                    jnp.asarray(p["row_ids"][rows_p % n_pad]),
                ),
                sqnorms=_patch_rows(
                    d.sqnorms, jnp.asarray(rows_p),
                    jnp.asarray(p["sqnorms"][rows_p % n_pad]),
                ),
                starts=d.starts,
                lengths=jnp.asarray(p["lengths"]),
                timestamps=(
                    None if p.get("timestamps") is None
                    else jnp.asarray(p["timestamps"])
                ),
            )
            self._dev_pending.clear()
        return self._dev

    @property
    def max_length(self) -> int:
        return max((len(l) for l in self._lists_ids), default=0)

    def list_stats(self) -> dict:
        """Reference getListStats (IVFAppend.swift:317)."""
        lengths = np.array([len(l) for l in self._lists_ids])
        total = int(lengths.sum())
        return {
            "n_lists": self.n_lists,
            "total": total,
            "max_len": int(lengths.max()) if len(lengths) else 0,
            "min_len": int(lengths.min()) if len(lengths) else 0,
            "mean_len": float(lengths.mean()) if len(lengths) else 0.0,
            "empty_lists": int((lengths == 0).sum()),
            "reserved_rows": int(self._caps.sum()),
        }

    def read_list(self, list_id: int) -> Tuple[np.ndarray, np.ndarray]:
        """Zero-copy-ish host view (reference readList, IVFAppend.swift:366)."""
        ids = np.asarray(self._lists_ids[list_id], dtype=np.int32)
        vecs = (
            np.stack(self._lists_vecs[list_id])
            if self._lists_ids[list_id]
            else np.zeros((0, self.dim), np.float32)
        )
        return ids, vecs


# ---------------------------------------------------------------------------
# probed search (#29 + #40 fused): select lists → gather rows → score → topk
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("nprobe", "probe_cap", "k", "metric", "query_chunk"))
def ivf_search_flat(
    q: Array,
    centroids: Array,
    arrays: IVFListArrays,
    *,
    nprobe: int,
    probe_cap: int,
    k: int,
    metric: Metric = Metric.L2,
    query_chunk: int = 16,
    row_allow: Optional[Array] = None,  # [N_pad] bool, CSR row order —
    #   masked into the probed distances BEFORE top-k (IDFilter.swift:104)
    disabled_lists: Optional[Array] = None,  # [kc] bool (IVFSelect.swift:16)
) -> Tuple[Array, Array]:
    """IVF-Flat probed search → (dist [B,k], internal ids [B,k]).

    probe_cap: static per-list row budget (≥ max list length for exact
    probing — bucketed pow2 so recompiles are O(log max_len)).
    Rebuild of searchKernel30Flat (IVFIndex.swift:862): #29 select →
    contiguous readList gather → ScoreBlock → TopK, all batched; the
    reference's candidate packing list<<32|offset becomes direct internal-id
    gather since rows carry their ids.
    """
    b = q.shape[0]
    sel_d, probe_lists = ivf_select(
        q, centroids, nprobe=nprobe, metric=metric, disabled=disabled_lists
    )
    sel_live = (
        jnp.isfinite(sel_d) if disabled_lists is not None else None
    )  # [B, nprobe]: disabled lists rank last but CAN be selected when
    #    nprobe spans all lists — their rows must not be scanned
    dstore = arrays.vecs.shape[1]
    if q.shape[1] != dstore:  # lane-padded storage: pad q to match (zeros
        # contribute nothing to any metric)
        q = jnp.pad(q, ((0, 0), (0, dstore - q.shape[1])))

    def chunk_fn(qc_and_pl):
        qc, pl, plive = qc_and_pl  # [C, d], [C, nprobe], [C, nprobe]
        starts = arrays.starts[pl]  # [C, nprobe]
        lens = jnp.where(plive, arrays.lengths[pl], 0)
        # candidate row indices: [C, nprobe, probe_cap]
        offs = jax.lax.broadcasted_iota(jnp.int32, (1, 1, probe_cap), 2)
        rows = starts[:, :, None] + offs
        valid = offs < lens[:, :, None]
        rows = jnp.where(valid, rows, 0)
        if row_allow is not None:
            valid = valid & row_allow[rows]
        cand = rows.reshape(qc.shape[0], nprobe * probe_cap)
        vmask = valid.reshape(qc.shape[0], nprobe * probe_cap)
        xg = arrays.vecs[cand]  # [C, P, d] — storage dtype (bf16 fast path)
        sg = arrays.sqnorms[cand]
        ig = arrays.row_ids[cand]
        # per-query scoring: qc [C, d] vs xg [C, P, d]; keep the storage
        # dtype into the dot (an astype here materializes an f32 copy of
        # the whole gathered block)
        g = jnp.einsum(
            "cd,cpd->cp", qc.astype(xg.dtype), xg,
            preferred_element_type=jnp.float32,
        )
        if metric == Metric.L2:
            qn = jnp.sum(jnp.square(qc.astype(jnp.float32)), axis=-1)
            dist = jnp.maximum(qn[:, None] + sg - 2.0 * g, 0.0)
        elif metric == Metric.INNER_PRODUCT:
            dist = -g
        elif metric == Metric.COSINE:
            qinv = scoring.inv_norms(qc)
            xinv = jnp.where(sg > 0, jax.lax.rsqrt(jnp.maximum(sg, 1e-30)), 0.0)
            dist = 1.0 - g * qinv[:, None] * xinv
        else:
            raise ValueError(f"ivf_search_flat unsupported metric {metric}")
        return topk_padded(dist, vmask, k, ids=ig)

    # chunk queries to bound gather memory: [B] → ceil(B/C) chunks
    c = min(query_chunk, b)
    pad = (-b) % c
    if pad:
        q = jnp.concatenate([q, jnp.zeros((pad, q.shape[1]), q.dtype)])
        probe_lists = jnp.concatenate(
            [probe_lists, jnp.zeros((pad, nprobe), probe_lists.dtype)]
        )
    if sel_live is None:
        sel_live = jnp.ones(probe_lists.shape, bool)
    elif pad:
        sel_live = jnp.concatenate(
            [sel_live, jnp.zeros((pad, nprobe), bool)]
        )
    qs = q.reshape(-1, c, q.shape[1])
    pls = probe_lists.reshape(-1, c, nprobe)
    plv = sel_live.reshape(-1, c, nprobe)
    dists, ids = jax.lax.map(chunk_fn, (qs, pls, plv))
    dists = dists.reshape(-1, k)[:b]
    ids = ids.reshape(-1, k)[:b]
    return dists, ids


def probe_cap_for(max_len: int) -> int:
    """Bucketed static probe capacity (pow2, ≥ RESERVE_MIN)."""
    return 1 << max(max_len - 1, RESERVE_MIN - 1).bit_length()


# ---------------------------------------------------------------------------
# #40 — standalone exact rerank (used by PQ paths; IVF-Flat scoring is
# already exact within probed lists)
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("k", "metric"))
def rerank_exact_topk(
    q: Array,
    candidates: Array,  # [B, C] row indices into vecs (may contain INVALID_ID)
    vecs: Array,  # [N, d]
    sqnorms: Array,  # [N]
    *,
    k: int,
    metric: Metric = Metric.L2,
    cand_ids: Optional[Array] = None,  # ids to report; default = candidates
) -> Tuple[Array, Array]:
    """Re-score candidate rows exactly and select top-k (reference
    rerank_exact_topk, ExactRerank.swift:655). Missing rows (INVALID_ID)
    get +inf sentinels (:76-78)."""
    missing = candidates == INVALID_ID
    rows = jnp.where(missing, 0, candidates)
    xg = vecs[rows]  # [B, C, d]
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
    elif metric == Metric.COSINE:
        qinv = scoring.inv_norms(q)
        xinv = jnp.where(sg > 0, jax.lax.rsqrt(jnp.maximum(sg, 1e-30)), 0.0)
        dist = 1.0 - g * qinv[:, None] * xinv
    else:
        raise ValueError(f"rerank unsupported metric {metric}")
    ids = candidates if cand_ids is None else cand_ids
    return topk_padded(dist, ~missing, k, ids=ids)


# ---------------------------------------------------------------------------
# #29 variant — beam selection over a centroid kNN graph
# ---------------------------------------------------------------------------


def build_centroid_graph(centroids: Array, degree: int = 16) -> Array:
    """kNN graph over centroids [kc, degree] (the routing structure for
    beam selection; reference ivf_select_beam_f32's centroid graph,
    IVFSelect.swift:166)."""
    from vectorindex_tpu.ops import scoring as _scoring

    d2 = _scoring.l2sqr_block(centroids, centroids)
    kc = centroids.shape[0]
    eye = jax.lax.broadcasted_iota(jnp.int32, (kc, kc), 0) == jax.lax.broadcasted_iota(
        jnp.int32, (kc, kc), 1
    )
    d2 = jnp.where(eye, INVALID_DIST, d2)  # exclude self (eye*inf would NaN)
    _, nbrs = topk(d2, min(degree, kc - 1), strict_ties=True)
    return nbrs


@partial(jax.jit, static_argnames=("nprobe", "beam_width", "iters", "metric"))
def ivf_select_beam(
    q: Array,
    centroids: Array,
    centroid_graph: Array,  # [kc, degree] from build_centroid_graph
    *,
    nprobe: int,
    beam_width: int = 32,
    iters: int = 4,
    metric: Metric = Metric.L2,
) -> Tuple[Array, Array]:
    """Beam-search centroid selection (reference ivf_select_beam_f32,
    IVFSelect.swift:166): instead of scoring all kc centroids, walk the
    centroid kNN graph from the globally-best seeds. Pays off when kc is
    large (≥100k — the regime where the reference multi-threads the full
    scan). Falls back to exhaustive behavior as beam_width·iters·degree
    approaches kc."""
    from vectorindex_tpu.ops import graph as gops

    kc = centroids.shape[0]
    sqn = scoring.squared_norms(centroids)
    # seed the beam from a strided subsample scored exhaustively
    stride = max(kc // (beam_width * 4), 1)
    seeds = jnp.arange(0, kc, stride, dtype=jnp.int32)[: beam_width * 4]
    seed_dist = scoring.distance_block(q, centroids[seeds], metric)
    _, best = topk(seed_dist, 1, strict_ties=True)
    entry = seeds[best[:, 0]]
    beam = gops.beam_search(
        q,
        centroids,
        sqn,
        centroid_graph,
        None,
        entry,
        ef=max(beam_width, nprobe),
        iters=iters * beam_width,
    )
    return beam.dists[:, :nprobe], beam.ids[:, :nprobe]
