"""Bulk builders for benchmark-scale index state.

The model classes build storage through per-row host paths (insert_batch /
ingest_flat), which is the durability-friendly route but needlessly slow for
constructing multi-million-row benchmark corpora. These helpers produce the
same device-side structures (ops.ivf.IVFListArrays CSR layout; PQ code/
correction arrays in packed row order) with vectorized numpy, so bench.py
and the capacity-crossover scripts can stand up a 1M-10M index in seconds.

Layout contract matches ops.ivf.IVFListStore._repack: rows sorted by list,
per-list reserved regions whole multiples of 256 rows (kernels/ivf_probe BLK)
so block DMA never crosses a list boundary, dead rows row_id=-1.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vectorindex_tpu.ops.ivf import IVFListArrays

BLK = 256  # kernels/ivf_probe.BLK


def clustered_corpus(
    n: int,
    d: int,
    nlist: int,
    seed: int = 42,
    spread: float = 0.15,
    normalized: bool = True,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Clustered corpus with its true structure exposed:
    (x [n,d], centers [nlist,d], assign [n] i32). Centers are recomputed as
    member means after normalization, i.e. the k-means-optimal centroids for
    the returned data — the 'trained quantizer' operating point without
    paying a k-means run per bench invocation (bench/datagen.generate_clustered
    keeps the single-array API for callers that don't need the structure)."""
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((nlist, d), dtype=np.float32)
    assign = rng.integers(0, nlist, n).astype(np.int32)
    # float32 end-to-end and in-place ops: float64 temps + np.add.at made
    # 10M-row generation take ~12 min on one host core (every bench run
    # regenerates corpora — the driver budget cannot absorb that)
    x = rng.standard_normal((n, d), dtype=np.float32)
    x *= spread
    x += centers[assign]
    if normalized:
        norms = np.sqrt(np.einsum("nd,nd->n", x, x))
        x /= np.maximum(norms, 1e-30)[:, None]
    # member means via per-column weighted bincount (C-speed; np.add.at is
    # a scalar-buffered ufunc loop at this size)
    counts = np.maximum(np.bincount(assign, minlength=nlist), 1)
    sums = np.empty((nlist, d), np.float64)
    for j in range(d):
        sums[:, j] = np.bincount(assign, weights=x[:, j], minlength=nlist)
    centers = (sums / counts[:, None]).astype(np.float32)
    return x, centers, assign


def trained_quantizer(
    x: np.ndarray,
    nlist: int,
    *,
    seed: int = 42,
    train_sample: int = 524288,
    iters: int = 40,
    batch_size: int = 65536,
    assign_chunk: int = 131072,
) -> Tuple[np.ndarray, np.ndarray]:
    """PRODUCTION coarse quantizer: minibatch k-means on a sample, then
    chunked full-corpus assignment → (centers [nlist,d] f32, assign [n] i32).

    The reference always trains its coarse stage (IVFIndex.swift:265-284,
    k-means++ seed + minibatch); benchmarks routed with generator-aligned
    cluster labels never stress routing (recall is flat across nprobe —
    VERDICT r2 missing #3). Assignment is chunked so the [chunk, nlist]
    distance block stays ~2 GB at 10M-row scale instead of materializing
    an impossible [n, nlist] matrix."""
    from vectorindex_tpu.ops import kmeans as km

    n = x.shape[0]
    rng = np.random.default_rng(seed)
    samp = rng.choice(n, min(train_sample, n), replace=False)
    res = km.kmeans(
        jnp.asarray(x[samp]),
        km.KMeansConfig(
            k=nlist, iters=iters, algo="minibatch",
            batch_size=batch_size, seed=seed,
        ),
    )
    centers = np.asarray(res.centroids)
    cent_dev = jnp.asarray(centers)
    assign = np.empty(n, np.int32)
    for s in range(0, n, assign_chunk):
        a, _ = km.assign_clusters(jnp.asarray(x[s : s + assign_chunk]), cent_dev)
        assign[s : s + assign_chunk] = np.asarray(a)
    return centers, assign


def pack_ivf(
    x: np.ndarray,
    assign: np.ndarray,
    nlist: int,
    storage_dtype=jnp.bfloat16,
    with_vecs: bool = True,
    src: np.ndarray = None,
) -> Tuple[IVFListArrays, np.ndarray, int]:
    """Pack (x, assignments) into the CSR device layout.

    Returns (arrays, order, probe_cap): `order` maps packed row -> original
    index (row_ids[row] == order[row]); probe_cap is the static per-list row
    budget for the Pallas probe kernels (256-multiple >= the longest list).

    with_vecs=False builds the codes-only/host-rerank tier: vecs and
    sqnorms stay None (never hit HBM) — only the CSR metadata (starts,
    lengths, row_ids) is device-resident. Valid for the PQ search paths,
    which score from code arrays (kernels/adc_probe).

    src (optional, [n_assign] i32): multi-assignment expansion from
    ops.ivf.spill_assign — assign[j] places row x[src[j]], so a corpus row
    may occupy several CSR slots (one per list it spilled into). row_ids
    then carry ORIGINAL corpus indices (duplicated for spilled rows);
    search epilogues dedup by id."""
    from vectorindex_tpu.kernels.ivf_probe import GUARD_BLOCKS

    n = assign.shape[0]
    lengths = np.bincount(assign, minlength=nlist).astype(np.int32)
    caps = (np.ceil(np.maximum(lengths, 1) / BLK).astype(np.int64)) * BLK
    starts = np.concatenate([[0], np.cumsum(caps)[:-1]]).astype(np.int32)
    # trailing guard blocks for the kernels' chunked / rank-major DMAs
    total = int(caps.sum()) + GUARD_BLOCKS * BLK
    order = np.argsort(assign, kind="stable").astype(np.int32)
    rows = starts[assign[order]] + (
        np.arange(n, dtype=np.int32)
        - np.concatenate([[0], np.cumsum(lengths)[:-1]]).astype(np.int32)[
            assign[order]
        ]
    )
    if src is not None:
        order = src[order]  # packed row -> ORIGINAL corpus index
    row_ids = np.full(total, -1, np.int32)
    row_ids[rows] = order
    if with_vecs:
        dpad = x.shape[1] + (-x.shape[1]) % 128  # Mosaic lane alignment
        vecs = np.zeros((total, dpad), np.float32)
        vecs[rows, : x.shape[1]] = x[order]
        sqn = np.einsum("nd,nd->n", vecs, vecs, dtype=np.float32)
        vecs_dev = jnp.asarray(vecs, dtype=storage_dtype)
        sqn_dev = jnp.asarray(sqn)
    else:
        vecs_dev, sqn_dev = None, None
    arrays = IVFListArrays(
        vecs=vecs_dev,
        row_ids=jnp.asarray(row_ids),
        sqnorms=sqn_dev,
        starts=jnp.asarray(starts),
        lengths=jnp.asarray(lengths),
    )
    probe_cap = int(np.ceil(max(int(lengths.max()), 1) / BLK)) * BLK
    return arrays, order, probe_cap


def pq_csr_state(
    x: np.ndarray,
    assign: np.ndarray,
    centers: np.ndarray,
    arrays: IVFListArrays,
    order: np.ndarray,
    *,
    m: int,
    ks: int = 256,
    u4: bool = False,
    iters: int = 12,
    train_sample: int = 131072,
    seed: int = 7,
    encode_chunk: int = 4_000_000,
):
    """Residual-PQ state in packed row order:
    (books, codes [N_pad, m] u8 — or [N_pad, m//2] nibble-packed when
    u4=True (ks forced to 16) — and tcorr [N_pad] f32). Dead rows are zeros
    (masked by list lengths in the probe kernel).

    u4 at the same byte budget (e.g. pq32x4 vs pq16x8 = 16 B/row) is the
    TPU-friendly code shape: the ADC kernels' one-hot expansion is
    [m·ks, BLK] work per 256-row block, and m·ks drops 8x (512 vs 4096),
    which is exactly the VPU arithmetic that bounds the probe kernel
    (measured round 4: the rank-segment and per-pair grids time identically
    — the kernel is expansion-bound, not DMA-bound).

    Encoding streams host→device in `encode_chunk`-row chunks: a 30M×96
    corpus needs 11.5 GB for x alone — residual+encode over the whole array
    would double-buffer past HBM. Chunking keeps device residency at
    ~2·chunk·d·4 bytes regardless of n (the host tier's whole point).

    Residuals are taken against the list each PACKED slot belongs to
    (derived from the CSR metadata), not assign[order]: under spill
    multi-assignment (ops.ivf.spill_assign) a corpus row's second copy
    lives in — and must be encoded against — its second-nearest list.
    assign is only used to pick the codebook training sample (primary
    assignments; the first n entries under spill)."""
    from vectorindex_tpu.ops import pq as pq_ops
    from vectorindex_tpu.ops.dtypes import pack_u4

    if u4:
        ks = 16
    n = order.shape[0]  # live packed rows (exceeds x rows under spill)
    rng = np.random.default_rng(seed)
    n_x = x.shape[0]
    samp = rng.choice(n_x, min(train_sample, n_x), replace=False)
    key = jax.random.key(seed)
    cent_dev = jnp.asarray(centers)
    books = pq_ops.pq_train_residual(
        key,
        jnp.asarray(x[samp]),
        cent_dev,
        jnp.asarray(assign[samp]),
        m=m,
        ks=ks,
        iters=iters,
    )
    # encode in packed row order
    row_list = np.repeat(
        np.arange(len(np.asarray(arrays.starts)), dtype=np.int32),
        np.asarray(arrays.lengths),
    )
    live_rows = np.flatnonzero(np.asarray(arrays.row_ids) >= 0).astype(np.int32)
    codes_live = np.empty((n, m), np.uint8)
    tcorr_live = np.empty(n, np.float32)
    for s in range(0, n, encode_chunk):
        e = min(s + encode_chunk, n)
        res = pq_ops.residuals(
            jnp.asarray(x[order[s:e]]), cent_dev, jnp.asarray(row_list[s:e])
        )
        cchunk = pq_ops.pq_encode(res, books)
        codes_live[s:e] = np.asarray(cchunk)
        tcorr_live[s:e] = np.asarray(
            pq_ops.pq_row_corrections(
                cchunk, jnp.asarray(row_list[s:e]), cent_dev, books
            )
        )
        del res, cchunk
    total = int(np.asarray(arrays.row_ids).shape[0])
    codes = np.zeros((total, m), np.uint8)
    codes[live_rows] = codes_live
    tcorr = np.zeros(total, np.float32)
    tcorr[live_rows] = tcorr_live
    if u4:
        # nibble-pack AFTER tcorr (pq_row_corrections reads class ids);
        # probe kernels take packed_u4=True and unpack lo|hi in-kernel
        codes = np.asarray(pack_u4(jnp.asarray(codes)))
    return books, jnp.asarray(codes), jnp.asarray(tcorr)


def exact_truth(
    q: np.ndarray, x: np.ndarray, k: int, batch: int = 64
) -> np.ndarray:
    """f32-HIGHEST brute-force top-k ids (ground truth for recall)."""
    xj = jnp.asarray(x)
    out = []
    for s in range(0, q.shape[0], batch):
        qj = jnp.asarray(q[s : s + batch])
        dist = (
            jnp.sum(qj**2, 1)[:, None]
            + jnp.sum(xj**2, 1)[None, :]
            - 2.0
            * jax.lax.dot_general(
                qj,
                xj,
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
        )
        _, ids = jax.lax.top_k(-dist, k)
        out.append(np.asarray(ids))
    return np.concatenate(out, axis=0)


def exact_truth_chunked(
    q: np.ndarray, x: np.ndarray, k: int, row_chunk: int = 2_000_000
) -> np.ndarray:
    """exact_truth for corpora too large for device residency: stream the
    corpus through HBM in row chunks, keep a running top-k merge on host."""
    best_d = np.full((q.shape[0], k), np.inf, np.float32)
    best_i = np.full((q.shape[0], k), -1, np.int64)
    qj = jnp.asarray(q)
    for s in range(0, x.shape[0], row_chunk):
        xj = jnp.asarray(x[s : s + row_chunk])
        dist = (
            jnp.sum(qj**2, 1)[:, None]
            + jnp.sum(xj**2, 1)[None, :]
            - 2.0
            * jax.lax.dot_general(
                qj, xj, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
        )
        cd, ci = jax.lax.top_k(-dist, k)
        cd, ci = np.asarray(-cd), np.asarray(ci) + s
        md = np.concatenate([best_d, cd], axis=1)
        mi = np.concatenate([best_i, ci], axis=1)
        sel = np.argsort(md, axis=1, kind="stable")[:, :k]
        best_d = np.take_along_axis(md, sel, axis=1)
        best_i = np.take_along_axis(mi, sel, axis=1)
        del xj, dist
    return best_i


def recall_at_k(found_ids: np.ndarray, truth_ids: np.ndarray) -> float:
    """Mean |found ∩ truth| / k over queries; found may contain -1/INVALID."""
    k = truth_ids.shape[1]
    return float(
        np.mean(
            [
                len(set(found_ids[i].tolist()) & set(truth_ids[i].tolist())) / k
                for i in range(truth_ids.shape[0])
            ]
        )
    )


def lowdim_corpus(
    n: int, d: int, dz: int = 16, noise: float = 0.05, seed: int = 42
) -> Tuple[np.ndarray, np.ndarray]:
    """(x [n,d], W [dz,d]): unit-norm corpus with intrinsic dimension dz —
    the SIFT-like regime (real descriptor sets have intrinsic dim ~12-16,
    which is what makes 8-byte PQ recall meaningful; i.i.d. gaussian 128-d
    data is maximally hard for ANY 8-byte code and reads as a broken
    benchmark). Queries: draw fresh z, map through the returned W."""
    rng = np.random.default_rng(seed)
    W = (rng.standard_normal((dz, d), dtype=np.float32) / np.sqrt(dz)).astype(
        np.float32
    )
    z = rng.standard_normal((n, dz), dtype=np.float32)
    x = rng.standard_normal((n, d), dtype=np.float32)  # f32 draws: the f64
    x *= noise  # path costs 3-4x on single-core hosts at bench scale
    x += z @ W
    norms = np.sqrt(np.einsum("nd,nd->n", x, x))
    x /= np.maximum(norms, 1e-30)[:, None]
    return x, W


def lowdim_queries(
    W: np.ndarray, nq: int, noise: float = 0.05, seed: int = 9
) -> np.ndarray:
    rng = np.random.default_rng(seed)
    dz, d = W.shape
    q = rng.standard_normal((nq, dz), dtype=np.float32) @ W
    q += noise * rng.standard_normal((nq, d), dtype=np.float32)
    q /= np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-30)
    return q.astype(np.float32)
