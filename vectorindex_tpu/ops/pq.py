"""Product quantization: training, encoding, LUT build, ADC scan, residuals.

Parity targets:
  - #19 PQ train    Kernels/PQTrain.swift:83 (pq_train_f32: per-subspace
    k-means, subspaces trained in parallel; residual mode via
    coarseCentroids+assignments args :89-90; streaming :390)
  - #20 PQ encode   Operations/Quantization/PQEncode.swift:66-452 +
    Sources/CPQEncode/pq_encode.c (u8 ks=256 / u4 ks=16 nearest-centroid
    assignment, direct-L2 and dot-trick paths :279-450, residual variants,
    u4 pack)
  - #21 PQ LUT      Operations/Quantization/PQLUT.swift:183-419
    (pq_query_subnorms, pq_lut_l2, fused residual LUT for IVF-PQ :287,
    batch LUT :419)
  - #22 ADC scan    Operations/Quantization/ADCScan.swift:54-148
    (dist(i)=Σ_j LUT[j, code[i,j]] gather-accumulate, u8/u4)
  - #23 residuals   Kernels/ResidualKernel.swift:148 (r = x − c[assign])

TPU-native design:
  - training vmaps the k-means stack over the m subspaces — the reference's
    per-subspace thread pool becomes a batch dimension.
  - encoding is a chunked batched argmin over codebooks (dot-trick on the
    MXU), not a NEON scan loop.
  - ADC offers two device strategies:
      'gather'  — flat-indexed LUT gather (XLA gather; wins at small batch)
      'onehot'  — one-hot(codes) @ LUTᵀ on the MXU (wins at large batch:
                  the one-hot matrix is shared across all queries in the
                  batch, so the scan rides the systolic array)
    Both are exact; chunked over rows to bound memory.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from vectorindex_tpu.ops import kmeans as km
from vectorindex_tpu.ops.dtypes import pack_u4, unpack_u4

Array = jax.Array


class PQCodebooks(NamedTuple):
    """codebooks [m, ks, dsub] + cached squared norms [m, ks]."""

    centroids: Array
    sqnorms: Array

    @property
    def m(self) -> int:
        return self.centroids.shape[0]

    @property
    def ks(self) -> int:
        return self.centroids.shape[1]

    @property
    def dsub(self) -> int:
        return self.centroids.shape[2]


def _split_subspaces(x: Array, m: int) -> Array:
    n, d = x.shape
    assert d % m == 0, f"dimension {d} not divisible by m={m}"
    return x.reshape(n, m, d // m).transpose(1, 0, 2)  # [m, n, dsub]


# ---------------------------------------------------------------------------
# #19 — training
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("m", "ks", "iters", "seeding"))
def pq_train(
    key: Array,
    x: Array,
    *,
    m: int,
    ks: int = 256,
    iters: int = 25,
    seeding: str = "random",
) -> PQCodebooks:
    """Train per-subspace codebooks (reference pq_train_f32, PQTrain.swift:83;
    maxIters default 25). Subspaces train in parallel via vmap — each gets an
    independent RNG stream (reference SubspaceAccumulator parallelism).

    seeding: 'random' (default — distinct random data points; the sequential
    k-means++ D² scan compiles to a ks-step program that costs minutes of
    XLA compile per shape for marginal PQ quality) or 'pp' (exact k-means++
    parity with the kmeans stack)."""
    xt = _split_subspaces(x, m)  # [m, n, dsub]
    keys = jax.random.split(key, m)
    n = x.shape[0]

    def train_one(k_, xs):
        if seeding == "pp":
            seed = km.kmeans_pp_seed(k_, xs, ks)
        else:
            idx = jax.random.permutation(k_, n)[:ks]
            seed = xs[idx]
        res = km.kmeans_lloyd(k_, xs, seed, k=ks, iters=iters)
        return res.centroids

    cents = jax.vmap(train_one)(keys, xt)  # [m, ks, dsub]
    sqn = jnp.sum(jnp.square(cents), axis=-1)
    return PQCodebooks(cents, sqn)


def pq_train_residual(
    key: Array,
    x: Array,
    coarse_centroids: Array,
    assignments: Array,
    *,
    m: int,
    ks: int = 256,
    iters: int = 25,
) -> PQCodebooks:
    """Residual-PQ training for IVF-PQ (reference pq_train_f32 residual mode,
    PQTrain.swift:89-90): train on r = x − c[assign] (#23)."""
    res = residuals(x, coarse_centroids, assignments)
    return pq_train(key, res, m=m, ks=ks, iters=iters)


# ---------------------------------------------------------------------------
# #23 — residuals
# ---------------------------------------------------------------------------


@jax.jit
def residuals(x: Array, coarse_centroids: Array, assignments: Array) -> Array:
    """r = x − c[assign] (reference residuals_f32, ResidualKernel.swift:148).
    Accepts lane-padded x (IVFListStore packs vectors to 128-column
    multiples for the Pallas DMA tiling) — trailing pad columns are
    sliced off to the centroid width."""
    if x.shape[1] > coarse_centroids.shape[1]:
        x = x[:, : coarse_centroids.shape[1]]
    return x - coarse_centroids[assignments]


# ---------------------------------------------------------------------------
# #20 — encoding
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("chunk",))
def pq_encode(x: Array, books: PQCodebooks, chunk: int = 4096) -> Array:
    """Encode rows → codes [n, m] (u8). Nearest centroid per subspace via the
    dot-trick on the MXU (reference pq_encode_u8_f32 withCSQ — the cached
    codebook sq-norms are books.sqnorms, cpq_encode.h:54-64). Chunked over
    rows so the [chunk, m, ks] distance tensor stays small. Jitted: an eager
    lax.map under the remote-compile platform pays a fresh scan compile per
    distinct call chain."""
    n, d = x.shape
    m, ks, dsub = books.centroids.shape
    pad = (-n) % chunk
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad, d), x.dtype)])

    xs = x.reshape(-1, chunk, d)

    def enc(xc):
        xt = xc.reshape(chunk, m, dsub)
        dots = jnp.einsum(
            "nmd,mkd->nmk", xt.astype(jnp.float32), books.centroids,
            preferred_element_type=jnp.float32,
        )
        d2 = books.sqnorms[None] - 2.0 * dots  # ‖x‖² term constant per argmin
        return jnp.argmin(d2, axis=-1).astype(jnp.uint8)

    codes = jax.lax.map(enc, xs).reshape(-1, m)
    return codes[:n]


def pq_encode_u4(x: Array, books: PQCodebooks, chunk: int = 4096) -> Array:
    """u4 encode (ks ≤ 16) with nibble packing → [n, m//2] bytes (reference
    pq_encode_u4_f32, PQEncode.swift:178)."""
    assert books.ks <= 16, "u4 encode requires ks <= 16"
    return pack_u4(pq_encode(x, books, chunk=chunk))


def pq_encode_residual(
    x: Array,
    coarse_centroids: Array,
    assignments: Array,
    books: PQCodebooks,
    chunk: int = 4096,
) -> Array:
    """Residual encode for IVF-PQ (reference pq_encode_u8_residual,
    PQEncode.swift:241-444)."""
    return pq_encode(residuals(x, coarse_centroids, assignments), books, chunk=chunk)


@jax.jit
def pq_decode(codes: Array, books: PQCodebooks) -> Array:
    """Reconstruct vectors from codes (for tests / reconstruction error)."""
    n, m = codes.shape
    gathered = books.centroids[
        jnp.arange(m)[None, :], codes.astype(jnp.int32)
    ]  # [n, m, dsub]
    return gathered.reshape(n, m * books.dsub)


# ---------------------------------------------------------------------------
# #21 — LUT build
# ---------------------------------------------------------------------------


@jax.jit
def pq_lut_l2(q: Array, books: PQCodebooks) -> Array:
    """L[b, j, k] = ‖q_j − C_j[k]‖² (reference pq_lut_l2_f32, PQLUT.swift:200;
    dot-trick like PQLutOpts.useDotTrick auto at ks≥64). [B, m, ks]."""
    b, d = q.shape
    m, ks, dsub = books.centroids.shape
    qt = q.reshape(b, m, dsub).astype(jnp.float32)
    dots = jnp.einsum(
        "bmd,mkd->bmk", qt, books.centroids, preferred_element_type=jnp.float32
    )
    qsq = jnp.sum(jnp.square(qt), axis=-1)  # [B, m]
    return jnp.maximum(qsq[:, :, None] + books.sqnorms[None] - 2.0 * dots, 0.0)


@jax.jit
def pq_lut_ip(q: Array, books: PQCodebooks) -> Array:
    """Inner-product LUT: L[b, j, k] = −⟨q_j, C_j[k]⟩ so ADC sums are
    ascending distances."""
    b, d = q.shape
    m, ks, dsub = books.centroids.shape
    qt = q.reshape(b, m, dsub).astype(jnp.float32)
    return -jnp.einsum(
        "bmd,mkd->bmk", qt, books.centroids, preferred_element_type=jnp.float32
    )


@jax.jit
def pq_lut_residual_l2(
    q: Array, coarse_centroids: Array, lists: Array, books: PQCodebooks
) -> Array:
    """Fused residual LUT for IVF-PQ (reference pq_lut_residual_l2_f32,
    PQLUT.swift:287): for each (query b, probed list p), the LUT of
    (q − c_list) against the codebooks. lists [B, P] → [B, P, m, ks]."""
    b = q.shape[0]
    p = lists.shape[1]
    m, ks, dsub = books.centroids.shape
    rq = q[:, None, :] - coarse_centroids[lists]  # [B, P, d]
    rt = rq.reshape(b, p, m, dsub).astype(jnp.float32)
    dots = jnp.einsum(
        "bpmd,mkd->bpmk", rt, books.centroids, preferred_element_type=jnp.float32
    )
    rsq = jnp.sum(jnp.square(rt), axis=-1)  # [B, P, m]
    return jnp.maximum(rsq[..., None] + books.sqnorms[None, None] - 2.0 * dots, 0.0)


# ---------------------------------------------------------------------------
# #22 — ADC scan
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("strategy", "chunk"))
def adc_scan(
    codes: Array,
    lut: Array,
    *,
    strategy: str = "auto",
    chunk: int = 8192,
) -> Array:
    """dist[b, i] = Σ_j LUT[b, j, codes[i, j]] (reference adc_scan_u8,
    ADCScan.swift:54). codes [n, m] u8, lut [B, m, ks] → [B, n] f32.

    strategy='auto': the Pallas kernel on TPU (measured 9.3 ms vs 83/36 ms
    for the XLA strategies at 1M×128q, kernels/adc.py), 'gather' elsewhere.
    strategy='onehot': XLA one-hot(codes) @ lutᵀ (MXU, but materializes the
    one-hot in HBM). strategy='gather': flat-index XLA gather.
    """
    if strategy == "auto":
        if jax.default_backend() not in ("cpu",):
            from vectorindex_tpu.kernels.adc import adc_scan_pallas

            return adc_scan_pallas(codes, lut)
        strategy = "gather"
    n, m = codes.shape
    b, m2, ks = lut.shape
    assert m2 == m
    lut_flat = lut.reshape(b, m * ks)
    offsets = (jnp.arange(m, dtype=jnp.int32) * ks)[None, :]
    pad = (-n) % chunk
    codes_p = jnp.concatenate([codes, jnp.zeros((pad, m), codes.dtype)]) if pad else codes
    cs = codes_p.reshape(-1, chunk, m)

    if strategy == "onehot":
        lut_t = lut_flat.T  # [m·ks, B]
        # bf16 one-hot rides the MXU on TPU; the CPU backend lacks
        # bf16×bf16→f32 dots, so fall back to f32 there (same results — the
        # one-hot side is exact either way)
        oh_dtype = jnp.float32 if jax.default_backend() == "cpu" else jnp.bfloat16

        def scan_chunk(cc):
            flat = cc.astype(jnp.int32) + offsets  # [chunk, m]
            oh = jax.nn.one_hot(flat, m * ks, dtype=oh_dtype).sum(axis=1)
            return jax.lax.dot_general(
                oh,
                lut_t.astype(oh_dtype),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).T  # [B, chunk]

        out = jax.lax.map(scan_chunk, cs)  # [nc, B, chunk]
        return out.transpose(1, 0, 2).reshape(b, -1)[:, :n]

    if strategy == "gather":

        def scan_chunk(cc):
            flat = cc.astype(jnp.int32) + offsets  # [chunk, m]
            g = jnp.take(lut_flat, flat.reshape(-1), axis=1)  # [B, chunk*m]
            return g.reshape(b, chunk, m).sum(axis=-1)  # [B, chunk]

        out = jax.lax.map(scan_chunk, cs)
        return out.transpose(1, 0, 2).reshape(b, -1)[:, :n]

    raise ValueError(f"unknown ADC strategy {strategy!r}")


def adc_scan_u4(packed_codes: Array, lut: Array, **kw) -> Array:
    """u4 variant (reference adc_scan_u4, ADCScan.swift:99). lut must have
    ks ≤ 16. On TPU the Pallas kernel unpacks nibbles in VMEM so HBM only
    sees the packed bytes; elsewhere unpack-then-scan."""
    if kw.get("strategy", "auto") == "auto" and jax.default_backend() != "cpu":
        from vectorindex_tpu.kernels.adc import adc_scan_u4_pallas

        return adc_scan_u4_pallas(packed_codes, lut)
    return adc_scan(unpack_u4(packed_codes), lut, **kw)


# ---------------------------------------------------------------------------
# streaming training (reference pq_train_streaming_f32, PQTrain.swift:390;
# chunked API for datasets larger than memory like
# kmeans_state_init/update_chunk, KMeansMiniBatchKernel.swift:771-886)
# ---------------------------------------------------------------------------


class PQStreamState(NamedTuple):
    states: tuple  # per-subspace KMeansStreamState
    m: int


def pq_stream_init(key: Array, first_chunk: Array, *, m: int, ks: int) -> PQStreamState:
    """Initialize per-subspace streaming k-means from the first chunk
    (random distinct seeds per subspace)."""
    xt = _split_subspaces(first_chunk, m)
    keys = jax.random.split(key, m)
    states = []
    for j in range(m):
        idx = jax.random.permutation(keys[j], xt.shape[1])[:ks]
        states.append(km.kmeans_stream_init(xt[j][idx]))
    return PQStreamState(tuple(states), m)


def pq_stream_update(state: PQStreamState, chunk: Array) -> PQStreamState:
    """Consume one chunk of rows."""
    xt = _split_subspaces(chunk, state.m)
    states = tuple(
        km.kmeans_stream_update(s, xt[j]) for j, s in enumerate(state.states)
    )
    return PQStreamState(states, state.m)


def pq_stream_finalize(state: PQStreamState) -> PQCodebooks:
    cents = jnp.stack([km.kmeans_stream_finalize(s) for s in state.states])
    return PQCodebooks(cents, jnp.sum(jnp.square(cents), axis=-1))


@jax.jit
def pq_lut_q_l2(q: Array, books: PQCodebooks) -> Array:
    """Query-only component of the residual L2 LUT: −2⟨q_j, C_j[k]⟩.

    The faiss-style decomposition of the fused residual LUT (#21):
      ‖(q−c_l) − r̂‖² = ‖q−c_l‖² + Σ_j(−2⟨q_j, C_j[k_j]⟩)
                        + Σ_j(2⟨c_{l,j}, C_j[k_j]⟩ + ‖C_j[k_j]‖²)
    base(q, l) comes from #29's select distances, the middle term is this
    per-QUERY table (no per-probe LUTs → it fits VMEM for the whole batch),
    and the last term depends only on the stored row (pq_row_corrections).
    """
    return 2.0 * pq_lut_ip(q, books)


@partial(jax.jit, static_argnames=("chunk",))
def pq_row_corrections(
    codes: Array,  # [N, m] u8 (UNPACKED)
    row_list: Array,  # [N] i32 list id per row
    coarse_centroids: Array,  # [kc, d]
    books: PQCodebooks,
    chunk: int = 65536,
) -> Array:
    """Per-row constant of the decomposed residual LUT:
    t[i] = Σ_j (2⟨c_{l(i),j}, C_j[codes_ij]⟩ + ‖C_j[codes_ij]‖²)  → [N] f32.
    Precomputed once per encode (rides the code cache)."""
    n, m = codes.shape
    kc, d = coarse_centroids.shape
    _, ks, dsub = books.centroids.shape
    # cdot[l, j, k] = ⟨c_{l,j}, C_j[k]⟩
    ct = coarse_centroids.reshape(kc, m, dsub).astype(jnp.float32)
    cdot = jnp.einsum(
        "lmd,mkd->lmk", ct, books.centroids, preferred_element_type=jnp.float32
    )  # [kc, m, ks]
    table = 2.0 * cdot + books.sqnorms[None]  # [kc, m, ks]

    pad = (-n) % chunk
    codes_p = jnp.concatenate(
        [codes, jnp.zeros((pad, m), codes.dtype)]
    ) if pad else codes
    lists_p = jnp.concatenate(
        [row_list, jnp.zeros((pad,), row_list.dtype)]
    ) if pad else row_list

    def chunk_fn(args):
        cc, ll = args  # [C, m] u8, [C] i32
        tl = table[ll]  # [C, m, ks]
        vals = jnp.take_along_axis(
            tl, cc.astype(jnp.int32)[:, :, None], axis=2
        )[..., 0]
        return jnp.sum(vals, axis=1)

    out = jax.lax.map(
        chunk_fn,
        (codes_p.reshape(-1, chunk, m), lists_p.reshape(-1, chunk)),
    )
    return out.reshape(-1)[:n]
