"""Exact rerank over an abstract vector source (the VectorReader seam).

Parity target: reference ExactRerank.swift:81-96 — the rerank stage reads
its full-precision vectors through a `VectorReader` protocol rather than a
concrete buffer, including a callback-backed reader (ExactRerank.swift:211
CallbackReader). That seam is what lets rerank sources live OUTSIDE index
memory.

TPU capacity tier built on it: PQ codes (+ids +corrections, ~24 B/row at
pq16) stay in HBM; the f32 corpus (384 B/row at d=96) stays in HOST RAM.
The ADC probe kernel selects top-C candidate CSR rows on-device, only those
B·C rows cross PCIe per batch, and a small jitted program reranks them at
f32-HIGHEST. Per-chip capacity is then bounded by the code arrays — ~100M
rows/chip instead of the ~10M the f32/bf16-resident tiers top out at
(VERDICT r2 missing #5 / docs/ROADMAP.md #2).
"""

from __future__ import annotations

import os
from functools import partial
from typing import Callable, Protocol, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vectorindex_tpu.ops.topk import INVALID_DIST, INVALID_ID, topk
from vectorindex_tpu.utils.config import Metric

Array = jax.Array


class VectorReader(Protocol):
    """Abstract full-precision vector source keyed by CSR row
    (reference VectorReader, ExactRerank.swift:81-96)."""

    def gather(self, rows: np.ndarray) -> np.ndarray:
        """rows [K] i32 (CSR rows, already clipped to valid range) →
        [K, d] f32."""
        ...


class ArrayReader:
    """Host ndarray in CSR row order (row r holds the vector of CSR row r)."""

    def __init__(self, vecs: np.ndarray):
        self.vecs = np.ascontiguousarray(vecs, dtype=np.float32)

    def gather(self, rows: np.ndarray) -> np.ndarray:
        return self.vecs[rows]


class CSRReader:
    """Host ndarray in ORIGINAL row order + the CSR row_ids table — avoids
    materializing a second, CSR-ordered copy of a multi-GB corpus."""

    # Explicit contract flag for the fused native path: `vecs` is indexed
    # by ORIGINAL corpus id, i.e. vecs[id] is exactly what gather_ids([id])
    # returns. Consumers (kernels/adc_probe.py) gate on THIS, not on the
    # mere presence of a `vecs` attribute — a reader exposing a
    # CSR-ordered or otherwise non-id-indexed `vecs` must leave it False.
    vecs_id_indexed = True

    def __init__(self, vecs: np.ndarray, row_ids: np.ndarray):
        self.vecs = vecs
        self.row_ids = np.asarray(row_ids)

    def gather(self, rows: np.ndarray) -> np.ndarray:
        orig = self.row_ids[rows]
        return self.vecs[np.maximum(orig, 0)].astype(np.float32, copy=False)

    def gather_ids(self, ids: np.ndarray) -> np.ndarray:
        """Gather by ORIGINAL corpus id (what pq_probe_candidates returns as
        `iids`) — the host-rerank serving loop then needs only ONE [B,C]
        array off the device per batch instead of (rows, iids): ids double
        as both the gather key and the dedup/missing sentinel carrier.
        Out-of-range ids (INVALID_ID = i32 max, dead-slot -1) read row 0;
        callers mask them by id sentinel as usual."""
        safe = np.where((ids < 0) | (ids >= self.vecs.shape[0]), 0, ids)
        return self.vecs[safe].astype(np.float32, copy=False)


class CallbackReader:
    """Arbitrary gather callback — mmap'd files, remote storage, decoders
    (reference CallbackReader, ExactRerank.swift:211)."""

    def __init__(self, fn: Callable[[np.ndarray], np.ndarray]):
        self.fn = fn

    def gather(self, rows: np.ndarray) -> np.ndarray:
        return np.asarray(self.fn(rows), dtype=np.float32)


_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "persistence", "native",
)
_HOSTOPS_SRC = os.path.join(_NATIVE_DIR, "hostops.cpp")
_hostops_lib = None
_hostops_failed = False


def _hostops_so_path() -> str:
    """Cached-.so name keyed by (source hash, CPU arch): a source edit or a
    host swap (e.g. the round-4 AVX-512 box replaced by one without it —
    -march=native code would SIGILL) forces a rebuild instead of CDLL'ing a
    stale binary."""
    import hashlib
    import platform

    with open(_HOSTOPS_SRC, "rb") as f:
        src_h = hashlib.sha256(f.read()).hexdigest()[:12]
    arch = platform.machine()
    try:  # -march=native output depends on the concrete CPU flags; hash
        # only the STABLE identity lines — raw cpuinfo contains volatile
        # fields ("cpu MHz" under frequency scaling) that would defeat
        # the cache and leak one .so per process
        with open("/proc/cpuinfo") as f:
            stable = sorted(
                {
                    ln.strip()
                    for ln in f
                    if ln.startswith(("model name", "flags", "vendor_id"))
                }
            )
        arch += "-" + hashlib.sha256(
            "\n".join(stable).encode()
        ).hexdigest()[:8]
    except OSError:
        pass
    return os.path.join(_NATIVE_DIR, f"libvindex_hostops_{src_h}_{arch}.so")


def _hostops():
    """Lazy build+load of the native host-ops library (persistence/native/
    hostops.cpp), mirroring persistence/container.py's on-demand g++ build.
    Returns None (and remembers the failure) when g++ or the source is
    unavailable — callers fall back to the numpy pipeline."""
    global _hostops_lib, _hostops_failed
    if _hostops_lib is not None or _hostops_failed:
        return _hostops_lib
    try:
        import ctypes
        import subprocess
        import tempfile

        so_path = _hostops_so_path()
        if not os.path.exists(so_path):
            # build to a temp file and os.replace(): concurrent processes
            # (bench + tests) may race the compile, and a reader must never
            # CDLL a half-written .so
            fd, tmp = tempfile.mkstemp(
                suffix=".so", prefix=".hostops_build_", dir=_NATIVE_DIR
            )
            os.close(fd)
            try:
                subprocess.run(
                    [
                        "g++", "-O3", "-march=native", "-std=c++20",
                        "-fPIC", "-shared", "-o", tmp, _HOSTOPS_SRC,
                    ],
                    check=True,
                    capture_output=True,
                )
                os.replace(tmp, so_path)
            finally:
                if os.path.exists(tmp):
                    os.unlink(tmp)
        lib = ctypes.CDLL(so_path)
        lib.vi_rerank_ids_f32.restype = None
        lib.vi_rerank_ids_f32.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_void_p,
        ]
        _hostops_lib = lib
    except Exception:  # noqa: BLE001 — no g++ / bad toolchain: numpy path
        _hostops_failed = True
    return _hostops_lib


_METRIC_CODE = {Metric.L2: 0, Metric.INNER_PRODUCT: 1, Metric.COSINE: 2}

_F32_EPS = float(np.finfo(np.float32).eps)


def host_rerank_dist_tol(d: int, scale: float = 1.0) -> float:
    """THE native↔numpy host-rerank parity contract (settled round 5).

    The two host backends perform the same f32 arithmetic in different
    reduction orders — hostops.cpp accumulates 16-lane AVX-512 FMA trees
    (hostops.cpp:62-82) while rerank_gathered_host goes through BLAS
    blocked sums — so distances are NOT bit-identical on real-valued data
    (on integer-valued data both are exact and byte-identical, which
    tests/test_hostops_native.py pins). The contract the two backends DO
    hold, asserted by the parity tests:

      1. within each backend, results are ordered by strict (score, id)
         ascending (reference TopK.swift:8-30), missing slots hold
         (+inf, INVALID_ID);
      2. across backends, every returned distance agrees within
         ``host_rerank_dist_tol(d, scale)`` = 8·d·eps_f32·scale, where
         `scale` is the magnitude of the pre-cancellation terms
         (max ‖q‖² + ‖x‖² for L2; O(1) for cosine). This is the standard
         reduction-reordering bound: each of the ~d-term sums carries
         O(d·eps·scale) order-dependent error and L2's dot-trick
         cancellation exposes it absolutely, not relatively;
      3. id sequences agree exactly whenever no two candidate scores of a
         query sit within that bound of each other — true for the seeded
         test corpora, where the tests assert exact id equality.

    The reference's analog (byte-exact Swift-vs-C parity,
    PQEncodeParity_AoS_C_vs_Swift_Tests.swift:33-51) is achievable there
    because both sides accumulate in identical scalar order; a fused SIMD
    kernel cannot match BLAS summation order without giving up the ~7x
    single-core win that justifies it."""
    return 8.0 * d * _F32_EPS * max(float(scale), 1.0)


def native_rerank_available(x: np.ndarray) -> bool:
    """True when rerank_ids_host would accept this corpus array — probed
    ONCE at stream setup so the pipelined serving loop can keep the
    worker-side gather in its fallback plan instead of discovering
    native-unavailability per batch in the consumer thread."""
    if _hostops() is None:
        return False
    return (
        isinstance(x, np.ndarray)
        and x.ndim == 2
        and x.dtype == np.float32
        and x.strides[1] == 4
        and x.strides[0] % 4 == 0
        and x.strides[0] >= x.shape[1] * 4
    )


def rerank_ids_host(
    x: np.ndarray,  # [n, stride] f32 corpus in ORIGINAL row order
    iids: np.ndarray,  # [B, C] i32 original ids (INVALID_ID/-1 = missing)
    q: np.ndarray,  # [B, d] f32, d <= stride
    *,
    k: int,
    metric: Metric,
    n_threads: int = 0,
) -> Tuple[np.ndarray, np.ndarray] | None:
    """FUSED native gather+score+topk for the host-rerank tier (kernel #40
    on the serving host; reference ExactRerank.swift:655 + gatherTile
    :21-64). One streaming pass over the candidate rows — no [B, C, d]
    gather intermediate, no lexsort: ~7x cheaper than the numpy
    gather + rerank_gathered_host pipeline on the single-core bench host
    (69 ms -> ~9 ms per B=64, C=1024, d=96 batch). Same ids and strict
    (score, id) ordering as the numpy path; distances agree within the
    documented reduction-order bound host_rerank_dist_tol(d, scale) —
    see its docstring for the full parity contract.

    Returns None when the native library or the layout preconditions
    (f32 corpus, row-contiguous, i32 ids) aren't met; callers fall back
    to reader.gather_ids + rerank_gathered_host."""
    lib = _hostops()
    if lib is None or metric not in _METRIC_CODE:
        return None
    if k <= 0:  # the native TopK buffer assumes k >= 1
        b = int(np.asarray(iids).shape[0])
        return (
            np.empty((b, 0), dtype=np.float32),
            np.empty((b, 0), dtype=np.int32),
        )
    if x.ndim != 2 or x.dtype != np.float32 or x.strides[1] != 4:
        return None
    if x.strides[0] % 4 != 0 or x.strides[0] < x.shape[1] * 4:
        return None
    iids = np.ascontiguousarray(iids, dtype=np.int32)
    q = np.ascontiguousarray(q, dtype=np.float32)
    b, c = iids.shape
    d = q.shape[1]
    if d > x.shape[1]:
        return None
    if n_threads <= 0:
        n_threads = os.cpu_count() or 1
    out_d = np.empty((b, k), dtype=np.float32)
    out_i = np.empty((b, k), dtype=np.int32)
    import ctypes

    lib.vi_rerank_ids_f32(
        x.ctypes.data if isinstance(x, np.ndarray) else x,
        ctypes.c_int64(x.shape[0]), ctypes.c_int64(d),
        ctypes.c_int64(x.strides[0] // 4),
        iids.ctypes.data, q.ctypes.data,
        ctypes.c_int64(b), ctypes.c_int64(c), ctypes.c_int64(k),
        _METRIC_CODE[metric], ctypes.c_int(n_threads),
        out_d.ctypes.data, out_i.ctypes.data,
    )
    return out_d, out_i


def rerank_gathered_host(
    q: np.ndarray,  # [B, d] f32
    xg: np.ndarray,  # [B, C, d] f32 gathered candidate vectors
    iids: np.ndarray,  # [B, C] i32 internal ids (INVALID_ID dead)
    *,
    k: int,
    metric: Metric,
) -> Tuple[np.ndarray, np.ndarray]:
    """HOST (numpy) exact rerank — same contract as rerank_gathered but the
    arithmetic never leaves the CPU, exactly like the reference's rerank
    stage (ExactRerank.swift:655 runs on host cores beside the gather).

    This is the production shape of the host-memory capacity tier: the
    gathered rows are ALREADY in host RAM, so shipping them to the device
    just to multiply a [B,C,d] block pays PCIe both ways for ~25 MFLOP of
    work (B=64, C=1024, d=96). Round 3 measured that round-trip at 25
    MB/batch — the whole e2e gap between 67 QPS and the 5.6k QPS device
    candidate stage. Host rerank sends NOTHING back to the device: only
    candidate row indices come down (B·C·8 bytes), results stay on host.
    Missing candidates keep (+inf, INVALID_ID) and sort last; ties break
    strictly by (score, id) — the TopK.swift:8-30 contract."""
    q = np.asarray(q, np.float32)
    b, c, d = xg.shape
    if q.shape[1] != d:  # lane-padded gather source
        q = np.pad(q, ((0, 0), (0, d - q.shape[1])))
    # negative ids (the -1 dead-slot sentinel) are missing exactly like
    # INVALID_ID — the native kernel drops id<0 (hostops.cpp:171) and the
    # two paths must agree for the same input
    missing = (iids == INVALID_ID) | (iids < 0)
    # batched BLAS gemv beats np.einsum's nditer loop ~4x at serving shapes
    # ([64, 1024, 96]); the host tier's rerank arithmetic runs beside the
    # gather on the same cores (reference ExactRerank.swift:655)
    g = np.matmul(xg, q[:, :, None])[:, :, 0]
    if metric == Metric.L2:
        qn = np.einsum("bd,bd->b", q, q, dtype=np.float32)
        sg = np.einsum("bcd,bcd->bc", xg, xg, dtype=np.float32)
        ex = np.maximum(qn[:, None] + sg - 2.0 * g, 0.0)
    elif metric == Metric.INNER_PRODUCT:
        ex = -g
    else:  # COSINE
        qn = np.sqrt(np.maximum(np.einsum("bd,bd->b", q, q), 1e-30))
        xn = np.sqrt(np.maximum(np.einsum("bcd,bcd->bc", xg, xg), 1e-30))
        ex = 1.0 - g / (qn[:, None] * xn)
    ex = np.where(missing, np.float32(np.inf), ex).astype(np.float32)
    ii = np.where(missing, INVALID_ID, iids)
    kk = min(k, c)
    # strict (score, id): lexsort's primary key is the LAST array
    order = np.lexsort((ii, ex), axis=1)[:, :kk]
    sd = np.take_along_axis(ex, order, axis=1)
    si = np.take_along_axis(ii, order, axis=1)
    si = np.where(np.isfinite(sd), si, INVALID_ID)
    if kk < k:
        sd = np.concatenate(
            [sd, np.full((b, k - kk), np.inf, np.float32)], axis=1
        )
        si = np.concatenate(
            [si, np.full((b, k - kk), INVALID_ID, si.dtype)], axis=1
        )
    return sd, si


@partial(jax.jit, static_argnames=("k", "metric"))
def rerank_gathered(
    q: Array,  # [B, d] f32
    xg: Array,  # [B, C, d] f32 gathered candidate vectors
    cand_dist: Array,  # [B, C] f32 approximate dists (+inf dead)
    iids: Array,  # [B, C] i32 internal ids (INVALID_ID dead)
    *,
    k: int,
    metric: Metric,
) -> Tuple[Array, Array]:
    """f32-HIGHEST exact scores for the gathered candidates + strict
    (score, id) top-k (#40 rerank contract). Dead candidates keep
    (+inf, INVALID_ID) and sort last."""
    b, c, d = xg.shape
    q = q.astype(jnp.float32)
    if q.shape[1] != d:  # lane-padded gather source: zero q columns are
        # metric-neutral
        q = jnp.pad(q, ((0, 0), (0, d - q.shape[1])))
    missing = ~jnp.isfinite(cand_dist)
    g = jnp.einsum(
        "bd,bcd->bc", q, xg,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    if metric == Metric.L2:
        qn = jnp.sum(jnp.square(q), axis=-1)
        sg = jnp.einsum(
            "bcd,bcd->bc", xg, xg,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        ex = jnp.maximum(qn[:, None] + sg - 2.0 * g, 0.0)
    elif metric == Metric.INNER_PRODUCT:
        ex = -g
    else:  # COSINE
        qn = jnp.sqrt(jnp.maximum(jnp.sum(jnp.square(q), axis=-1), 1e-30))
        xn = jnp.sqrt(jnp.maximum(jnp.einsum("bcd,bcd->bc", xg, xg), 1e-30))
        ex = 1.0 - g / (qn[:, None] * xn)
    ex = jnp.where(missing, INVALID_DIST, ex)
    ii = jnp.where(missing, INVALID_ID, iids)
    kk = min(k, c)
    sd, si = topk(ex, kk, ids=ii, strict_ties=True)
    if kk < k:
        sd = jnp.concatenate(
            [sd, jnp.full((b, k - kk), INVALID_DIST, sd.dtype)], axis=1
        )
        si = jnp.concatenate(
            [si, jnp.full((b, k - kk), INVALID_ID, si.dtype)], axis=1
        )
    return sd, si
