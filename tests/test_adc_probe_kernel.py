"""Pallas IVF-PQ ADC probe kernel (kernels/adc_probe.py): interpret-mode
parity vs the XLA vmapped-gather path (ops/ivf_pq.ivf_search_pq), the LUT
decomposition identity, packed-u4, and the fused exact rerank."""

import numpy as np
import jax.numpy as jnp
import pytest

from vectorindex_tpu.kernels.adc_probe import ivf_search_pq_pallas
from vectorindex_tpu.ops import pq as pq_ops
from vectorindex_tpu.ops import rng as vrng
from vectorindex_tpu.ops.dtypes import pack_u4
from vectorindex_tpu.ops.ivf import IVFListStore, probe_cap_for
from vectorindex_tpu.ops.ivf_pq import ivf_search_pq
from vectorindex_tpu.utils.config import Metric


@pytest.fixture(scope="module")
def fixture():
    rng = np.random.default_rng(0)
    n, d, kc, m, ks = 900, 16, 8, 4, 16
    cent = rng.standard_normal((kc, d)).astype(np.float32)
    assign = rng.integers(0, kc, n)
    x = (cent[assign] + 0.25 * rng.standard_normal((n, d))).astype(np.float32)
    store = IVFListStore(kc, d)
    store.append_batch(assign, np.arange(n), x)
    arrays = store.sync_device()
    starts = np.asarray(arrays.starts)
    lengths = np.asarray(arrays.lengths)
    n_pad = arrays.vecs.shape[0]
    row_list = np.zeros(n_pad, dtype=np.int32)
    for l in range(kc):
        row_list[starts[l] : starts[l] + lengths[l]] = l
    books = pq_ops.pq_train_residual(
        vrng.make_key(0, 1), jnp.asarray(x), jnp.asarray(cent),
        jnp.asarray(assign.astype(np.int32)), m=m, ks=ks, iters=8,
    )
    codes = pq_ops.pq_encode_residual(
        arrays.vecs.astype(jnp.float32), jnp.asarray(cent),
        jnp.asarray(row_list), books, chunk=256,
    )
    tcorr = pq_ops.pq_row_corrections(
        codes, jnp.asarray(row_list), jnp.asarray(cent), books, chunk=256
    )
    q = jnp.asarray(rng.standard_normal((5, d)).astype(np.float32))
    cap = probe_cap_for(store.max_length)
    return dict(
        cent=jnp.asarray(cent), x=x, arrays=arrays, books=books,
        codes=codes, tcorr=tcorr, q=q, cap=cap, kc=kc,
    )


@pytest.mark.parametrize("metric", [Metric.L2, Metric.INNER_PRODUCT])
def test_parity_vs_xla_adc(fixture, metric):
    f = fixture
    tc = f["tcorr"] if metric == Metric.L2 else jnp.zeros_like(f["tcorr"])
    d1, i1 = ivf_search_pq(
        f["q"], f["cent"], f["arrays"], f["codes"], f["books"],
        nprobe=f["kc"], probe_cap=f["cap"], k=10, metric=metric,
    )
    d2, i2 = ivf_search_pq_pallas(
        f["q"], f["cent"], f["arrays"], f["codes"], tc, f["books"],
        nprobe=f["kc"], probe_cap=f["cap"], k=10, metric=metric,
        interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(
        np.asarray(d1), np.asarray(d2), atol=1e-3, rtol=1e-3
    )


def test_parity_packed_u4(fixture):
    f = fixture
    packed = pack_u4(f["codes"])
    d1, i1 = ivf_search_pq(
        f["q"], f["cent"], f["arrays"], packed, f["books"],
        nprobe=f["kc"], probe_cap=f["cap"], k=10, packed_u4=True,
    )
    d2, i2 = ivf_search_pq_pallas(
        f["q"], f["cent"], f["arrays"], packed, f["tcorr"], f["books"],
        nprobe=f["kc"], probe_cap=f["cap"], k=10, packed_u4=True,
        interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(
        np.asarray(d1), np.asarray(d2), atol=1e-3, rtol=1e-3
    )


def test_fused_rerank_self_recall(fixture):
    f = fixture
    qs = jnp.asarray(f["x"][:5])
    _, ids = ivf_search_pq_pallas(
        qs, f["cent"], f["arrays"], f["codes"], f["tcorr"], f["books"],
        nprobe=f["kc"], probe_cap=f["cap"], k=3, rerank_c=32, interpret=True,
    )
    assert (np.asarray(ids)[:, 0] == np.arange(5)).all()


def test_decomposition_identity(fixture):
    """base + Σ qlut + t_row must equal the fused residual-LUT ADC value."""
    f = fixture
    books, cent = f["books"], f["cent"]
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.standard_normal((3, 16)).astype(np.float32))
    lists = jnp.asarray(rng.integers(0, f["kc"], (3, 2)).astype(np.int32))
    lut_full = pq_ops.pq_lut_residual_l2(q, cent, lists, books)  # [3,2,m,ks]
    codes = jnp.asarray(rng.integers(0, books.ks, (3, 2, books.m)).astype(np.int32))
    fused = jnp.sum(
        jnp.take_along_axis(lut_full, codes[..., None], axis=3)[..., 0], -1
    )
    qlut = pq_ops.pq_lut_q_l2(q, books)
    qsum = jnp.sum(
        jnp.take_along_axis(
            jnp.broadcast_to(qlut[:, None], lut_full.shape), codes[..., None], 3
        )[..., 0],
        -1,
    )
    from vectorindex_tpu.ops.scoring import distance_block

    base = jnp.take_along_axis(distance_block(q, cent, Metric.L2), lists, 1)
    # t for these synthetic codes: 2<c_l,j, C_j[k]> + ||C_j[k]||^2
    cd = jnp.einsum(
        "lmd,mkd->lmk",
        cent.reshape(f["kc"], books.m, books.dsub),
        books.centroids,
    )
    table = 2.0 * cd + books.sqnorms[None]
    tval = jnp.sum(
        jnp.take_along_axis(table[lists], codes[..., None], 3)[..., 0], -1
    )
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(base + qsum + tval), atol=1e-3, rtol=1e-4
    )


def test_hostrerank_matches_device_rerank(fixture):
    """The host-memory rerank tier (VectorReader seam) must return the same
    (dist, id) results as the device-resident rerank path on identical
    state — codes-only arrays (vecs=None) prove nothing touches HBM vecs."""
    from vectorindex_tpu.kernels.adc_probe import ivf_search_pq_hostrerank
    from vectorindex_tpu.ops.ivf import IVFListArrays
    from vectorindex_tpu.ops.rerank import ArrayReader, CallbackReader, CSRReader

    f = fixture
    k = 10
    d1, i1 = ivf_search_pq_pallas(
        f["q"], f["cent"], f["arrays"], f["codes"], f["tcorr"], f["books"],
        nprobe=f["kc"], probe_cap=f["cap"], k=k, rerank_c=128, interpret=True,
    )
    meta_only = IVFListArrays(
        vecs=None, row_ids=f["arrays"].row_ids, sqnorms=None,
        starts=f["arrays"].starts, lengths=f["arrays"].lengths,
    )
    readers = [
        ArrayReader(np.asarray(f["arrays"].vecs, dtype=np.float32)),
        CSRReader(f["x"], np.asarray(f["arrays"].row_ids)),
        CallbackReader(
            lambda rows: np.asarray(f["arrays"].vecs)[rows].astype(np.float32)
        ),
    ]
    for reader in readers:
        d2, i2 = ivf_search_pq_hostrerank(
            f["q"], f["cent"], meta_only, f["codes"], f["tcorr"], f["books"],
            reader, nprobe=f["kc"], probe_cap=f["cap"], k=k, rerank_c=128,
            interpret=True,
        )
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
        np.testing.assert_allclose(
            np.asarray(d1), np.asarray(d2), atol=1e-4, rtol=1e-4
        )


def test_hostrerank_pack_without_vecs():
    """pack_ivf(with_vecs=False) + CSRReader: full host-tier flow on a
    synthetic corpus, recall vs brute force."""
    from vectorindex_tpu.bench.synth import (
        exact_truth, pack_ivf, pq_csr_state, recall_at_k, trained_quantizer,
    )
    from vectorindex_tpu.kernels.adc_probe import ivf_search_pq_hostrerank
    from vectorindex_tpu.ops.rerank import CSRReader

    rng = np.random.default_rng(2)
    n, d, nlist, b, k = 4000, 32, 8, 4, 10
    x = rng.standard_normal((n, d)).astype(np.float32) * 0.1
    x[:, :4] += rng.standard_normal((n, 4)) * 2  # low-dim structure
    centers, assign = trained_quantizer(
        x, nlist, seed=0, train_sample=2000, iters=6
    )
    arrays, order, cap = pack_ivf(x, assign, nlist, with_vecs=False)
    assert arrays.vecs is None and arrays.sqnorms is None
    books, codes, tcorr = pq_csr_state(
        x, assign, centers, arrays, order, m=8, ks=16, iters=6
    )
    q = x[:b] + 0.01 * rng.standard_normal((b, d)).astype(np.float32)
    sd, si = ivf_search_pq_hostrerank(
        q, jnp.asarray(centers), arrays, codes, tcorr, books,
        CSRReader(x, np.asarray(arrays.row_ids)),
        nprobe=nlist, probe_cap=cap, k=k, rerank_c=256, interpret=True,
    )
    truth = exact_truth(q, x, k)
    assert recall_at_k(np.asarray(si), truth) >= 0.9
    assert (np.asarray(si)[:, 0] == np.arange(b)).all()


def test_rankseg_matches_pair_grid(fixture):
    """adc_probe_scores routes serving batches (B<=16) through the
    rank-segment grid; a B>16 batch keeps the per-(query,probe) grid. Both
    must produce identical partial-distance fields for the same queries."""
    from vectorindex_tpu.kernels.adc_probe import adc_probe_scores

    f = fixture
    rng = np.random.default_rng(3)
    b = 6
    q = rng.standard_normal((18, f["q"].shape[1])).astype(np.float32)
    q[b:] = np.repeat(q[:b][:1], 12, axis=0)  # tail is padding content
    lut = pq_ops.pq_lut_q_l2(jnp.asarray(q), f["books"])
    from vectorindex_tpu.ops.ivf import ivf_select

    sel_d, pls = ivf_select(
        jnp.asarray(q), f["cent"], nprobe=f["kc"], metric=Metric.L2
    )
    arrays = f["arrays"]
    sr = arrays.starts[pls]
    lr = arrays.lengths[pls]
    m, ks = f["books"].centroids.shape[:2]
    big = adc_probe_scores(
        lut, sr, lr, f["codes"], f["tcorr"],
        nprobe=f["kc"], probe_cap=f["cap"], m=m, ks=ks,
        interpret=True,
    )  # b=18 > 16: pair grid
    small = adc_probe_scores(
        lut[:b], sr[:b], lr[:b], f["codes"], f["tcorr"],
        nprobe=f["kc"], probe_cap=f["cap"], m=m, ks=ks,
        interpret=True,
    )  # b=6: rank-segment grid
    np.testing.assert_allclose(
        np.asarray(small), np.asarray(big)[:b], atol=1e-3, rtol=1e-4
    )
