"""PQ stack: train/encode/decode round-trips, LUT correctness vs oracle,
ADC strategies parity, residual paths, u4 packing (reference PQTrainTests,
PQEncodeParity tests, ADCScan tests — SURVEY.md §4 tiers 1-2)."""

import jax.numpy as jnp
import numpy as np
import pytest

from vectorindex_tpu.ops import kmeans as km
from vectorindex_tpu.ops import pq
from vectorindex_tpu.ops import rng as vrng


def _data(n=2000, d=32, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))


@pytest.fixture(scope="module")
def trained():
    x = _data()
    books = pq.pq_train(vrng.make_key(0), x, m=4, ks=16, iters=8)
    return x, books


def test_train_shapes(trained):
    x, books = trained
    assert books.centroids.shape == (4, 16, 8)
    assert books.sqnorms.shape == (4, 16)
    np.testing.assert_allclose(
        np.asarray(books.sqnorms),
        (np.asarray(books.centroids) ** 2).sum(-1),
        rtol=1e-5,
    )


def test_encode_matches_bruteforce(trained):
    x, books = trained
    codes = np.asarray(pq.pq_encode(x, books, chunk=512))
    assert codes.shape == (2000, 4) and codes.dtype == np.uint8
    # oracle: per-subspace nearest centroid
    xt = np.asarray(x).reshape(2000, 4, 8)
    cents = np.asarray(books.centroids)
    d2 = ((xt[:, :, None, :] - cents[None]) ** 2).sum(-1)  # [n, m, ks]
    ref = d2.argmin(-1)
    np.testing.assert_array_equal(codes, ref)


def test_encode_decode_reduces_error(trained):
    x, books = trained
    codes = pq.pq_encode(x, books)
    recon = np.asarray(pq.pq_decode(codes, books))
    err = ((recon - np.asarray(x)) ** 2).sum(-1).mean()
    base = (np.asarray(x) ** 2).sum(-1).mean()
    assert err < base * 0.9  # quantization must capture signal


def test_lut_l2_oracle(trained):
    x, books = trained
    q = _data(5, 32, seed=3)
    lut = np.asarray(pq.pq_lut_l2(q, books))
    qt = np.asarray(q).reshape(5, 4, 8)
    cents = np.asarray(books.centroids)
    ref = ((qt[:, :, None, :] - cents[None]) ** 2).sum(-1)
    np.testing.assert_allclose(lut, ref, rtol=1e-4, atol=1e-4)


def test_adc_matches_decoded_distances(trained):
    """ADC distance == exact distance to the *decoded* vector (the defining
    property of ADC)."""
    x, books = trained
    q = _data(3, 32, seed=4)
    codes = pq.pq_encode(x, books)
    lut = pq.pq_lut_l2(q, books)
    adc = np.asarray(pq.adc_scan(codes, lut, strategy="gather", chunk=512))
    recon = np.asarray(pq.pq_decode(codes, books))
    ref = ((np.asarray(q)[:, None, :] - recon[None]) ** 2).sum(-1)
    np.testing.assert_allclose(adc, ref, rtol=1e-3, atol=1e-3)


def test_adc_strategies_agree(trained):
    x, books = trained
    q = _data(4, 32, seed=5)
    codes = pq.pq_encode(x, books)
    lut = pq.pq_lut_l2(q, books)
    g = np.asarray(pq.adc_scan(codes, lut, strategy="gather", chunk=256))
    o = np.asarray(pq.adc_scan(codes, lut, strategy="onehot", chunk=256))
    # onehot accumulates in bf16·f32 — tolerance accordingly
    np.testing.assert_allclose(g, o, rtol=2e-2, atol=2e-2)


def test_adc_candidate_recall_vs_exact():
    """Candidate recall: the exact top-10 must mostly appear in the ADC
    top-100 — the property PQ actually needs (ADC generates candidates,
    exact rerank finishes; reference IVFPostADC.rerankTopKFlat)."""
    rng = np.random.default_rng(42)
    x = jnp.asarray(rng.standard_normal((2000, 32)).astype(np.float32))
    books = pq.pq_train(vrng.make_key(42), x, m=8, ks=16, iters=8)
    q = x[:8]
    codes = pq.pq_encode(x, books)
    lut = pq.pq_lut_l2(q, books)
    adc = np.asarray(pq.adc_scan(codes, lut, strategy="gather", chunk=512))
    xn = np.asarray(x)
    exact = ((np.asarray(q)[:, None, :] - xn[None]) ** 2).sum(-1)
    r_adc = np.argsort(adc, 1)[:, :100]
    r_ex = np.argsort(exact, 1)[:, :10]
    recall = np.mean(
        [len(set(r_adc[i]) & set(r_ex[i])) / 10 for i in range(8)]
    )
    assert recall >= 0.7


def test_u4_encode_scan(trained):
    x, books = trained  # ks=16 → u4-compatible
    packed = pq.pq_encode_u4(x, books)
    assert packed.shape == (2000, 2)  # m=4 nibbles → 2 bytes
    q = _data(2, 32, seed=6)
    lut = pq.pq_lut_l2(q, books)
    a1 = np.asarray(pq.adc_scan_u4(packed, lut, strategy="gather", chunk=512))
    codes = pq.pq_encode(x, books)
    a2 = np.asarray(pq.adc_scan(codes, lut, strategy="gather", chunk=512))
    np.testing.assert_allclose(a1, a2, rtol=1e-6)


def test_residual_roundtrip():
    x = _data(500, 16, seed=7)
    res = km.kmeans(x, km.KMeansConfig(k=8, iters=10, seed=7))
    r = pq.residuals(x, res.centroids, res.assignments)
    np.testing.assert_allclose(
        np.asarray(r),
        np.asarray(x) - np.asarray(res.centroids)[np.asarray(res.assignments)],
        rtol=1e-6,
    )
    books = pq.pq_train_residual(
        vrng.make_key(7), x, res.centroids, res.assignments, m=4, ks=16, iters=6
    )
    codes = pq.pq_encode_residual(x, res.centroids, res.assignments, books)
    recon = np.asarray(pq.pq_decode(codes, books)) + np.asarray(res.centroids)[
        np.asarray(res.assignments)
    ]
    err = ((recon - np.asarray(x)) ** 2).sum(-1).mean()
    direct_books = pq.pq_train(vrng.make_key(7), x, m=4, ks=16, iters=6)
    direct_codes = pq.pq_encode(x, direct_books)
    direct_err = (
        (np.asarray(pq.pq_decode(direct_codes, direct_books)) - np.asarray(x)) ** 2
    ).sum(-1).mean()
    # residual coding should beat direct coding on clustered data
    assert err < direct_err * 1.2


def test_residual_lut(trained):
    x, books = trained
    q = _data(3, 32, seed=8)
    cents = _data(6, 32, seed=9)
    lists = jnp.asarray([[0, 2], [1, 3], [4, 5]], dtype=jnp.int32)
    lut = np.asarray(pq.pq_lut_residual_l2(q, cents, lists, books))
    assert lut.shape == (3, 2, 4, 16)
    # oracle: LUT of (q - c_list)
    for b in range(3):
        for p in range(2):
            rq = (np.asarray(q)[b] - np.asarray(cents)[int(lists[b, p])]).reshape(4, 8)
            ref = ((rq[:, None, :] - np.asarray(books.centroids)) ** 2).sum(-1)
            np.testing.assert_allclose(lut[b, p], ref, rtol=1e-3, atol=1e-3)


def test_train_determinism():
    x = _data(500, 16, seed=10)
    b1 = pq.pq_train(vrng.make_key(1), x, m=2, ks=8, iters=5)
    b2 = pq.pq_train(vrng.make_key(1), x, m=2, ks=8, iters=5)
    np.testing.assert_array_equal(np.asarray(b1.centroids), np.asarray(b2.centroids))
