"""Native host-ops (persistence/native/hostops.cpp) vs the numpy oracle.

The host-memory rerank tier's exact rerank runs on the serving host
(reference ExactRerank.swift:655); hostops.cpp fuses gather+score+topk
into one streaming pass. These tests pin its contract to the numpy
pipeline (reader.gather_ids + rerank_gathered_host): same ids, same
strict (score, id) ties, same missing-id sentinels. On integer-valued
vectors the f32 arithmetic is exact, so results must be byte-identical;
on real-valued data the two backends reduce in different orders
(AVX-512 FMA trees vs BLAS blocked sums) and distances must agree within
the documented bound host_rerank_dist_tol (ops/rerank.py — the settled
round-5 parity contract).
"""

import numpy as np
import pytest

from vectorindex_tpu.ops.rerank import (
    CSRReader,
    host_rerank_dist_tol,
    rerank_gathered_host,
    rerank_ids_host,
)
from vectorindex_tpu.ops.topk import INVALID_ID
from vectorindex_tpu.utils.config import Metric

pytestmark = pytest.mark.skipif(
    rerank_ids_host(
        np.zeros((4, 8), np.float32),
        np.zeros((1, 2), np.int32),
        np.zeros((1, 8), np.float32),
        k=1,
        metric=Metric.L2,
    )
    is None,
    reason="native hostops unavailable (no g++?)",
)


def _mk(n=5000, d=24, b=7, c=129, seed=3):
    rng = np.random.default_rng(seed)
    x = rng.integers(-8, 8, (n, d)).astype(np.float32)
    q = rng.integers(-8, 8, (b, d)).astype(np.float32)
    ids = rng.integers(0, n, (b, c)).astype(np.int32)
    return x, q, ids


def _oracle(x, ids, q, k, metric):
    xg = x[np.clip(ids, 0, x.shape[0] - 1)]
    masked = np.where((ids < 0) | (ids >= x.shape[0]), INVALID_ID, ids)
    return rerank_gathered_host(q, xg, masked, k=k, metric=metric)


@pytest.mark.parametrize(
    "metric", [Metric.L2, Metric.INNER_PRODUCT, Metric.COSINE]
)
def test_parity_exact(metric):
    x, q, ids = _mk()
    nd, ni = rerank_ids_host(x, ids, q, k=10, metric=metric)
    rd, ri = _oracle(x, ids, q, 10, metric)
    np.testing.assert_array_equal(ni, ri)
    np.testing.assert_allclose(nd, rd, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize(
    "metric", [Metric.L2, Metric.INNER_PRODUCT, Metric.COSINE]
)
def test_parity_real_valued_within_contract(metric):
    # real-valued data: reduction orders differ, so the contract is exact
    # ids + distances within host_rerank_dist_tol(d, scale)
    rng = np.random.default_rng(11)
    n, d, b, c = 4000, 96, 9, 257
    x = rng.standard_normal((n, d)).astype(np.float32)
    q = rng.standard_normal((b, d)).astype(np.float32)
    ids = rng.integers(0, n, (b, c)).astype(np.int32)
    nd, ni = rerank_ids_host(x, ids, q, k=10, metric=metric)
    rd, ri = _oracle(x, ids, q, 10, metric)
    np.testing.assert_array_equal(ni, ri)
    scale = (
        1.0
        if metric == Metric.COSINE
        else 2.0 * float(np.square(x).sum(axis=1).max())
    )
    np.testing.assert_allclose(
        nd, rd, rtol=0, atol=host_rerank_dist_tol(d, scale)
    )


def test_k_zero_returns_empty():
    # ADVICE r4: k=0 must not reach the native TopK (s[len-1] OOB read)
    x, q, ids = _mk()
    nd, ni = rerank_ids_host(x, ids, q, k=0, metric=Metric.L2)
    assert nd.shape == (q.shape[0], 0) and ni.shape == (q.shape[0], 0)


def test_negative_id_matches_native_in_fallback():
    # ADVICE r4: the numpy fallback must treat -1 as missing exactly like
    # the native kernel (which drops id<0), not gather row 0 under id -1
    x, q, ids = _mk()
    ids[:, 3] = -1
    nd, ni = rerank_ids_host(x, ids, q, k=10, metric=Metric.L2)
    xg = x[np.clip(ids, 0, x.shape[0] - 1)]
    rd, ri = rerank_gathered_host(q, xg, ids, k=10, metric=Metric.L2)
    np.testing.assert_array_equal(ni, ri)
    assert not np.any(ri == -1)


def test_missing_and_dead_ids():
    x, q, ids = _mk()
    ids[0, :] = INVALID_ID  # whole query missing
    ids[1, ::2] = INVALID_ID
    ids[2, 5] = -1  # dead-slot sentinel is missing too
    nd, ni = rerank_ids_host(x, ids, q, k=10, metric=Metric.L2)
    assert np.all(ni[0] == INVALID_ID) and np.all(np.isinf(nd[0]))
    rd, ri = _oracle(x, ids, q, 10, Metric.L2)
    np.testing.assert_array_equal(ni, ri)


def test_strict_score_id_ties():
    # duplicate rows force exact score ties: order must be ascending id
    rng = np.random.default_rng(0)
    x = np.tile(rng.integers(-4, 4, (8, 16)).astype(np.float32), (16, 1))
    ids = np.arange(128, dtype=np.int32)[None, :].copy()
    q = rng.integers(-4, 4, (1, 16)).astype(np.float32)
    nd, ni = rerank_ids_host(x, ids, q, k=16, metric=Metric.L2)
    for s in np.unique(nd[0]):
        grp = ni[0][nd[0] == s]
        assert np.all(np.diff(grp) > 0)
    rd, ri = _oracle(x, ids, q, 16, Metric.L2)
    np.testing.assert_array_equal(ni, ri)


def test_k_exceeds_candidates():
    x, q, ids = _mk(c=6)
    nd, ni = rerank_ids_host(x, ids, q, k=10, metric=Metric.L2)
    assert nd.shape == (q.shape[0], 10)
    assert np.all(ni[:, 6:] == INVALID_ID)
    rd, ri = _oracle(x, ids, q, 10, Metric.L2)
    np.testing.assert_array_equal(ni, ri)


def test_threads_match_single():
    x, q, ids = _mk(b=32, c=257)
    d1, i1 = rerank_ids_host(x, ids, q, k=10, metric=Metric.L2, n_threads=1)
    d4, i4 = rerank_ids_host(x, ids, q, k=10, metric=Metric.L2, n_threads=4)
    np.testing.assert_array_equal(i1, i4)
    np.testing.assert_array_equal(d1, d4)


def test_lane_padded_source():
    # corpus rows wider than the logical dim (stride > d): pad columns
    # must not enter the scores
    x, q, ids = _mk(d=24)
    xp = np.concatenate(
        [x, np.full((x.shape[0], 8), 99.0, np.float32)], axis=1
    )
    nd, ni = rerank_ids_host(xp, ids, q, k=10, metric=Metric.L2)
    rd, ri = _oracle(x, ids, q, 10, Metric.L2)
    np.testing.assert_array_equal(ni, ri)
    np.testing.assert_allclose(nd, rd, rtol=1e-6, atol=1e-6)


def test_fallback_preconditions():
    x, q, ids = _mk()
    # f64 corpus → native declines, caller falls back
    assert (
        rerank_ids_host(x.astype(np.float64), ids, q, k=5, metric=Metric.L2)
        is None
    )
    # non-row-contiguous view → declines
    assert (
        rerank_ids_host(x[:, ::2], ids, q[:, ::2].copy(), k=5, metric=Metric.L2)
        is None
    )


def test_csrreader_vecs_is_the_native_source():
    # the host tier gates the native path on reader.vecs + gather_ids:
    # CSRReader.vecs is id-indexed exactly like gather_ids
    x, q, ids = _mk()
    reader = CSRReader(x, np.arange(x.shape[0], dtype=np.int32))
    g = reader.gather_ids(ids.reshape(-1)).reshape(ids.shape + (x.shape[1],))
    nd, ni = rerank_ids_host(reader.vecs, ids, q, k=10, metric=Metric.L2)
    rd, ri = rerank_gathered_host(q, g, ids, k=10, metric=Metric.L2)
    np.testing.assert_array_equal(ni, ri)
