"""Support kernels: range query (#07), MIPS transform (#10), dedup (#32),
reservoir (#39) — oracle tests per SURVEY.md §4 tier 1."""

import jax.numpy as jnp
import numpy as np
import pytest

from vectorindex_tpu.ops import dedup, mips, range_query, reservoir
from vectorindex_tpu.ops.topk import INVALID_DIST, INVALID_ID
from vectorindex_tpu.utils.config import Metric


def _data(n=200, d=16, b=4, seed=0):
    rng = np.random.default_rng(seed)
    return (
        rng.standard_normal((b, d)).astype(np.float32),
        rng.standard_normal((n, d)).astype(np.float32),
    )


# -- range query --


def test_range_mask_l2_oracle():
    q, x = _data()
    r = 4.5
    mask = np.asarray(range_query.range_mask(jnp.asarray(q), jnp.asarray(x), r))
    ref = np.linalg.norm(q[:, None] - x[None], axis=-1) <= r
    np.testing.assert_array_equal(mask, ref)


def test_range_mask_similarity_thresholds():
    q, x = _data()
    for metric, score in [
        (Metric.INNER_PRODUCT, q @ x.T),
        (
            Metric.COSINE,
            (q / np.linalg.norm(q, axis=1, keepdims=True))
            @ (x / np.linalg.norm(x, axis=1, keepdims=True)).T,
        ),
    ]:
        tau = 0.2
        mask = np.asarray(
            range_query.range_mask(jnp.asarray(q), jnp.asarray(x), tau, metric=metric)
        )
        np.testing.assert_array_equal(mask, score >= tau - 1e-6)


def test_range_count_and_scan_agree():
    q, x = _data()
    r = 5.0
    counts = np.asarray(range_query.range_count(jnp.asarray(q), jnp.asarray(x), r))
    res = range_query.range_scan(jnp.asarray(q), jnp.asarray(x), r, max_results=300)
    np.testing.assert_array_equal(counts, np.asarray(res.counts))
    ids = np.asarray(res.ids)
    for b in range(q.shape[0]):
        got = set(ids[b][ids[b] != INVALID_ID].tolist())
        ref = set(np.nonzero(np.linalg.norm(x - q[b], axis=1) <= r)[0].tolist())
        assert got == ref


def test_range_scan_nearest_first_and_overflow():
    q, x = _data(b=1)
    r = 100.0  # everything matches
    res = range_query.range_scan(jnp.asarray(q), jnp.asarray(x), r, max_results=10)
    d = np.asarray(res.dists)[0]
    assert (np.diff(d) >= 0).all()
    assert int(res.counts[0]) == 200  # true count exceeds buffer
    ref = np.sort(np.linalg.norm(x - q[0], axis=1) ** 2)[:10]
    np.testing.assert_allclose(d, ref, rtol=1e-4, atol=1e-4)


def test_range_scan_adc():
    from vectorindex_tpu.ops import pq as pq_ops
    from vectorindex_tpu.ops import rng as vrng

    q, x = _data(n=300, d=16, b=2, seed=3)
    books = pq_ops.pq_train(vrng.make_key(0), jnp.asarray(x), m=4, ks=16, iters=6)
    codes = pq_ops.pq_encode(jnp.asarray(x), books)
    lut = pq_ops.pq_lut_l2(jnp.asarray(q), books)
    r = 4.0
    res = range_query.range_scan_adc(codes, lut, r, max_results=300)
    adc = np.asarray(pq_ops.adc_scan(codes, lut, strategy="gather"))
    for b in range(2):
        ref = set(np.nonzero(adc[b] <= r * r)[0].tolist())
        got = np.asarray(res.ids)[b]
        assert set(got[got != INVALID_ID].tolist()) == ref


# -- MIPS transform --


def test_mips_explicit_equals_ip_ordering():
    q, x = _data(n=150, d=24, b=6, seed=4)
    r2 = float((x**2).sum(1).max())
    dim = mips.padded_dim(24)
    xa = np.asarray(mips.mips_materialize_augmentation(jnp.asarray(x), r2, dim))
    qa = np.asarray(mips.mips_augment_query(jnp.asarray(q), dim))
    # augmented norms are all R
    np.testing.assert_allclose((xa**2).sum(1), r2, rtol=1e-4)
    l2 = ((qa[:, None] - xa[None]) ** 2).sum(-1)
    ip = q @ x.T
    for b in range(6):
        np.testing.assert_array_equal(
            np.argsort(l2[b])[:10], np.argsort(-ip[b])[:10]
        )


def test_mips_virtual_matches_explicit():
    q, x = _data(n=100, d=16, b=3, seed=5)
    r2 = float((x**2).sum(1).max())
    dim = mips.padded_dim(16)
    xa = np.asarray(mips.mips_materialize_augmentation(jnp.asarray(x), r2, dim))
    qa = np.asarray(mips.mips_augment_query(jnp.asarray(q), dim))
    explicit = ((qa[:, None] - xa[None]) ** 2).sum(-1)
    virtual = np.asarray(
        mips.mips_hybrid_score_block(jnp.asarray(q), jnp.asarray(x), r2)
    )
    np.testing.assert_allclose(virtual, explicit, rtol=1e-3, atol=1e-3)


def test_mips_r2_staleness():
    p = mips.R2Parameter(r2=1.0)
    p.update(0.5)
    assert not p.stale
    p.update(2.0)
    assert p.stale and p.r2 == 2.0
    p.materialized()
    assert not p.stale


# -- dedup --


def test_visited_bitset_roundtrip():
    bits = dedup.visited_init(2, 100)
    ids = jnp.asarray([[3, 50, 99], [0, 1, 2]], dtype=jnp.int32)
    was, bits = dedup.visited_test_and_mark(bits, ids)
    assert not np.asarray(was).any()
    was2 = dedup.visited_test(bits, ids)
    assert np.asarray(was2).all()
    # other ids still unvisited
    other = dedup.visited_test(bits, jnp.asarray([[4, 51], [3, 98]], dtype=jnp.int32))
    assert not np.asarray(other).any()


def test_visited_dup_within_row_flagged():
    bits = dedup.visited_init(1, 64)
    ids = jnp.asarray([[7, 7, 9]], dtype=jnp.int32)
    was, bits = dedup.visited_test_and_mark(bits, ids)
    np.testing.assert_array_equal(np.asarray(was), [[False, True, False]])


def test_visited_negative_ids_ignored():
    bits = dedup.visited_init(1, 32)
    was, bits2 = dedup.visited_test_and_mark(bits, jnp.asarray([[-1, 5]], dtype=jnp.int32))
    assert np.asarray(was)[0, 0]  # padding reports visited
    np.testing.assert_array_equal(np.asarray(bits2[0, 0]) & 0b1, 0)  # bit 0 untouched


def test_dedup_candidates():
    d = jnp.asarray([[1.0, 3.0, 2.0, 3.0, 0.5]])
    i = jnp.asarray([[10, 20, 10, 30, 40]], dtype=jnp.int32)
    od, oi = dedup.dedup_candidates(d, i)
    oi = np.asarray(oi)[0]
    od = np.asarray(od)[0]
    # unique ids survive ordered by (dist, id); dup (10 @ 2.0 dup'd) removed
    assert oi.tolist()[:4] == [40, 10, 20, 30]
    assert od[4] == np.inf and oi[4] == INVALID_ID


# -- reservoir --


def test_reservoir_accumulates_global_topc():
    rng = np.random.default_rng(6)
    d_all = rng.standard_normal((2, 300)).astype(np.float32)
    res = reservoir.reservoir_init(2, 16)
    for c in range(0, 300, 50):
        blk = jnp.asarray(d_all[:, c : c + 50])
        ids = jnp.asarray(np.arange(c, c + 50, dtype=np.int32))[None].repeat(2, 0)
        res = reservoir.reservoir_push(res, blk, ids)
    got_d, got_i = reservoir.reservoir_extract_topk(res, 16)
    ref = np.sort(d_all, axis=1)[:, :16]
    np.testing.assert_allclose(np.asarray(got_d), ref, rtol=1e-6)
    assert int(reservoir.reservoir_count(res)[0]) == 16
    tau = np.asarray(reservoir.reservoir_tau(res))
    np.testing.assert_allclose(tau, ref[:, -1], rtol=1e-6)


def test_reservoir_masked_push_and_partial_fill():
    res = reservoir.reservoir_init(1, 8)
    d = jnp.asarray([[1.0, 2.0, 3.0]])
    i = jnp.asarray([[10, 11, 12]], dtype=jnp.int32)
    res = reservoir.reservoir_push_masked(
        res, d, i, jnp.asarray([[True, False, True]])
    )
    assert int(reservoir.reservoir_count(res)[0]) == 2
    assert np.isinf(np.asarray(reservoir.reservoir_tau(res))[0])  # not full
    got_d, got_i = reservoir.reservoir_extract_topk(res, 2)
    np.testing.assert_array_equal(np.asarray(got_i), [[10, 12]])


# -- typed overloads --


def test_as_vector_accepts_many_types():
    import array

    from vectorindex_tpu.models.typed import as_matrix, as_vector

    ref = np.asarray([1.0, 2.0, 3.0], dtype=np.float32)
    for v in (
        [1, 2, 3],
        (1.0, 2.0, 3.0),
        np.asarray([1, 2, 3], dtype=np.int64),
        jnp.asarray([1.0, 2.0, 3.0]),
        array.array("f", [1, 2, 3]),
    ):
        np.testing.assert_allclose(as_vector(v, 3), ref)
    import torch

    np.testing.assert_allclose(as_vector(torch.tensor([1.0, 2.0, 3.0]), 3), ref)
    m = as_matrix([[1, 2], [3, 4]], 2)
    assert m.shape == (2, 2) and m.dtype == np.float32


def test_as_vector_rejects_bad():
    from vectorindex_tpu.models.typed import as_vector
    from vectorindex_tpu.utils.errors import IndexError

    with pytest.raises(IndexError):
        as_vector([1, 2, 3], dimension=5)
    with pytest.raises(IndexError):
        as_vector(object())


# -- PQ streaming --


def test_pq_streaming_train():
    from vectorindex_tpu.ops import pq as pq_ops
    from vectorindex_tpu.ops import rng as vrng

    rng_ = np.random.default_rng(9)
    x = rng_.standard_normal((2000, 16)).astype(np.float32)
    state = pq_ops.pq_stream_init(vrng.make_key(0), jnp.asarray(x[:500]), m=4, ks=8)
    for c in range(500, 2000, 500):
        state = pq_ops.pq_stream_update(state, jnp.asarray(x[c : c + 500]))
    books = pq_ops.pq_stream_finalize(state)
    assert books.centroids.shape == (4, 8, 4)
    codes = pq_ops.pq_encode(jnp.asarray(x), books)
    recon = np.asarray(pq_ops.pq_decode(codes, books))
    err = ((recon - x) ** 2).sum(-1).mean()
    base = (x**2).sum(-1).mean()
    assert err < base  # captures signal


def test_range_scan_reservoir_mode():
    from vectorindex_tpu.ops.range_query import range_scan_reservoir
    from vectorindex_tpu.ops.reservoir import reservoir_extract_topk

    q, x = _data(n=500, d=8, b=2, seed=11)
    r = 4.0
    res = range_scan_reservoir(
        jnp.asarray(q), jnp.asarray(x), r, capacity=32, chunk=128
    )
    d, ids = reservoir_extract_topk(res, 32)
    d, ids = np.asarray(d), np.asarray(ids)
    ref_d = ((q[:, None] - x[None]) ** 2).sum(-1)
    for b in range(2):
        in_radius = np.nonzero(ref_d[b] <= r * r)[0]
        want = set(in_radius[np.argsort(ref_d[b][in_radius])][:32].tolist())
        got = set(ids[b][ids[b] != INVALID_ID].tolist())
        assert got == want
