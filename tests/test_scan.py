"""Verified two-phase scan: exactness of results + verification flag
behavior (ops/scan.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from vectorindex_tpu.ops.scan import scan_topk_strict, scan_topk_verified
from vectorindex_tpu.utils.config import Metric


def _data(n=5000, d=32, b=8, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((n, d)).astype(np.float32)
    q = rng.standard_normal((b, d)).astype(np.float32)
    return jnp.asarray(q), jnp.asarray(x)


@pytest.mark.parametrize("metric", [Metric.L2, Metric.INNER_PRODUCT, Metric.COSINE])
def test_verified_matches_strict(metric):
    q, x = _data()
    valid = jnp.ones((x.shape[0],), bool)
    vd, vi, exact = scan_topk_verified(q, x, None, None, valid, metric=metric, k=10)
    sd, si = scan_topk_strict(q, x, None, None, valid, metric=metric, k=10)
    assert bool(np.asarray(exact).all())
    np.testing.assert_array_equal(np.asarray(vi), np.asarray(si))
    np.testing.assert_allclose(np.asarray(vd), np.asarray(sd), rtol=1e-6)


def test_verified_with_mask():
    q, x = _data(n=1000)
    valid = jnp.asarray(np.arange(1000) % 3 != 0)
    vd, vi, exact = scan_topk_verified(q, x, None, None, valid, metric=Metric.L2, k=5)
    assert bool(np.asarray(exact).all())
    assert not np.any(np.asarray(vi) % 3 == 0)


def test_verified_fewer_valid_than_k():
    q, x = _data(n=300)
    valid = jnp.asarray(np.arange(300) < 4)  # only 4 valid rows
    vd, vi, exact = scan_topk_verified(q, x, None, None, valid, metric=Metric.L2, k=10)
    assert bool(np.asarray(exact).all())
    vi = np.asarray(vi)
    assert set(vi[0, :4].tolist()) == {0, 1, 2, 3}
    assert np.all(np.isinf(np.asarray(vd)[:, 4:]))


def test_large_k_candidate_clamp():
    q, x = _data(n=200)
    valid = jnp.ones((200,), bool)
    vd, vi, exact = scan_topk_verified(q, x, None, None, valid, metric=Metric.L2, k=150)
    sd, si = scan_topk_strict(q, x, None, None, valid, metric=Metric.L2, k=150)
    assert bool(np.asarray(exact).all())
    np.testing.assert_array_equal(np.asarray(vi), np.asarray(si))
