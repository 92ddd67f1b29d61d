"""Scoring kernels vs numpy oracle (reference test tier 1: kernel unit tests
vs scalar reference, e.g. MicrokernelIntegrationTests using L2Sqr.runScalarRef,
SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vectorindex_tpu.ops import scoring
from vectorindex_tpu.utils.config import Metric, ScoreOpts


def _data(b=7, n=33, d=19, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.standard_normal((b, d)).astype(np.float32)
    x = rng.standard_normal((n, d)).astype(np.float32)
    return q, x


def _np_l2sqr(q, x):
    return ((q[:, None, :] - x[None, :, :]) ** 2).sum(-1)


def test_l2sqr_dot_trick_matches_oracle():
    q, x = _data()
    got = np.asarray(scoring.l2sqr_block(jnp.asarray(q), jnp.asarray(x)))
    np.testing.assert_allclose(got, _np_l2sqr(q, x), rtol=1e-4, atol=1e-3)


def test_l2sqr_direct_matches_oracle():
    q, x = _data()
    got = np.asarray(scoring.l2sqr_block_direct(jnp.asarray(q), jnp.asarray(x)))
    np.testing.assert_allclose(got, _np_l2sqr(q, x), rtol=1e-5, atol=1e-5)


def test_l2sqr_with_precomputed_norms():
    q, x = _data(d=128)
    cache = scoring.NormCache.build(jnp.asarray(x), mode="both")
    got = np.asarray(
        scoring.l2sqr_block(jnp.asarray(q), jnp.asarray(x), x_sqnorms=cache.sq)
    )
    np.testing.assert_allclose(got, _np_l2sqr(q, x), rtol=1e-4, atol=1e-3)


def test_inner_product_matches_oracle():
    q, x = _data()
    got = np.asarray(scoring.inner_product_block(jnp.asarray(q), jnp.asarray(x)))
    np.testing.assert_allclose(got, q @ x.T, rtol=1e-5, atol=1e-5)


def test_cosine_matches_oracle_and_range():
    q, x = _data()
    got = np.asarray(scoring.cosine_block(jnp.asarray(q), jnp.asarray(x)))
    qn = q / np.linalg.norm(q, axis=-1, keepdims=True)
    xn = x / np.linalg.norm(x, axis=-1, keepdims=True)
    np.testing.assert_allclose(got, qn @ xn.T, rtol=1e-4, atol=1e-4)
    assert got.min() >= -1.0 and got.max() <= 1.0


def test_cosine_zero_vector_guard():
    q = jnp.asarray([[1.0, 2.0, 3.0]], dtype=jnp.float32)
    x = jnp.zeros((2, 3), dtype=jnp.float32)
    got = np.asarray(scoring.cosine_block(q, x))
    assert np.all(np.isfinite(got))
    np.testing.assert_allclose(got, 0.0)


def test_manhattan_chebyshev():
    q, x = _data(b=3, n=9, d=5)
    man = np.asarray(scoring.manhattan_block(jnp.asarray(q), jnp.asarray(x)))
    che = np.asarray(scoring.chebyshev_block(jnp.asarray(q), jnp.asarray(x)))
    diff = np.abs(q[:, None, :] - x[None, :, :])
    np.testing.assert_allclose(man, diff.sum(-1), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(che, diff.max(-1), rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("metric", list(Metric))
def test_score_block_dispatch_and_distance_roundtrip(metric):
    q, x = _data(b=4, n=16, d=24)
    s = scoring.score_block(jnp.asarray(q), jnp.asarray(x), metric)
    d = scoring.as_distance(s, metric)
    back = scoring.from_distance(d, metric)
    np.testing.assert_allclose(np.asarray(back), np.asarray(s), rtol=1e-6, atol=1e-6)
    # distances must rank identically to "better" scores
    if metric.is_similarity:
        assert np.all(
            np.argsort(np.asarray(d), axis=-1)
            == np.argsort(-np.asarray(s), axis=-1)
        )


def test_score_block_jit_and_bf16_inputs():
    q, x = _data(d=64)
    f = jax.jit(lambda a, b: scoring.score_block(a, b, Metric.L2))
    got32 = np.asarray(f(jnp.asarray(q), jnp.asarray(x)))
    got16 = np.asarray(
        scoring.l2sqr_block(
            jnp.asarray(q, dtype=jnp.bfloat16), jnp.asarray(x, dtype=jnp.bfloat16)
        )
    )
    np.testing.assert_allclose(got32, _np_l2sqr(q, x), rtol=1e-4, atol=1e-3)
    # bf16 path should agree loosely (MXU-style accumulate in f32)
    np.testing.assert_allclose(got16, _np_l2sqr(q, x), rtol=0.05, atol=0.5)


def test_strict_fp_uses_direct_path():
    q, x = _data()
    s1 = scoring.score_block(
        jnp.asarray(q), jnp.asarray(x), Metric.L2, opts=ScoreOpts(strict_fp=True)
    )
    s2 = scoring.l2sqr_block_direct(jnp.asarray(q), jnp.asarray(x))
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
