"""Cross-op integration at odd shapes + churn oracles.

Parity model: reference MicrokernelIntegrationTests.swift (kernels composed
into pipelines vs the scalar oracle), CosineFusedCacheIntegrationTests.swift
(cached inverse norms == on-the-fly), HNSW churn (the reference spreads this
over HNSWMoreTests/BatchAndErrors) — here as a randomized CRUD interleaving
checked against a brute-force oracle after every phase.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from vectorindex_tpu.ops import scoring  # noqa: E402
from vectorindex_tpu.ops.topk import INVALID_ID, merge_topk, topk  # noqa: E402
from vectorindex_tpu.utils.config import Metric  # noqa: E402


# ---------------------------------------------------------------------------
# score -> topk -> merge pipelines at odd shapes (MicrokernelIntegration)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("n,d,b,k", [(1, 1, 1, 1), (3, 7, 2, 5), (257, 33, 9, 10)])
def test_score_topk_pipeline_odd_shapes(n, d, b, k):
    rng = np.random.default_rng(n * 100 + d)
    x = rng.standard_normal((n, d)).astype(np.float32)
    q = rng.standard_normal((b, d)).astype(np.float32)
    dist = scoring.distance_block(jnp.asarray(q), jnp.asarray(x), Metric.L2)
    sd, si = topk(dist, k)
    ref = ((q[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    order = np.argsort(ref, axis=1, kind="stable")[:, :k]
    kk = min(k, n)
    np.testing.assert_array_equal(np.asarray(si)[:, :kk], order[:, :kk])


def test_partitioned_scan_merge_equals_global():
    """Score shards separately, merge partials — must equal the global scan
    (the reference's partition-then-merge thread contract, on any split)."""
    rng = np.random.default_rng(7)
    n, d, b, k = 500, 16, 6, 10
    x = rng.standard_normal((n, d)).astype(np.float32)
    q = rng.standard_normal((b, d)).astype(np.float32)
    full = scoring.distance_block(jnp.asarray(q), jnp.asarray(x), Metric.L2)
    gd, gi = topk(full, k)

    splits = [0, 123, 260, 400, 500]  # deliberately uneven
    parts_d, parts_i = [], []
    for lo, hi in zip(splits[:-1], splits[1:]):
        dist = scoring.distance_block(
            jnp.asarray(q), jnp.asarray(x[lo:hi]), Metric.L2
        )
        pd, pi = topk(dist, k)
        ids = jnp.where(pi == INVALID_ID, INVALID_ID, pi + lo)
        parts_d.append(pd)
        parts_i.append(ids)
    md, mi = merge_topk(
        jnp.stack(parts_d, axis=1), jnp.stack(parts_i, axis=1), k
    )
    np.testing.assert_allclose(np.asarray(md), np.asarray(gd), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(mi), np.asarray(gi))


def test_cosine_cached_inv_norms_match_on_the_fly():
    """CosineFusedCacheIntegrationTests: the fused path consuming cached
    inverse norms must equal the two-pass on-the-fly computation."""
    rng = np.random.default_rng(9)
    n, d, b = 300, 24, 8
    x = rng.standard_normal((n, d)).astype(np.float32)
    x[17] = 0.0  # zero vector: the guard path must agree too
    q = rng.standard_normal((b, d)).astype(np.float32)
    xd, qd = jnp.asarray(x), jnp.asarray(q)
    plain = scoring.distance_block(qd, xd, Metric.COSINE)
    sqn = jnp.einsum("nd,nd->n", xd, xd)
    inv = jnp.where(sqn > 0, jax.lax.rsqrt(jnp.maximum(sqn, 1e-30)), 0.0)
    cached = scoring.distance_block(
        qd, xd, Metric.COSINE, norms=scoring.NormCache(inv=inv)
    )
    np.testing.assert_allclose(
        np.asarray(cached), np.asarray(plain), rtol=1e-5, atol=1e-6
    )


def test_f16_norm_cache_close_to_f32():
    """The reference ships an f16 inv-norm cache (Norms.swift dtypes);
    verify the precision loss stays within f16 tolerance end-to-end."""
    rng = np.random.default_rng(11)
    n, d, b = 200, 16, 4
    x = rng.standard_normal((n, d)).astype(np.float32)
    q = rng.standard_normal((b, d)).astype(np.float32)
    xd, qd = jnp.asarray(x), jnp.asarray(q)
    sqn = jnp.einsum("nd,nd->n", xd, xd)
    inv32 = jax.lax.rsqrt(jnp.maximum(sqn, 1e-30))
    inv16 = inv32.astype(jnp.float16).astype(jnp.float32)
    d32 = scoring.distance_block(qd, xd, Metric.COSINE, norms=scoring.NormCache(inv=inv32))
    d16 = scoring.distance_block(qd, xd, Metric.COSINE, norms=scoring.NormCache(inv=inv16))
    np.testing.assert_allclose(np.asarray(d16), np.asarray(d32), atol=2e-3)


# ---------------------------------------------------------------------------
# HNSW churn oracle
# ---------------------------------------------------------------------------


def test_hnsw_churn_matches_oracle():
    """Randomized insert/remove/update interleavings; after every phase the
    top-1 for perturbed queries of live points must be that point."""
    from vectorindex_tpu.models.hnsw import HNSWConfig, HNSWIndex

    rng = np.random.default_rng(13)
    d = 16
    idx = HNSWIndex(d, Metric.L2, HNSWConfig(m=8, ef_construction=48, build_chunk=64))
    live: dict[str, np.ndarray] = {}

    def check(sample=12):
        if not live:
            return
        keys = rng.choice(list(live.keys()), min(sample, len(live)), replace=False)
        for kid in keys:
            res = idx.search(live[kid], 1)
            assert res and res[0].id == kid, kid

    # phase 1: bulk insert
    x = rng.standard_normal((300, d)).astype(np.float32)
    for i in range(300):
        idx.insert(f"a{i}", x[i])
        live[f"a{i}"] = x[i]
    check()
    # phase 2: remove a third
    for i in range(0, 300, 3):
        idx.remove(f"a{i}")
        del live[f"a{i}"]
    check()
    # phase 3: trickle inserts reusing the space
    y = rng.standard_normal((60, d)).astype(np.float32) + 2.0
    for i in range(60):
        idx.insert(f"b{i}", y[i])
        live[f"b{i}"] = y[i]
    check()
    # phase 4: updates (re-position)
    for i in range(0, 60, 5):
        nv = y[i] - 5.0
        idx.update(f"b{i}", vector=nv)
        live[f"b{i}"] = nv
    check()
    # phase 5: compact and re-check everything still resolves
    idx.compact()
    assert idx.count == len(live)
    check(sample=20)


def test_flat_vs_hnsw_vs_ivf_same_answers_easy_regime():
    """On a well-separated corpus all three families must agree on top-1
    (the cross-family sanity the reference spreads across its suites)."""
    from vectorindex_tpu.models.flat import FlatIndex
    from vectorindex_tpu.models.hnsw import HNSWConfig, HNSWIndex
    from vectorindex_tpu.models.ivf import IVFConfig, IVFIndex

    rng = np.random.default_rng(17)
    d, n = 12, 240
    centers = rng.standard_normal((n, d)).astype(np.float32) * 10.0
    ids = [f"v{i}" for i in range(n)]

    flat = FlatIndex(d)
    hnsw = HNSWIndex(d, Metric.L2, HNSWConfig(m=6, ef_construction=32, build_chunk=48))
    ivf = IVFIndex(d, Metric.L2, IVFConfig(nlist=8, nprobe=8))
    for idx in (flat, hnsw, ivf):
        idx.insert_batch(ids, centers)
    ivf.optimize()

    q = centers[:40] + 0.01 * rng.standard_normal((40, d)).astype(np.float32)
    rf = [r[0].id for r in flat.batch_search(q, 1)]
    rh = [r[0].id for r in hnsw.batch_search(q, 1)]
    ri = [r[0].id for r in ivf.batch_search(q, 1)]
    assert rf == rh == ri == ids[:40]
