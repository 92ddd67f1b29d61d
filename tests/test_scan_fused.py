"""Fused Pallas flat-scan kernel (kernels/scan_fused) vs the strict oracle.

Tier-(a)/(b) of the reference's test pyramid (SURVEY.md §4): the Pallas
kernel runs in interpret mode on CPU and is checked against the always-exact
XLA strict path (ops/scan.scan_topk_strict), which is itself oracle-tested
in test_scan.py."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vectorindex_tpu.kernels.scan_fused import (
    C,
    TILE,
    _query_block,
    pad_corpus,
    scan_topk_fused,
)
from vectorindex_tpu.ops.scan import scan_topk_strict
from vectorindex_tpu.ops.topk import INVALID_ID
from vectorindex_tpu.utils.config import Metric

METRICS = [Metric.L2, Metric.INNER_PRODUCT, Metric.COSINE]


def _norms(x):
    sq = jnp.einsum("nd,nd->n", x, x)
    inv = jnp.where(sq > 0, jax.lax.rsqrt(jnp.maximum(sq, 1e-30)), 0.0)
    return sq, inv


def _run(q, x, valid, metric, k):
    xp, sqp, vp = pad_corpus(jnp.asarray(x), None, None if valid is None else jnp.asarray(valid))
    return scan_topk_fused(
        jnp.asarray(q), xp, sqp, vp, metric=metric, k=k, interpret=True
    )


def _oracle(q, x, valid, metric, k):
    sq, inv = _norms(jnp.asarray(x))
    vm = None if valid is None else jnp.asarray(valid)
    return scan_topk_strict(jnp.asarray(q), jnp.asarray(x), sq, inv, vm, metric=metric, k=k)


@pytest.mark.parametrize("metric", METRICS)
def test_exact_rows_match_oracle(metric):
    rng = np.random.default_rng(11)
    n, d, b, k = 9000, 64, 13, 10
    x = rng.standard_normal((n, d)).astype(np.float32)
    q = rng.standard_normal((b, d)).astype(np.float32)
    sd, si, exact = map(np.asarray, _run(q, x, None, metric, k))
    td, ti = map(np.asarray, _oracle(q, x, None, metric, k))
    assert exact.any()  # some rows verify clean even at adversarial n/C
    assert (si[exact] == ti[exact]).all()
    assert np.allclose(sd[exact], td[exact], rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("metric", METRICS)
def test_tombstones_and_filters(metric):
    rng = np.random.default_rng(12)
    n, d, b, k = 6000, 32, 9, 5
    x = rng.standard_normal((n, d)).astype(np.float32)
    q = rng.standard_normal((b, d)).astype(np.float32)
    valid = np.ones(n, bool)
    valid[rng.choice(n, n // 3, replace=False)] = False
    sd, si, exact = map(np.asarray, _run(q, x, valid, metric, k))
    td, ti = map(np.asarray, _oracle(q, x, valid, metric, k))
    # no dead slot may appear in results
    assert not np.isin(si[si != INVALID_ID], np.nonzero(~valid)[0]).any()
    assert (si[exact] == ti[exact]).all()


def test_verification_catches_planted_collision():
    """Craft a corpus where two of the true top-k share a residue class in
    every tile (same column mod C, same tile) so the single-tier per-tile
    min MUST drop one — verification has to flag those queries, never
    return a silently-wrong exact=True row."""
    rng = np.random.default_rng(13)
    n, d, k = TILE, 16, 4
    x = rng.standard_normal((n, d)).astype(np.float32) * 10.0
    q = rng.standard_normal((1, d)).astype(np.float32)
    # plant 5 near-identical best rows in one residue class of one tile
    base = q[0] + 1e-3 * rng.standard_normal(d).astype(np.float32)
    for j in range(5):
        x[7 + j * C] = base + 1e-4 * j
    sd, si, exact = map(np.asarray, _run(q, x, None, Metric.L2, k))
    td, ti = map(np.asarray, _oracle(q, x, None, Metric.L2, k))
    if exact[0]:
        assert (si[0] == ti[0]).all()
    else:
        # flagged: caller contract is to re-run strict — nothing to assert
        # beyond the flag itself
        assert not exact[0]


def test_small_batch_and_padding():
    rng = np.random.default_rng(14)
    n, d = 5000, 48  # n not a TILE multiple, d not a lane multiple
    x = rng.standard_normal((n, d)).astype(np.float32)
    q = rng.standard_normal((3, d)).astype(np.float32)
    assert _query_block(3) == 8
    sd, si, exact = map(np.asarray, _run(q, x, None, Metric.L2, 7))
    td, ti = map(np.asarray, _oracle(q, x, None, Metric.L2, 7))
    assert sd.shape == (3, 7)
    assert (si[exact] == ti[exact]).all()


def test_k_exceeds_valid_count():
    rng = np.random.default_rng(15)
    x = rng.standard_normal((6, 16)).astype(np.float32)
    q = rng.standard_normal((2, 16)).astype(np.float32)
    sd, si, exact = map(np.asarray, _run(q, x, None, Metric.L2, 10))
    assert exact.all()
    assert (si[:, :6] != INVALID_ID).all()
    assert (si[:, 6:] == INVALID_ID).all()
    assert np.isinf(sd[:, 6:]).all()


def test_strict_tie_contract():
    """Duplicate rows: ties must break by ascending id (TopK.swift:8-30)."""
    rng = np.random.default_rng(16)
    d = 16
    row = rng.standard_normal(d).astype(np.float32)
    x = rng.standard_normal((4000, d)).astype(np.float32) * 5.0
    dup_slots = [17, 1200, 2305, 3999]
    for s in dup_slots:
        x[s] = row
    q = row[None, :].copy()
    sd, si, exact = map(np.asarray, _run(q, x, None, Metric.L2, 4))
    if exact[0]:
        assert list(si[0]) == dup_slots


def test_flat_index_integration(monkeypatch):
    """FlatIndex routes big scans through the fused kernel when forced."""
    import vectorindex_tpu.models.flat as flat_mod

    monkeypatch.setenv("VECTORINDEX_TPU_FORCE_PALLAS_SCAN", "1")
    monkeypatch.setattr(flat_mod, "LARGE_SCAN_THRESHOLD", 1024)
    rng = np.random.default_rng(17)
    n, d, k = 1500, 24, 5
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    idx = flat_mod.FlatIndex(d, metric=Metric.L2)
    idx.insert_batch([f"v{i}" for i in range(n)], vecs)
    assert idx.capacity >= 1024
    res = idx.search(vecs[42], k)
    # dot-trick self-distance is catastrophic cancellation territory: the
    # true 0 comes out as f32 noise ~1e-6 in d^2, sqrt'd to ~1e-3
    assert res[0].id == "v42" and res[0].score < 1e-2
    # brute-force truth for one query
    qd = ((vecs - vecs[42]) ** 2).sum(1)
    truth = {f"v{i}" for i in np.argsort(qd)[:k]}
    assert {r.id for r in res} == truth
    # metadata filter goes down the same path
    idx2 = flat_mod.FlatIndex(d, metric=Metric.COSINE)
    idx2.insert_batch(
        [f"v{i}" for i in range(n)],
        vecs,
        [{"tag": "even" if i % 2 == 0 else "odd"} for i in range(n)],
    )
    res = idx2.search(vecs[10], 3, filter=lambda m: m and m["tag"] == "even")
    assert all(int(r.id[1:]) % 2 == 0 for r in res)
    assert res[0].id == "v10"
