"""FlatIndex behavior: CRUD, search correctness vs brute force, filters,
persistence round-trip, compaction (reference FlatIndexTests,
FlatIndexEdgeCasesTests, PersistenceTests — SURVEY.md §4 tiers 4-6)."""

import numpy as np
import pytest

from vectorindex_tpu.models import FlatIndex, JournalFilter
from vectorindex_tpu.utils.config import Metric
from vectorindex_tpu.utils.errors import IndexError, IndexErrorKind


def _mk(n=100, d=16, metric=Metric.L2, seed=0, meta=False):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((n, d)).astype(np.float32)
    idx = FlatIndex(d, metric)
    metas = (
        [{"tags": ["even" if i % 2 == 0 else "odd"], "i": i} for i in range(n)]
        if meta
        else None
    )
    idx.insert_batch([f"v{i}" for i in range(n)], x, metas)
    return idx, x


def test_insert_search_exact_recall():
    idx, x = _mk(n=200, d=32)
    res = idx.search(x[17], k=5)
    assert res[0].id == "v17"
    assert res[0].score == pytest.approx(0.0, abs=1e-3)
    # brute-force agreement
    d = np.linalg.norm(x - x[17], axis=1)
    want = np.argsort(d)[:5]
    assert [r.id for r in res] == [f"v{i}" for i in want]
    np.testing.assert_allclose(
        [r.score for r in res], np.sort(d)[:5], rtol=1e-4, atol=1e-4
    )


@pytest.mark.parametrize(
    "metric",
    [Metric.L2, Metric.INNER_PRODUCT, Metric.COSINE, Metric.MANHATTAN, Metric.CHEBYSHEV],
)
def test_all_metrics_match_bruteforce(metric):
    idx, x = _mk(n=80, d=12, metric=metric, seed=3)
    q = x[5] * 0.9 + 0.01
    res = idx.search(q, k=10)
    if metric == Metric.L2:
        ref = np.linalg.norm(x - q, axis=1)
        order = np.argsort(ref)
    elif metric == Metric.INNER_PRODUCT:
        ref = x @ q
        order = np.argsort(-ref)
    elif metric == Metric.COSINE:
        ref = (x @ q) / (np.linalg.norm(x, axis=1) * np.linalg.norm(q))
        order = np.argsort(-ref)
    elif metric == Metric.MANHATTAN:
        ref = np.abs(x - q).sum(1)
        order = np.argsort(ref)
    else:
        ref = np.abs(x - q).max(1)
        order = np.argsort(ref)
    assert [r.id for r in res] == [f"v{i}" for i in order[:10]]
    np.testing.assert_allclose(
        [abs(r.score) for r in res], np.abs(ref[order[:10]]), rtol=1e-3, atol=1e-3
    )


def test_batch_search_matches_single():
    idx, x = _mk(n=64, d=8)
    qs = x[:5] + 0.001
    batch = idx.batch_search(qs, k=3)
    for i in range(5):
        single = idx.search(qs[i], k=3)
        assert [r.id for r in batch[i]] == [r.id for r in single]


def test_remove_update_contains():
    idx, x = _mk(n=10, d=4)
    assert idx.contains("v3")
    idx.remove("v3")
    assert not idx.contains("v3")
    assert idx.count == 9
    res = idx.search(x[3], k=10)
    assert "v3" not in [r.id for r in res]
    # slot reuse
    idx.insert("v_new", x[3])
    assert idx.count == 10
    assert idx.search(x[3], k=1)[0].id == "v_new"
    # update moves a vector
    idx.update("v5", vector=x[7] + 10.0)
    assert idx.search(x[7] + 10.0, k=1)[0].id == "v5"
    with pytest.raises(IndexError) as ei:
        idx.remove("missing")
    assert ei.value.kind == IndexErrorKind.NOT_FOUND


def test_duplicate_and_dim_mismatch_errors():
    idx, x = _mk(n=5, d=4)
    with pytest.raises(IndexError) as ei:
        idx.insert("v0", x[0])
    assert ei.value.kind == IndexErrorKind.DUPLICATE_ID
    with pytest.raises(IndexError) as ei:
        idx.insert("w", np.ones(7, dtype=np.float32))
    assert ei.value.kind == IndexErrorKind.DIMENSION_MISMATCH
    with pytest.raises(IndexError) as ei:
        idx.insert("nanvec", np.full(4, np.nan, dtype=np.float32))
    assert ei.value.kind == IndexErrorKind.INVALID_VECTOR


def test_empty_index_and_k_edge_cases():
    idx = FlatIndex(4)
    assert idx.search(np.ones(4), k=5) == []
    idx.insert("a", np.ones(4))
    res = idx.search(np.ones(4), k=100)
    assert len(res) == 1


def test_metadata_filter_exact_k():
    idx, x = _mk(n=60, d=8, meta=True)
    res = idx.search(x[0], k=10, filter=lambda m: m is not None and m["i"] % 2 == 0)
    assert len(res) == 10
    assert all(r.metadata["i"] % 2 == 0 for r in res)
    # brute force among evens
    evens = np.arange(0, 60, 2)
    d = np.linalg.norm(x[evens] - x[0], axis=1)
    want = [f"v{evens[i]}" for i in np.argsort(d)[:10]]
    assert [r.id for r in res] == want


def test_journal_filter_dsl():
    idx, x = _mk(n=20, d=8, meta=True)
    f = JournalFilter().including_tags("even").compile()
    res = idx.search(x[0], k=5, filter=f)
    assert all("even" in r.metadata["tags"] for r in res)
    f2 = JournalFilter().excluding_tags("even", "odd").compile()
    assert idx.search(x[0], k=5, filter=f2) == []


def test_capacity_growth():
    idx = FlatIndex(4, capacity=1024)
    n = 2100
    rng = np.random.default_rng(0)
    x = rng.standard_normal((n, 4)).astype(np.float32)
    idx.insert_batch(list(range(n)), x)
    assert idx.count == n
    assert idx.capacity >= n
    assert idx.search(x[2050], k=1)[0].id == 2050


def test_compact_preserves_results():
    idx, x = _mk(n=50, d=8)
    for i in range(0, 50, 3):
        idx.remove(f"v{i}")
    before = [r.id for r in idx.search(x[1], k=10)]
    idx.compact()
    after = [r.id for r in idx.search(x[1], k=10)]
    assert before == after
    assert idx.statistics().details["free_slots"] == 0


def test_persistence_roundtrip(tmp_path):
    idx, x = _mk(n=30, d=8, meta=True)
    idx.remove("v4")
    p = str(tmp_path / "flat.json")
    idx.save(p)
    idx2 = FlatIndex.load(p)
    assert idx2.count == 29
    r1 = idx.search(x[9], k=5)
    r2 = idx2.search(x[9], k=5)
    assert [r.id for r in r1] == [r.id for r in r2]
    assert r2[0].metadata == r1[0].metadata
    np.testing.assert_allclose(
        [r.score for r in r1], [r.score for r in r2], rtol=1e-5
    )


def test_statistics():
    idx, _ = _mk(n=10, d=4)
    st = idx.statistics()
    assert st.count == 10
    assert st.dimension == 4
    assert st.metric == "l2"
    assert st.memory_bytes > 0


def test_range_search_api():
    idx, x = _mk(n=100, d=8)
    # radius covering the 5 nearest of v0
    d = np.sort(np.linalg.norm(x - x[0], axis=1))
    r = float(d[5]) + 1e-5
    res = idx.range_search(x[0], radius=r, max_results=50)
    assert res[0].id == "v0"
    assert len(res) == 6  # self + 5 within radius
    assert all(rr.score <= r + 1e-4 for rr in res)
    # filter applies
    idx2, x2 = _mk(n=60, d=8, meta=True)
    res = idx2.range_search(x2[0], radius=100.0, filter=lambda m: m and m["i"] < 5)
    assert {rr.metadata["i"] for rr in res} <= set(range(5))


def test_flat_bf16_storage_recall():
    import jax.numpy as jnp

    rng = np.random.default_rng(7)
    x = rng.standard_normal((500, 32)).astype(np.float32)
    idx = FlatIndex(32, storage_dtype=jnp.bfloat16)
    idx.insert_batch(list(range(500)), x)
    res = idx.batch_search(x[:20], 5)
    truth = np.argsort(((x[:20, None] - x[None]) ** 2).sum(-1), 1)[:, :5]
    hits = sum(
        len({r.id for r in row} & set(truth[b].tolist()))
        for b, row in enumerate(res)
    )
    assert hits / 100 >= 0.9


def test_journal_filter_missing_keys_policy():
    idx, x = _mk(n=10, d=4)
    # no metadata at all; allow_missing off → date filter excludes everything
    f_strict = JournalFilter().date_between("2026-01-01", "2026-12-31").compile()
    assert idx.search(x[0], 3, filter=f_strict) == []
    f_loose = (
        JournalFilter()
        .date_between("2026-01-01", "2026-12-31")
        .allowing_missing_keys()
        .compile()
    )
    assert len(idx.search(x[0], 3, filter=f_loose)) == 3


def test_load_index_dispatch(tmp_path):
    from vectorindex_tpu.models import load_index

    idx, x = _mk(n=20, d=4)
    p = str(tmp_path / "any.json")
    idx.save(p)
    idx2 = load_index(p)
    assert type(idx2).__name__ == "FlatIndex"
    assert idx2.search(x[3], 1)[0].id == "v3"
    import json

    bad = str(tmp_path / "bad.json")
    json.dump({"type": "nope"}, open(bad, "w"))
    with pytest.raises(IndexError):
        load_index(bad)
