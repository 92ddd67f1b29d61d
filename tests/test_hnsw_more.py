"""HNSW structural behavior tests.

Parity model: reference HNSWMoreTests.swift / HNSWParamSweepTests.swift /
HNSWLevelAssignmentTests.swift — level distribution, entry promotion,
parameter sweeps (recall monotone-ish in efSearch), determinism under a
fixed seed, tombstone interactions with traversal.
"""

import numpy as np
import pytest

from vectorindex_tpu.models.hnsw import HNSWConfig, HNSWIndex
from vectorindex_tpu.utils.config import Metric

D = 24


def _data(n, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n, D)).astype(np.float32)


def _build(n=600, seed=0, **kw):
    cfg = HNSWConfig(m=8, ef_construction=48, build_chunk=64, **kw)
    idx = HNSWIndex(D, Metric.L2, cfg)
    x = _data(n, seed)
    idx.insert_batch([f"v{i}" for i in range(n)], x)
    idx.statistics()
    return idx, x


def _recall(idx, x, q, k=10, ef=None):
    import dataclasses

    if ef is not None:
        idx.config = dataclasses.replace(idx.config, ef_search=ef)
    res = idx.batch_search(q, k)
    d = ((q[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    truth = np.argsort(d, axis=1, kind="stable")[:, :k]
    hits = 0
    for i, row in enumerate(res):
        got = {int(r.id[1:]) for r in row}
        hits += len(got & set(truth[i].tolist()))
    return hits / (len(res) * k)


def test_level_distribution_geometric():
    """Levels follow the geometric law: level counts decay ~1/m per level
    and the cap holds (reference hnswSampleLevel)."""
    idx, _ = _build(n=2000)
    levels = idx._levels[idx._levels >= 0]
    n0 = (levels >= 0).sum()
    n1 = (levels >= 1).sum()
    assert n0 == 2000
    # E[n1] = n/m = 250; allow wide slack for the tail
    assert 100 <= n1 <= 450
    assert levels.max() <= 16


def test_entry_point_has_max_level():
    idx, _ = _build(n=800)
    assert idx._levels[idx._entry] == max(
        idx._levels[s] for s in range(idx._next_slot) if idx._levels[s] >= 0
    )


def test_layer_counts_monotone_decreasing():
    idx, _ = _build(n=1500)
    counts = [layer.count for layer in idx._layers]
    assert counts[0] == 1500
    assert all(counts[i] >= counts[i + 1] for i in range(len(counts) - 1))


def test_recall_improves_with_ef_search():
    idx, x = _build(n=1200, seed=3)
    q = x[:48] + 0.01 * _data(48, seed=9)
    r_small = _recall(idx, x, q, ef=8)
    r_large = _recall(idx, x, q, ef=96)
    assert r_large >= r_small
    assert r_large >= 0.95


def test_deterministic_given_seed():
    a, _ = _build(n=500, seed=5)
    b, _ = _build(n=500, seed=5)
    na = a._layers[0].nbrs[: a._layers[0].count]
    nb = b._layers[0].nbrs[: b._layers[0].count]
    assert (na == nb).all()
    assert a._entry == b._entry


def test_search_after_heavy_deletion():
    idx, x = _build(n=600, seed=7)
    for i in range(0, 600, 2):
        idx.remove(f"v{i}")
    q = x[1::2][:32]
    res = idx.batch_search(q, 5)
    for i, row in enumerate(res):
        assert row, "search must still return results at 50% tombstones"
        assert all(int(r.id[1:]) % 2 == 1 for r in row)
    assert res[0][0].id == "v1"


def test_removed_entry_point_still_searches():
    idx, x = _build(n=300, seed=11)
    ext = f"v{idx._entry}"  # slot == insertion index here
    idx.remove(ext)
    res = idx.search(x[5], 3)
    assert res and all(r.id != ext for r in res)


def test_degree_bounds_respected():
    idx, _ = _build(n=1000, seed=13)
    l0 = idx._layers[0]
    deg = (l0.nbrs[: l0.count] >= 0).sum(axis=1)
    assert deg.max() <= l0.max_degree
    for layer in idx._layers[1:]:
        if layer.count:
            d = (layer.nbrs[: layer.count] >= 0).sum(axis=1)
            assert d.max() <= layer.max_degree


def test_no_self_edges_level0():
    idx, _ = _build(n=800, seed=17)
    l0 = idx._layers[0]
    node_ids = np.asarray(l0.node_ids)
    self_edge = l0.nbrs[: l0.count] == node_ids[:, None]
    assert not self_edge.any()


def test_trickle_insert_after_bulk_build():
    """Nodes inserted one-by-one after a bulk build must be findable
    (the pending-chunk path with a tiny chunk)."""
    idx, x = _build(n=400, seed=19)
    y = _data(20, seed=23) + 3.0
    for i in range(20):
        idx.insert(f"w{i}", y[i])
    res = idx.search(y[7], 3)
    assert res[0].id == "w7"


@pytest.mark.parametrize("m", [4, 12])
def test_m_sweep_builds_and_searches(m):
    cfg = HNSWConfig(m=m, ef_construction=32, build_chunk=48)
    idx = HNSWIndex(D, Metric.L2, cfg)
    x = _data(400, seed=29)
    idx.insert_batch([f"v{i}" for i in range(400)], x)
    res = idx.search(x[11], 5)
    assert res[0].id == "v11"
    assert idx._layers[0].max_degree == 2 * m


def test_cosine_graph_space_normalized():
    cfg = HNSWConfig(m=8, ef_construction=32, build_chunk=48)
    idx = HNSWIndex(D, Metric.COSINE, cfg)
    rng = np.random.default_rng(31)
    x = rng.standard_normal((300, D)).astype(np.float32)
    x *= rng.uniform(0.1, 5.0, (300, 1)).astype(np.float32)  # spread norms
    idx.insert_batch([f"v{i}" for i in range(300)], x)
    # cosine self-similarity is scale-invariant: scaled copy of v5 matches
    res = idx.search(7.5 * x[5], 1)
    assert res[0].id == "v5"
    assert res[0].score == pytest.approx(1.0, abs=1e-5)


def test_device_search_closure_matches_batch_search():
    """The serving-harness closure (all device state passed as arguments,
    jit-safe) must return exactly what the batch_search fast lane returns
    — bench.py and the serving loop depend on this path."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    n, d = 800, 24
    x = rng.standard_normal((n, d)).astype(np.float32)
    idx = HNSWIndex(d, Metric.L2, HNSWConfig(m=8, ef_construction=48,
                                             ef_search=32, seed=7))
    idx.insert_batch(list(range(n)), x)
    q = x[:12] + 0.01 * rng.standard_normal((12, d)).astype(np.float32)
    expect = idx.batch_search(q, 5)

    fn, fargs = idx.device_search_closure(5)
    kslot, kscore, kok = jax.jit(fn)(jnp.asarray(q), *fargs)
    got = idx.assemble_results(
        np.asarray(kslot), np.asarray(kscore), np.asarray(kok)
    )
    assert [[r.id for r in row] for row in got] == [
        [r.id for r in row] for row in expect
    ]
    for ra, rb in zip(got, expect):
        for a, b in zip(ra, rb):
            assert abs(a.score - b.score) < 1e-5


def test_hnsw_batch_search_stream_matches_per_call():
    """HNSWIndex.batch_search_stream (VERDICT r4 next #3: measured
    pipelined serving) must yield, per batch and in order, the same
    SearchResult rows as batch_search's no-filter fast lane."""
    import numpy as np

    from vectorindex_tpu.models.hnsw import HNSWConfig, HNSWIndex
    from vectorindex_tpu.utils.config import Metric

    rng = np.random.default_rng(23)
    n, d = 1200, 24
    x = rng.standard_normal((n, d)).astype(np.float32)
    idx = HNSWIndex(d, Metric.L2, HNSWConfig(ef_search=64))
    idx.insert_batch([str(i) for i in range(n)], x)
    batches = [
        x[rng.choice(n, 6, replace=False)]
        + 0.01 * rng.standard_normal((6, d)).astype(np.float32)
        for _ in range(4)
    ]
    got = list(idx.batch_search_stream(batches, 5, lookahead=2))
    assert len(got) == len(batches)
    for qb, rows_s in zip(batches, got):
        rows_p = idx.batch_search(qb, 5)
        assert [[r.id for r in row] for row in rows_s] == [
            [r.id for r in row] for row in rows_p
        ]
        for row_s, row_p in zip(rows_s, rows_p):
            for rs, rp in zip(row_s, row_p):
                assert rs.score == rp.score
