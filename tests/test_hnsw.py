"""HNSW graph ops + index: level distribution, beam vs brute force, diversity
selection, recall floors, CRUD, persistence-rebuild (reference
HNSWRecallTests.swift:22-67, HNSWParamSweepTests, HNSWBatchAndErrorsTests,
HNSWMoreTests — SURVEY.md §4)."""

import jax.numpy as jnp
import numpy as np
import pytest

from vectorindex_tpu.models.hnsw import HNSWConfig, HNSWIndex
from vectorindex_tpu.ops import graph as gops
from vectorindex_tpu.ops import rng as vrng
from vectorindex_tpu.ops.topk import INVALID_ID
from vectorindex_tpu.utils.config import Metric


def _data(n=300, d=32, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n, d)).astype(np.float32)


# -- ops --


def test_sample_levels_geometric():
    levels = np.asarray(gops.sample_levels(vrng.make_key(0), 20000, 16))
    assert levels.min() == 0
    assert levels.max() <= gops.LEVEL_CAP
    frac0 = (levels == 0).mean()
    # P(level=0) = 1 - 1/M = 0.9375 for M=16
    assert abs(frac0 - 0.9375) < 0.01


def test_greedy_descent_finds_local_best():
    # complete graph on 32 nodes → greedy descent must land on the nearest
    x = _data(32, 8, seed=1)
    nbrs = np.stack([np.delete(np.arange(32), i)[:16] for i in range(32)]).astype(
        np.int32
    )
    q = jnp.asarray(x[:4] + 0.01)
    gv = jnp.asarray(x)
    sqn = jnp.asarray((x**2).sum(1))
    out = gops.greedy_descent(
        q, gv, sqn, jnp.asarray(nbrs), jnp.arange(32, dtype=jnp.int32),
        jnp.full((4,), 31, dtype=jnp.int32), steps=10,
    )
    # with a (near-)complete graph this converges to the true NN
    ref = np.argmin(((np.asarray(q)[:, None] - x[None]) ** 2).sum(-1), axis=1)
    assert (np.asarray(out) == ref).mean() >= 0.75


def test_beam_search_on_full_graph_is_exact():
    # fully-connected small graph: beam search == brute force top-ef
    n, d = 64, 8
    x = _data(n, d, seed=2)
    nbrs = np.stack(
        [np.delete(np.arange(n), i)[: n - 1] for i in range(n)]
    ).astype(np.int32)
    q = jnp.asarray(_data(5, d, seed=3))
    gv, sqn = jnp.asarray(x), jnp.asarray((x**2).sum(1))
    res = gops.beam_search(
        q, gv, sqn, jnp.asarray(nbrs), None,
        jnp.zeros((5,), dtype=jnp.int32), ef=10, iters=10,
    )
    ref = np.argsort(((np.asarray(q)[:, None] - x[None]) ** 2).sum(-1), axis=1)[:, :10]
    got = np.asarray(res.ids)
    overlap = np.mean([len(set(got[i]) & set(ref[i])) / 10 for i in range(5)])
    assert overlap >= 0.9


def test_select_neighbors_diverse_prefers_spread():
    # two clusters in OPPOSITE directions from the new point: the heuristic
    # keeps the nearest of each (a candidate is kept iff closer to new than
    # to any selected) and drops same-direction shadowed candidates
    pts = np.array(
        [[0.1, 0.0], [0.12, 0.0], [0.15, 0.0], [-5.0, 0.0], [-5.1, 0.0], [-5.2, 0.0]],
        dtype=np.float32,
    )
    d_to_new = (np.linalg.norm(pts, axis=1) ** 2).astype(np.float32)  # new at origin
    order = np.argsort(d_to_new)
    cand_d = jnp.asarray(d_to_new[order][None])
    cand_i = jnp.asarray(order[None].astype(np.int32))
    sel = np.asarray(
        gops.select_neighbors_diverse(
            cand_d, cand_i, jnp.asarray(pts), jnp.asarray((pts**2).sum(1)), m=3
        )
    )[0]
    sel = sel[sel != INVALID_ID].tolist()
    # diversity picks lead: nearest overall, then nearest of the opposite
    # cluster; shadowed candidates only appear later as fill
    assert sel[0] == 0 and sel[1] == 3
    assert len(sel) == 3  # fill tops up to m


def test_select_neighbors_diverse_matches_sequential_oracle():
    # the m-step argmax(alive) formulation must reproduce the reference's
    # sequential ef-walk (HNSWNeighborSelection.swift:132) EXACTLY: walk
    # candidates ascending, keep c iff d(c,new) < min over selected s of
    # d(c,s), stop at m; then fill remaining slots with nearest pruned
    rng = np.random.default_rng(123)
    c, ef, d, m = 7, 24, 8, 5
    pts = rng.standard_normal((64, d)).astype(np.float32)
    sqn = (pts**2).sum(1).astype(np.float32)
    new_pts = rng.standard_normal((c, d)).astype(np.float32)
    cand_i = np.stack(
        [rng.choice(64, ef, replace=False) for _ in range(c)]
    ).astype(np.int32)
    cand_d = ((pts[cand_i] - new_pts[:, None]) ** 2).sum(-1).astype(np.float32)
    order = np.argsort(cand_d, axis=1, kind="stable")
    cand_d = np.take_along_axis(cand_d, order, axis=1)
    cand_i = np.take_along_axis(cand_i, order, axis=1)
    # pad a few invalid entries at the tail
    cand_d[:, -3:] = np.inf
    cand_i[:, -3:] = INVALID_ID

    got = np.asarray(
        gops.select_neighbors_diverse(
            jnp.asarray(cand_d), jnp.asarray(cand_i), jnp.asarray(pts),
            jnp.asarray(sqn), m=m,
        )
    )
    for row in range(c):
        sel: list[int] = []
        for j in range(ef):
            if cand_i[row, j] == INVALID_ID or len(sel) >= m:
                continue
            dmin = min(
                (
                    max(
                        sqn[cand_i[row, j]] + sqn[s]
                        - 2.0 * float(pts[cand_i[row, j]] @ pts[s]),
                        0.0,
                    )
                    for s in sel
                ),
                default=np.inf,
            )
            if cand_d[row, j] < dmin:
                sel.append(int(cand_i[row, j]))
        # fill with nearest pruned (candidates are distance-sorted)
        fill = [
            int(v)
            for v in cand_i[row]
            if v != INVALID_ID and int(v) not in sel
        ]
        want = (sel + fill)[:m]
        assert got[row].tolist() == want


def test_prune_neighbors_respects_m():
    x = _data(20, 4, seed=4)
    lists = np.tile(np.arange(1, 11, dtype=np.int32), (2, 1))
    out = np.asarray(
        gops.prune_neighbors(
            jnp.asarray([0, 5], dtype=jnp.int32),
            jnp.asarray(lists),
            jnp.asarray(x),
            jnp.asarray((x**2).sum(1)),
            m=4,
        )
    )
    assert out.shape == (2, 4)
    assert (out[out != INVALID_ID] >= 0).all()


# -- index --


def test_hnsw_recall_floor():
    """Reference HNSWRecallTests: n=300, d=32, k=5 floor."""
    x = _data(300, 32, seed=10)
    idx = HNSWIndex(32, config=HNSWConfig(m=16, ef_construction=64, ef_search=64))
    idx.insert_batch([f"v{i}" for i in range(300)], x)
    q = x[:40]
    truth = np.argsort(((q[:, None] - x[None]) ** 2).sum(-1), axis=1)[:, :5]
    res = idx.batch_search(q, 5)
    hits = sum(
        len({r.id for r in row} & {f"v{i}" for i in truth[b]})
        for b, row in enumerate(res)
    )
    recall = hits / 200
    assert recall >= 0.9, f"recall {recall}"


def test_hnsw_self_query_top1():
    x = _data(200, 16, seed=11)
    idx = HNSWIndex(16)
    idx.insert_batch(list(range(200)), x)
    res = idx.batch_search(x[:20], 1)
    top1 = np.mean([row[0].id == i for i, row in enumerate(res)])
    assert top1 >= 0.95


def test_hnsw_ef_monotone():
    """Reference HNSWParamSweepTests: recall should not degrade with ef."""
    x = _data(400, 16, seed=12)
    q = x[:30] + 0.01 * _data(30, 16, seed=13)
    truth = np.argsort(((q[:, None] - x[None]) ** 2).sum(-1), axis=1)[:, :5]
    recalls = []
    for ef in (8, 64):
        idx = HNSWIndex(16, config=HNSWConfig(ef_search=ef, ef_construction=64))
        idx.insert_batch(list(range(400)), x)
        res = idx.batch_search(q, 5)
        hits = sum(
            len({r.id for r in row} & set(truth[b].tolist()))
            for b, row in enumerate(res)
        )
        recalls.append(hits / 150)
    assert recalls[1] >= recalls[0] - 0.05


def test_hnsw_remove_tombstone_and_compact():
    x = _data(150, 8, seed=14)
    idx = HNSWIndex(8)
    idx.insert_batch(list(range(150)), x)
    assert idx.search(x[7], 1)[0].id == 7
    idx.remove(7)
    assert idx.search(x[7], 1)[0].id != 7
    assert idx.count == 149
    idx.compact()
    assert idx.count == 149
    assert idx.search(x[8], 1)[0].id == 8


def test_hnsw_metrics_ip_cosine():
    x = _data(200, 16, seed=15)
    for metric in (Metric.INNER_PRODUCT, Metric.COSINE):
        idx = HNSWIndex(16, metric=metric, config=HNSWConfig(ef_search=64))
        idx.insert_batch(list(range(200)), x)
        q = x[3]
        res = idx.search(q, 5)
        if metric == Metric.INNER_PRODUCT:
            ref = set(np.argsort(-(x @ q))[:5].tolist())
        else:
            ref = set(
                np.argsort(
                    -(x @ q) / (np.linalg.norm(x, axis=1) * np.linalg.norm(q))
                )[:5].tolist()
            )
        got = {r.id for r in res}
        assert len(got & ref) >= 3


def test_hnsw_scores_are_true_metric():
    x = _data(100, 8, seed=16)
    idx = HNSWIndex(8)
    idx.insert_batch(list(range(100)), x)
    q = x[5] + 0.1
    res = idx.search(q, 3)
    for r in res:
        expect = float(np.linalg.norm(x[r.id] - q))
        assert abs(r.score - expect) < 1e-4


def test_hnsw_filter_and_metadata():
    x = _data(120, 8, seed=17)
    idx = HNSWIndex(8)
    idx.insert_batch(
        list(range(120)), x, [{"even": i % 2 == 0} for i in range(120)]
    )
    res = idx.search(x[0], 5, filter=lambda m: m and m["even"])
    assert len(res) > 0
    assert all(r.metadata["even"] for r in res)


def test_hnsw_persistence_rebuild(tmp_path):
    x = _data(150, 8, seed=18)
    idx = HNSWIndex(8)
    idx.insert_batch(list(range(150)), x)
    p = str(tmp_path / "hnsw.json")
    idx.save(p)
    idx2 = HNSWIndex.load(p)
    assert idx2.count == 150
    # graph rebuilt by reinsertion → same recall behavior, maybe same results
    r2 = idx2.search(x[9], 3)
    assert r2[0].id == 9


def test_hnsw_duplicate_and_errors():
    from vectorindex_tpu.utils.errors import IndexError, IndexErrorKind

    idx = HNSWIndex(4)
    idx.insert("a", np.ones(4))
    with pytest.raises(IndexError) as ei:
        idx.insert("a", np.ones(4))
    assert ei.value.kind == IndexErrorKind.DUPLICATE_ID
    with pytest.raises(IndexError):
        idx.insert("b", np.ones(5))
    with pytest.raises(IndexError):
        HNSWIndex(4, metric=Metric.MANHATTAN)


def test_hnsw_statistics():
    x = _data(100, 8, seed=19)
    idx = HNSWIndex(8, config=HNSWConfig(m=8))
    idx.insert_batch(list(range(100)), x)
    st = idx.statistics()
    assert st.count == 100
    assert st.details["avg_degree_l0"] > 1
    assert st.details["max_level"] >= 0


def test_ip_recall_at_scale():
    """INNER_PRODUCT routing must be MIPS-correct at real scale (round-1
    VERDICT weak #6 / next-round #6b: 'recall test at n >= 10k'). Routing =
    virtual MIPS transform (uniform R^2 sqnorms -> IP ordering,
    MIPSTransform.swift:204) + ip-NSW plain nearest-m selection."""
    rng = np.random.default_rng(0)
    n, d = 10_000, 32
    # heterogeneous norms -- the regime where raw-L2 routing breaks for IP
    x = (
        rng.standard_normal((n, d)) * rng.uniform(0.2, 3.0, (n, 1))
    ).astype(np.float32)
    q = rng.standard_normal((40, d)).astype(np.float32)
    truth = np.argsort(-(q @ x.T), axis=1)[:, :10]
    idx = HNSWIndex(
        32,
        metric=Metric.INNER_PRODUCT,
        config=HNSWConfig(m=12, ef_construction=100, ef_search=128),
    )
    idx.insert_batch(list(range(n)), x)
    res = idx.batch_search(q, k=10)
    rec = np.mean(
        [
            len(set(r.id for r in res[i]) & set(truth[i].tolist())) / 10
            for i in range(len(q))
        ]
    )
    assert rec >= 0.93, f"IP recall@10 {rec:.3f} below floor at n=10k"
