"""IVF ops + IVFIndex: select correctness, CSR store invariants, probed
search vs brute force, recall monotonicity in nprobe (reference
IVFRecallTests, IVFProbeMonotonicTests, IVFListMaintenanceTests)."""

import jax.numpy as jnp
import numpy as np
import pytest

from vectorindex_tpu.models.ivf import IVFConfig, IVFIndex
from vectorindex_tpu.ops import ivf as ivf_ops
from vectorindex_tpu.utils.config import Metric


def _data(n=400, d=16, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n, d)).astype(np.float32)


# -- ops level --


def test_ivf_select_matches_bruteforce():
    rng = np.random.default_rng(1)
    cents = rng.standard_normal((32, 8)).astype(np.float32)
    q = rng.standard_normal((5, 8)).astype(np.float32)
    d, ids = ivf_ops.ivf_select(jnp.asarray(q), jnp.asarray(cents), nprobe=4)
    ref = np.argsort(((q[:, None, :] - cents[None]) ** 2).sum(-1), axis=1)[:, :4]
    np.testing.assert_array_equal(np.asarray(ids), ref)


def test_ivf_select_disabled_lists():
    rng = np.random.default_rng(2)
    cents = rng.standard_normal((8, 4)).astype(np.float32)
    q = rng.standard_normal((3, 4)).astype(np.float32)
    disabled = jnp.asarray([True, False] * 4)
    _, ids = ivf_ops.ivf_select(
        jnp.asarray(q), jnp.asarray(cents), nprobe=4, disabled=disabled
    )
    assert np.all(np.asarray(ids) % 2 == 1)


def test_list_store_pack_and_stats():
    store = ivf_ops.IVFListStore(4, 8)
    rng = np.random.default_rng(3)
    for i in range(40):
        store.append(i % 4, i, rng.standard_normal(8).astype(np.float32))
    arrays = store.sync_device()
    st = store.list_stats()
    assert st["total"] == 40
    assert st["max_len"] == 10
    assert np.asarray(arrays.lengths).sum() == 40
    # rows carry their internal ids
    ids0, vecs0 = store.read_list(0)
    start0 = int(np.asarray(arrays.starts)[0])
    np.testing.assert_array_equal(
        np.asarray(arrays.row_ids)[start0 : start0 + 10], ids0
    )


def test_list_store_remove_and_incremental_append():
    store = ivf_ops.IVFListStore(2, 4)
    v = np.ones(4, np.float32)
    store.append(0, 1, v)
    store.append(0, 2, 2 * v)
    store.sync_device()
    # in-capacity append after sync uses the fast path
    store.append(0, 3, 3 * v)
    arrays = store.sync_device()
    assert int(np.asarray(arrays.lengths)[0]) == 3
    assert store.remove(0, 2)
    assert not store.remove(0, 99)
    arrays = store.sync_device()
    assert int(np.asarray(arrays.lengths)[0]) == 2


def test_ivf_search_flat_exact_within_probed():
    # nprobe == nlist → results must equal exact brute force
    x = _data(300, 8)
    from vectorindex_tpu.ops import kmeans as km
    from vectorindex_tpu.ops import rng as vrng

    res = km.kmeans(jnp.asarray(x), km.KMeansConfig(k=8, iters=10, seed=0))
    store = ivf_ops.IVFListStore(8, 8)
    store.append_batch(np.asarray(res.assignments), np.arange(300), x)
    arrays = store.sync_device()
    q = _data(6, 8, seed=9)
    d, ids = ivf_ops.ivf_search_flat(
        jnp.asarray(q),
        res.centroids,
        arrays,
        nprobe=8,
        probe_cap=ivf_ops.probe_cap_for(store.max_length),
        k=5,
    )
    ref = np.argsort(((q[:, None, :] - x[None]) ** 2).sum(-1), axis=1)[:, :5]
    np.testing.assert_array_equal(np.sort(np.asarray(ids), 1), np.sort(ref, 1))


def test_rerank_exact_topk():
    x = _data(50, 8)
    sqn = (x**2).sum(1)
    q = _data(3, 8, seed=5)
    cands = np.tile(np.arange(50, dtype=np.int32), (3, 1))
    d, ids = ivf_ops.rerank_exact_topk(
        jnp.asarray(q), jnp.asarray(cands), jnp.asarray(x), jnp.asarray(sqn), k=4
    )
    ref = np.argsort(((q[:, None, :] - x[None]) ** 2).sum(-1), axis=1)[:, :4]
    np.testing.assert_array_equal(np.asarray(ids), ref)


def test_rerank_with_missing_sentinels():
    x = _data(20, 4)
    sqn = (x**2).sum(1)
    q = _data(1, 4, seed=6)
    cands = np.full((1, 8), ivf_ops.INVALID_ID, dtype=np.int32)
    cands[0, :3] = [5, 7, 9]
    d, ids = ivf_ops.rerank_exact_topk(
        jnp.asarray(q), jnp.asarray(cands), jnp.asarray(x), jnp.asarray(sqn), k=8
    )
    ids = np.asarray(ids)
    assert set(ids[0, :3].tolist()) == {5, 7, 9}
    assert np.all(ids[0, 3:] == ivf_ops.INVALID_ID)


# -- index level --


def test_ivf_index_end_to_end_recall():
    x = _data(400, 16)
    idx = IVFIndex(16, config=IVFConfig(nlist=16, nprobe=16))
    idx.insert_batch([f"v{i}" for i in range(400)], x)
    idx.optimize()
    # nprobe == nlist: exact
    res = idx.search(x[7], k=5)
    assert res[0].id == "v7"
    ref = np.argsort(np.linalg.norm(x - x[7], axis=1))[:5]
    assert {r.id for r in res} == {f"v{i}" for i in ref}


def test_ivf_recall_monotone_in_nprobe():
    """Reference IVFProbeMonotonicTests: recall monotone in nprobe."""
    x = _data(400, 16, seed=11)
    q = x[:40] + 0.01 * _data(40, 16, seed=12)
    truth = np.argsort(
        ((q[:, None, :] - x[None]) ** 2).sum(-1), axis=1
    )[:, :5]
    recalls = []
    for nprobe in (1, 4, 16):
        idx = IVFIndex(16, config=IVFConfig(nlist=16, nprobe=nprobe))
        idx.insert_batch(list(range(400)), x)
        idx.optimize()
        results = idx.batch_search(q, k=5)
        hits = 0
        for b, row in enumerate(results):
            hits += len({r.id for r in row} & set(truth[b].tolist()))
        recalls.append(hits / (40 * 5))
    assert recalls[0] <= recalls[1] + 0.05
    assert recalls[1] <= recalls[2] + 0.05
    assert recalls[2] >= 0.99  # nprobe == nlist is exact


def test_ivf_untrained_falls_back_to_exact():
    x = _data(50, 8)
    idx = IVFIndex(8, config=IVFConfig(nlist=4))
    idx.insert_batch(list(range(50)), x)
    res = idx.search(x[3], k=3)
    assert res[0].id == 3


def test_ivf_insert_after_train_and_remove():
    x = _data(200, 8)
    idx = IVFIndex(8, config=IVFConfig(nlist=8, nprobe=8))
    idx.insert_batch(list(range(150)), x[:150])
    idx.optimize()
    # post-train inserts are assigned immediately
    idx.insert_batch(list(range(150, 200)), x[150:])
    res = idx.search(x[180], k=1)
    assert res[0].id == 180
    idx.remove(180)
    res = idx.search(x[180], k=1)
    assert res[0].id != 180
    st = idx.statistics()
    assert st.details["assigned"] == 199


def test_ivf_update_reassigns():
    x = _data(100, 8)
    idx = IVFIndex(8, config=IVFConfig(nlist=4, nprobe=4))
    idx.insert_batch(list(range(100)), x)
    idx.optimize()
    idx.update(5, vector=x[50] + 5.0)
    res = idx.search(x[50] + 5.0, k=1)
    assert res[0].id == 5


def test_ivf_metrics_ip_cosine():
    x = _data(200, 8, seed=20)
    for metric in (Metric.INNER_PRODUCT, Metric.COSINE):
        idx = IVFIndex(8, metric=metric, config=IVFConfig(nlist=8, nprobe=8))
        idx.insert_batch(list(range(200)), x)
        idx.optimize()
        q = x[9]
        res = idx.search(q, k=5)
        if metric == Metric.INNER_PRODUCT:
            ref = np.argsort(-(x @ q))[:5]
        else:
            ref = np.argsort(
                -(x @ q) / (np.linalg.norm(x, axis=1) * np.linalg.norm(q))
            )[:5]
        assert {r.id for r in res} == set(ref.tolist())


def test_ivf_filter_oversampling():
    x = _data(300, 8, seed=30)
    idx = IVFIndex(8, config=IVFConfig(nlist=8, nprobe=8))
    idx.insert_batch(
        list(range(300)), x, [{"even": i % 2 == 0} for i in range(300)]
    )
    idx.optimize()
    res = idx.search(x[0], k=10, filter=lambda m: m and m["even"])
    assert len(res) == 10
    assert all(r.metadata["even"] for r in res)


def test_ivf_persistence_roundtrip(tmp_path):
    x = _data(200, 8, seed=40)
    idx = IVFIndex(8, config=IVFConfig(nlist=8, nprobe=8))
    idx.insert_batch(list(range(200)), x)
    idx.optimize()
    p = str(tmp_path / "ivf.json")
    idx.save(p)
    idx2 = IVFIndex.load(p)
    assert idx2.count == 200
    assert idx2.trained
    r1 = [r.id for r in idx.search(x[9], k=5)]
    r2 = [r.id for r in idx2.search(x[9], k=5)]
    assert r1 == r2


def test_ivf_unsupported_metric():
    from vectorindex_tpu.utils.errors import IndexError, IndexErrorKind

    with pytest.raises(IndexError) as ei:
        IVFIndex(8, metric=Metric.MANHATTAN)
    assert ei.value.kind == IndexErrorKind.UNSUPPORTED_METRIC


def test_ivf_select_beam_approximates_exhaustive():
    """Reference ivf_select_beam_f32 (IVFSelect.swift:166): beam selection
    over the centroid kNN graph approximates the exhaustive top-nprobe."""
    rng = np.random.default_rng(7)
    cents = jnp.asarray(rng.standard_normal((512, 32)).astype(np.float32))
    q = jnp.asarray(rng.standard_normal((8, 32)).astype(np.float32))
    g = ivf_ops.build_centroid_graph(cents)
    bd, bi = ivf_ops.ivf_select_beam(q, cents, g, nprobe=8)
    ed, ei = ivf_ops.ivf_select(q, cents, nprobe=8)
    bi, ei = np.asarray(bi), np.asarray(ei)
    overlap = np.mean([len(set(bi[b]) & set(ei[b])) / 8 for b in range(8)])
    assert overlap >= 0.85


def test_list_store_timestamps():
    """Reference IVFAppendOpts.timestamps: per-row timestamps ride the CSR
    layout."""
    store = ivf_ops.IVFListStore(2, 4, timestamps=True)
    v = np.ones(4, np.float32)
    store.append(0, 1, v, ts=100)
    store.append(1, 2, v, ts=200)
    store.append_batch([0, 1], [3, 4], np.stack([v, v]), ts=[300, 400])
    arrays = store.sync_device()
    tsarr = np.asarray(arrays.timestamps)
    starts = np.asarray(arrays.starts)
    assert tsarr[starts[0]] == 100 and tsarr[starts[0] + 1] == 300
    assert tsarr[starts[1]] == 200 and tsarr[starts[1] + 1] == 400
    store.remove(0, 1)
    arrays = store.sync_device()
    assert np.asarray(arrays.timestamps)[np.asarray(arrays.starts)[0]] == 300


def test_ivf_ingest_flat_precomputed_assignments():
    """Reference ingestFlat (IVFIndex.swift:180): bulk ingest with external
    assignments, no quantizer pass."""
    x = _data(120, 8, seed=33)
    idx = IVFIndex(8, config=IVFConfig(nlist=4, nprobe=4))
    idx.insert_batch(list(range(60)), x[:60])
    idx.optimize()
    assigns = np.asarray(
        idx._assign_lists(x[60:])
    )  # precompute externally, then ingest without re-assigning
    idx.ingest_flat(list(range(60, 120)), x[60:], assigns)
    assert idx.count == 120
    assert idx.search(x[90], k=1)[0].id == 90
    with pytest.raises(Exception):
        idx.ingest_flat([999], x[:1], [99])  # out-of-range list


def test_store_meta_view_tracks_full_view_under_mutation():
    """Randomized interleaving of appends / removes / syncs: the codes-only
    device view (host-rerank tier) must agree with the full view's CSR
    metadata after EVERY sync — the two views patch independently, so a
    missed pending row or stale starts table shows up as divergence."""
    import numpy as np

    from vectorindex_tpu.ops.ivf import IVFListStore

    rng = np.random.default_rng(99)
    store = IVFListStore(n_lists=6, dim=8)
    next_id = 0
    live = []  # (list_id, internal_id)
    for step in range(200):
        op = rng.random()
        if op < 0.62 or not live:
            l = int(rng.integers(0, 6))
            store.append(l, next_id, rng.standard_normal(8).astype(np.float32))
            live.append((l, next_id))
            next_id += 1
        elif op < 0.75:
            l, iid = live.pop(int(rng.integers(0, len(live))))
            assert store.remove(l, iid)
        if op >= 0.9 or step % 17 == 0:
            full = store.sync_device()
            meta = store.sync_device(with_vecs=False)
            assert meta.vecs is None and meta.sqnorms is None
            np.testing.assert_array_equal(
                np.asarray(meta.row_ids), np.asarray(full.row_ids)
            )
            np.testing.assert_array_equal(
                np.asarray(meta.starts), np.asarray(full.starts)
            )
            np.testing.assert_array_equal(
                np.asarray(meta.lengths), np.asarray(full.lengths)
            )
    # final consistency + live-set check
    meta = store.sync_device(with_vecs=False)
    starts = np.asarray(meta.starts)
    lengths = np.asarray(meta.lengths)
    ids = np.asarray(meta.row_ids)
    got = sorted(
        int(i)
        for l in range(6)
        for i in ids[starts[l] : starts[l] + lengths[l]]
    )
    assert got == sorted(i for _, i in live)


def test_refresh_quantizer_restores_shifted_routing():
    """Streaming inserts from a shifted mode crowd stale lists; a warm-start
    refresh redistributes them (moved rows > 0, max list length drops) and
    search stays correct — without optimize()'s from-scratch retrain."""
    import numpy as np

    from vectorindex_tpu.models.ivf import IVFConfig, IVFIndex
    from vectorindex_tpu.utils.config import Metric

    rng = np.random.default_rng(21)
    n, d = 4000, 16
    x = rng.standard_normal((n, d)).astype(np.float32)
    idx = IVFIndex(d, Metric.L2, IVFConfig(nlist=32, nprobe=8))
    idx.insert_batch(list(range(n)), x)
    idx.optimize()
    # shifted stream: a mode the quantizer never saw
    xnew = (rng.standard_normal((1000, d)) * 0.3 + 4.0).astype(np.float32)
    idx.insert_batch(list(range(n, n + 1000)), xnew)
    idx.batch_search(xnew[:1], 1)  # sync
    stale_max = idx._store.max_length
    out = idx.refresh_quantizer(iters=5)
    assert out["moved_frac"] > 0.0
    assert idx._store.max_length < stale_max  # crowding relieved
    res = idx.batch_search(xnew[:16] + 0.001, 5)
    hit = sum(1 for i, row in enumerate(res) if row and row[0].id == n + i)
    assert hit >= 15
    # old content still routes
    res_old = idx.batch_search(x[:16] + 0.001, 5)
    hit_old = sum(1 for i, row in enumerate(res_old) if row and row[0].id == i)
    assert hit_old >= 15


def test_refresh_quantizer_ivfpq_reencodes():
    """IVF-PQ refresh: codes re-encode against the refreshed centroids with
    the existing codebooks; search serves correctly afterwards."""
    import numpy as np

    from vectorindex_tpu.models.ivf import IVFPQConfig, IVFPQIndex
    from vectorindex_tpu.utils.config import Metric

    rng = np.random.default_rng(23)
    n, d = 2000, 16
    x = rng.standard_normal((n, d)).astype(np.float32)
    idx = IVFPQIndex(d, Metric.L2, IVFPQConfig(nlist=8, nprobe=8, m=4, ks=16))
    idx.insert_batch(list(range(n)), x)
    idx.optimize()
    xnew = (rng.standard_normal((400, d)) * 0.3 + 3.0).astype(np.float32)
    idx.insert_batch(list(range(n, n + 400)), xnew)
    idx.batch_search(xnew[:1], 1)
    out = idx.refresh_quantizer(iters=4)
    assert out["seconds"] >= 0.0
    res = idx.batch_search(xnew[:8] + 0.001, 5)
    hit = sum(1 for i, row in enumerate(res) if row and row[0].id == n + i)
    assert hit >= 7
