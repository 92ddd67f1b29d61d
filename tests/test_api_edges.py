"""API edge cases across index families.

Parity model: reference FlatIndexEdgeCasesTests.swift (k=0, k>count clamp,
dimension mismatches), HNSWBatchAndErrorsTests.swift (batch mismatch,
remove-nonexistent, compact), PersistenceEdgeTests.swift (empty round-trip,
save-without-optimize, wrong-type load, corrupt JSON), IVFMoreTests.swift
(linear scan before optimize, nprobe clamp, metric variants), StatsTests /
APIPolishTests (contains/update/batch/remove across families).
"""

import json

import numpy as np
import pytest

from vectorindex_tpu.models.flat import FlatIndex
from vectorindex_tpu.models.hnsw import HNSWConfig, HNSWIndex
from vectorindex_tpu.models.ivf import IVFConfig, IVFIndex, IVFPQConfig, IVFPQIndex
from vectorindex_tpu.utils.config import Metric
from vectorindex_tpu.utils.errors import IndexError as VectorIndexError

D = 16
HCFG = HNSWConfig(m=4, ef_construction=32, build_chunk=32)
ICFG = IVFConfig(nlist=4, nprobe=2)


def _mk_flat():
    return FlatIndex(D)


def _mk_hnsw():
    return HNSWIndex(D, Metric.L2, HCFG)


def _mk_ivf():
    return IVFIndex(D, Metric.L2, ICFG)


FAMILIES = [_mk_flat, _mk_hnsw, _mk_ivf]


def _fill(idx, n=30, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((n, D)).astype(np.float32)
    for i in range(n):
        idx.insert(f"v{i}", x[i])
    return x


# ---------------------------------------------------------------------------
# k edge cases (FlatIndexEdgeCasesTests)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("mk", FAMILIES)
def test_k_zero_returns_empty(mk):
    idx = mk()
    _fill(idx)
    assert idx.search(np.zeros(D, np.float32), 0) == []


@pytest.mark.parametrize("mk", FAMILIES)
def test_k_negative_returns_empty(mk):
    idx = mk()
    _fill(idx)
    assert idx.search(np.zeros(D, np.float32), -3) == []


@pytest.mark.parametrize("mk", FAMILIES)
def test_k_greater_than_count_clamps(mk):
    idx = mk()
    x = _fill(idx, n=7)
    res = idx.search(x[0], 50)
    assert len(res) == 7
    assert res[0].id == "v0"
    ids = [r.id for r in res]
    assert len(set(ids)) == 7  # no duplicates when clamped


@pytest.mark.parametrize("mk", FAMILIES)
def test_search_empty_index_returns_empty(mk):
    idx = mk()
    assert idx.search(np.zeros(D, np.float32), 5) == []
    assert idx.batch_search(np.zeros((3, D), np.float32), 5) == [[], [], []]


# ---------------------------------------------------------------------------
# dimension mismatches (Flat + HNSW batch variants)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("mk", FAMILIES)
def test_batch_search_dimension_mismatch_raises(mk):
    idx = mk()
    _fill(idx)
    with pytest.raises(VectorIndexError):
        idx.batch_search(np.zeros((4, D + 3), np.float32), 5)


@pytest.mark.parametrize("mk", FAMILIES)
def test_insert_batch_dimension_mismatch_raises(mk):
    idx = mk()
    with pytest.raises(VectorIndexError):
        idx.insert_batch(["a", "b"], np.zeros((2, D - 1), np.float32))


# ---------------------------------------------------------------------------
# remove / update semantics (HNSWBatchAndErrorsTests, APIPolishTests)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("mk", FAMILIES)
def test_remove_nonexistent_raises_not_found(mk):
    idx = mk()
    _fill(idx, n=5)
    with pytest.raises(VectorIndexError):
        idx.remove("nope")


@pytest.mark.parametrize("mk", FAMILIES)
def test_update_metadata_only_keeps_vector(mk):
    idx = mk()
    x = _fill(idx, n=10)
    idx.update("v3", metadata={"tag": "new"})
    res = idx.search(x[3], 1)
    assert res[0].id == "v3"
    assert res[0].metadata == {"tag": "new"}


@pytest.mark.parametrize("mk", FAMILIES)
def test_update_vector_repositions(mk):
    idx = mk()
    x = _fill(idx, n=12)
    target = x[7] + 5.0  # move far away
    idx.update("v0", vector=target)
    res = idx.search(target, 1)
    assert res[0].id == "v0"


@pytest.mark.parametrize("mk", FAMILIES)
def test_contains_tracks_insert_remove(mk):
    idx = mk()
    _fill(idx, n=4)
    assert idx.contains("v2")
    idx.remove("v2")
    assert not idx.contains("v2")
    assert idx.count == 3


def test_hnsw_compact_reduces_deleted():
    idx = _mk_hnsw()
    x = _fill(idx, n=40)
    for i in range(0, 40, 2):
        idx.remove(f"v{i}")
    before = idx.statistics()
    idx.compact()
    after = idx.statistics()
    assert after.count == 20
    assert after.memory_bytes <= before.memory_bytes
    res = idx.search(x[1], 3)
    assert res[0].id == "v1"


def test_ivf_remove_updates_lists():
    """Reference IVFListMaintenanceTests.testRemoveUpdatesLists."""
    idx = _mk_ivf()
    x = _fill(idx, n=32)
    idx.optimize()
    idx.remove("v5")
    res = idx.search(x[5], 32)
    assert all(r.id != "v5" for r in res)
    assert idx.count == 31


def test_ivf_update_moves_between_lists():
    """Reference IVFListMaintenanceTests.testReplaceMovesBetweenLists."""
    rng = np.random.default_rng(3)
    idx = _mk_ivf()
    # two well-separated clumps -> distinct lists
    a = rng.standard_normal((16, D)).astype(np.float32) + 20.0
    b = rng.standard_normal((16, D)).astype(np.float32) - 20.0
    for i in range(16):
        idx.insert(f"a{i}", a[i])
        idx.insert(f"b{i}", b[i])
    idx.optimize()
    idx.update("a0", vector=b[0] + 0.01)
    res = idx.search(b[0], 2)
    assert "a0" in {r.id for r in res}


# ---------------------------------------------------------------------------
# persistence edges (PersistenceEdgeTests)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("mk", FAMILIES)
def test_empty_round_trip(mk, tmp_path):
    idx = mk()
    p = str(tmp_path / "empty.json")
    idx.save(p)
    loaded = type(idx).load(p)
    assert loaded.count == 0
    assert loaded.search(np.zeros(D, np.float32), 3) == []


def test_ivf_save_without_optimize_then_load(tmp_path):
    idx = _mk_ivf()
    x = _fill(idx, n=20)
    p = str(tmp_path / "untrained.json")
    idx.save(p)  # never optimized: linear-scan state
    loaded = IVFIndex.load(p)
    res = loaded.search(x[4], 1)
    assert res[0].id == "v4"


def test_load_wrong_type_raises(tmp_path):
    idx = _mk_flat()
    _fill(idx, n=5)
    p = str(tmp_path / "flat.json")
    idx.save(p)
    with pytest.raises(VectorIndexError):
        HNSWIndex.load(p)


def test_load_corrupted_json_raises(tmp_path):
    p = tmp_path / "corrupt.json"
    p.write_text('{"type": "flat", "records": [truncated')
    with pytest.raises((VectorIndexError, json.JSONDecodeError, ValueError)):
        FlatIndex.load(str(p))


def test_load_missing_file_raises(tmp_path):
    with pytest.raises((VectorIndexError, FileNotFoundError)):
        FlatIndex.load(str(tmp_path / "does-not-exist.json"))


@pytest.mark.parametrize("mk", FAMILIES)
def test_round_trip_preserves_metadata_and_results(mk, tmp_path):
    idx = mk()
    rng = np.random.default_rng(8)
    x = rng.standard_normal((25, D)).astype(np.float32)
    for i in range(25):
        idx.insert(f"v{i}", x[i], {"i": i})
    p = str(tmp_path / "rt.json")
    idx.save(p)
    loaded = type(idx).load(p)
    assert loaded.count == 25
    r = loaded.search(x[9], 1)[0]
    assert r.id == "v9" and r.metadata == {"i": 9}


# ---------------------------------------------------------------------------
# IVF behavior edges (IVFMoreTests)
# ---------------------------------------------------------------------------


def test_ivf_linear_scan_before_optimize():
    idx = _mk_ivf()
    x = _fill(idx, n=25)
    res = idx.search(x[11], 3)  # untrained -> exact scan fallback
    assert res[0].id == "v11"


def test_ivf_nprobe_clamps_to_nlist():
    idx = IVFIndex(D, Metric.L2, IVFConfig(nlist=4, nprobe=64))
    x = _fill(idx, n=40)
    idx.optimize()
    res = idx.search(x[0], 5)  # nprobe > nlist must clamp, not crash
    assert res[0].id == "v0"


def test_ivf_reoptimize_after_growth():
    idx = _mk_ivf()
    x = _fill(idx, n=16)
    idx.optimize()
    rng = np.random.default_rng(5)
    y = rng.standard_normal((30, D)).astype(np.float32)
    for i in range(30):
        idx.insert(f"w{i}", y[i])
    idx.optimize()  # retrain with the grown corpus
    res = idx.search(y[12], 1)
    assert res[0].id == "w12"


def test_ivfpq_end_to_end_small():
    cfg = IVFPQConfig(nlist=4, nprobe=4, m=4, ks=16, train_iters=8)
    idx = IVFPQIndex(D, Metric.L2, cfg)
    x = _fill(idx, n=64, seed=12)
    idx.optimize()
    hits = sum(idx.search(x[i], 4)[0].id == f"v{i}" for i in range(0, 64, 7))
    assert hits >= 8  # 10 probes; PQ4x16 on 16-d is lossy but near-exact here


# ---------------------------------------------------------------------------
# stats details (StatsTests)
# ---------------------------------------------------------------------------


def test_stats_details_per_family():
    f = _mk_flat()
    _fill(f, n=9)
    sf = f.statistics()
    assert sf.count == 9 and sf.dimension == D and sf.memory_bytes > 0

    h = _mk_hnsw()
    _fill(h, n=40)
    sh = h.statistics()
    assert sh.details["max_level"] >= 0
    assert sh.details["avg_degree_l0"] > 0
    assert sh.details["m"] == HCFG.m

    i = _mk_ivf()
    _fill(i, n=40)
    i.optimize()
    si = i.statistics()
    assert si.details["nlist"] == ICFG.nlist
    assert si.details["trained"] in (True, 1)


def test_load_index_dispatches_containers(tmp_path):
    """load_index must open binary containers too (flat + hnsw tiers)."""
    from vectorindex_tpu.models import load_index

    f = _mk_flat()
    x = _fill(f, n=12)
    pf = str(tmp_path / "f.vx")
    f.save_container(pf)
    lf = load_index(pf)
    assert type(lf).__name__ == "FlatIndex" and lf.count == 12
    assert lf.search(x[2], 1)[0].id == "v2"

    h = _mk_hnsw()
    y = _fill(h, n=30)
    h.statistics()
    ph = str(tmp_path / "h.vx")
    h.save_container(ph)
    lh = load_index(ph)
    assert type(lh).__name__ == "HNSWIndex"
    assert lh.search(y[4], 1)[0].id == "v4"


def test_load_index_dispatches_durable_ivf(tmp_path):
    from vectorindex_tpu.models import load_index

    idx = _mk_ivf()
    x = _fill(idx, n=24)
    idx.optimize()
    p = str(tmp_path / "ivf.vx")
    idx.enable_durable(p)
    idx.insert("extra", x[0] + 0.5)
    del idx
    loaded = load_index(p)
    assert type(loaded).__name__ in ("IVFIndex", "IVFPQIndex")
    assert loaded.contains("extra")
    assert loaded.search(x[3], 1)[0].id == "v3"
