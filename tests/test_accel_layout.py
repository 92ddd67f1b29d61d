"""Acceleration seam + layout transforms + bench harness (reference
AccelerableIndex tests, LayoutTransformsTests — SURVEY.md §4)."""

import numpy as np
import pytest

from vectorindex_tpu.models import FlatIndex, HNSWIndex, IVFConfig, IVFIndex
from vectorindex_tpu.models import accel
from vectorindex_tpu.ops import layout
from vectorindex_tpu.utils.config import Metric


def _flat(n=600, d=16, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((n, d)).astype(np.float32)
    idx = FlatIndex(d)
    idx.insert_batch([f"v{i}" for i in range(n)], x)
    return idx, x


def test_snapshot_roundtrip():
    idx, x = _flat()
    idx.remove("v3")
    snap = accel.snapshot(idx)
    assert snap.vectors.shape[0] == 599
    assert "v3" not in snap.external_ids
    # snapshot is a copy
    snap.vectors[0] = 0
    assert idx.search(x[0], 1)[0].id == "v0"


def test_flat_candidates_and_finalize():
    idx, x = _flat()
    cands = accel.get_candidates(idx, x[0])
    assert cands.count == 600
    # externally compute distances (the "accelerator") then finalize
    d = ((cands.vectors - x[0]) ** 2).sum(-1)
    res = accel.finalize_results(idx, cands.internal_ids, d, k=5)
    assert res[0].id == "v0"
    ref = np.argsort(np.linalg.norm(x - x[0], axis=1))[:5]
    assert [r.id for r in res] == [f"v{i}" for i in ref]
    assert res[0].score == pytest.approx(0.0, abs=1e-4)


def test_ivf_structure_and_candidates():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((400, 8)).astype(np.float32)
    idx = IVFIndex(8, config=IVFConfig(nlist=8, nprobe=2))
    idx.insert_batch(list(range(400)), x)
    idx.optimize()
    st = accel.get_index_structure(idx)
    assert st.trained and st.centroids.shape == (8, 8)
    assert st.list_lengths.sum() == 400
    cands = accel.get_candidates(idx, x[5])
    assert 0 < cands.count <= 400
    assert 5 in cands.internal_ids  # own list probed


def test_hnsw_structure_export():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((200, 8)).astype(np.float32)
    idx = HNSWIndex(8)
    idx.insert_batch(list(range(200)), x)
    st = accel.get_index_structure(idx)
    assert st.max_level >= 0
    assert st.entry_point >= 0
    assert st.levels[0]["neighbors"].shape[0] == 200
    assert st.m == 16


def test_should_accelerate_thresholds():
    idx, _ = _flat(n=600, d=16)
    assert accel.should_accelerate(idx, n_queries=100, k=10)
    small = FlatIndex(4)
    small.insert("a", np.ones(4))
    assert not accel.should_accelerate(small, n_queries=1, k=1)


def test_finalize_respects_filter():
    idx, x = _flat(n=100)
    for i in range(100):
        idx.update(f"v{i}", metadata={"even": i % 2 == 0})
    cands = accel.get_candidates(idx, x[0])
    d = ((cands.vectors - x[0]) ** 2).sum(-1)
    res = accel.finalize_results(
        idx, cands.internal_ids, d, k=5, filter=lambda m: m and m["even"]
    )
    assert len(res) == 5
    assert all(r.metadata["even"] for r in res)


# -- layout --


def test_padded_dimension():
    assert layout.padded_dimension(1) == 128
    assert layout.padded_dimension(128) == 128
    assert layout.padded_dimension(129) == 256
    assert layout.padded_dimension(5, multiple=16) == 16


def test_vecs_interleave_roundtrip():
    x = np.arange(64, dtype=np.float32).reshape(16, 4)
    b = layout.vecs_interleave(x, r=8)
    assert b.shape == (2, 4, 8)
    np.testing.assert_array_equal(layout.vecs_deinterleave(b), x)
    # AoSoA invariant: block 0, dim j holds rows 0..7's j-th feature
    np.testing.assert_array_equal(b[0, 1], x[:8, 1])


def test_pq_codes_interleave_roundtrip():
    codes = np.arange(48, dtype=np.uint8).reshape(16, 3)
    b = layout.pq_codes_interleave(codes, g=4)
    assert b.shape == (4, 3, 4)
    np.testing.assert_array_equal(layout.pq_codes_deinterleave(b), codes)


def test_pad_rows_to():
    x = np.ones((5, 3), np.float32)
    p, n = layout.pad_rows_to(x, 4)
    assert p.shape == (8, 3) and n == 5
    assert (p[5:] == 0).all()


def test_prefetch_noops():
    from vectorindex_tpu.ops.prefetch import prefetch_read, prefetch_write

    prefetch_read(np.ones(4), 0, 8)
    prefetch_write(None)


# -- bench harness --


def test_bench_harness_flat():
    from vectorindex_tpu.bench.harness import bench_index, make_run

    res = bench_index(
        lambda: FlatIndex(16), "flat", 500, 16, 5, 20, Metric.L2, trials=1
    )
    assert res.recall_avg == 1.0
    assert res.qps > 0
    run = make_run([res])
    assert run.schema_version == 1
    assert run.results[0]["index"] == "flat"
    assert "devices" in run.host


# -- dataset formats --


def test_fvecs_roundtrip(tmp_path):
    from vectorindex_tpu.bench.datagen import read_fvecs, write_fvecs

    x = np.random.default_rng(0).standard_normal((10, 7)).astype(np.float32)
    p = str(tmp_path / "x.fvecs")
    write_fvecs(p, x)
    got = read_fvecs(p)
    np.testing.assert_array_equal(got, x)
    got2 = read_fvecs(p, max_rows=4)
    np.testing.assert_array_equal(got2, x[:4])


def test_bvecs_and_ivecs(tmp_path):
    from vectorindex_tpu.bench.datagen import read_bvecs, read_ivecs

    rng = np.random.default_rng(1)
    # hand-write a bvecs file: dim header int32 + uint8 payload
    b = rng.integers(0, 256, (5, 12)).astype(np.uint8)
    pb = str(tmp_path / "x.bvecs")
    with open(pb, "wb") as f:
        for row in b:
            f.write(np.int32(12).tobytes())
            f.write(row.tobytes())
    np.testing.assert_array_equal(read_bvecs(pb), b.astype(np.float32))
    # ivecs ground truth
    ids = rng.integers(0, 1000, (6, 10)).astype(np.int32)
    pi = str(tmp_path / "gt.ivecs")
    with open(pi, "wb") as f:
        for row in ids:
            f.write(np.int32(10).tobytes())
            f.write(row.tobytes())
    np.testing.assert_array_equal(read_ivecs(pi), ids)
