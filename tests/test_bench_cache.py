"""bench.cache artifact store: round-trips, mmap sidecars, atomicity."""

import os

import numpy as np
import pytest

from vectorindex_tpu.bench import cache


@pytest.fixture(autouse=True)
def _isolated(tmp_path, monkeypatch):
    monkeypatch.setenv("VECTORINDEX_BENCH_CACHE", str(tmp_path / "bc"))


def test_round_trip_and_build_s():
    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return {"a": np.arange(6, dtype=np.float32).reshape(2, 3)}

    art, was_cached = cache.cached("rt_v1", build)
    assert not was_cached and calls["n"] == 1
    assert "build_s" in art and float(art["build_s"]) >= 0.0
    art2, was_cached2 = cache.cached("rt_v1", build)
    assert was_cached2 and calls["n"] == 1
    np.testing.assert_array_equal(art2["a"], art["a"])
    assert float(art2["build_s"]) == float(art["build_s"])


def test_big_arrays_become_mmap_sidecars(monkeypatch):
    monkeypatch.setattr(cache, "_MMAP_THRESHOLD", 1024)
    big = np.arange(4096, dtype=np.float32).reshape(64, 64)  # 16 KB > 1 KB
    small = np.float64(7.0)

    art, was_cached = cache.cached(
        "mm_v1", lambda: {"x": big, "s": small}
    )
    assert not was_cached
    # the fresh-build return already hands back the memmap view
    assert isinstance(art["x"], np.memmap)
    np.testing.assert_array_equal(np.asarray(art["x"]), big)
    assert os.path.exists(os.path.join(cache.cache_dir(), "mm_v1__x.npy"))

    art2, was_cached2 = cache.cached("mm_v1", lambda: pytest.fail("rebuilt"))
    assert was_cached2
    assert isinstance(art2["x"], np.memmap)
    np.testing.assert_array_equal(np.asarray(art2["x"]), big)
    assert float(art2["s"]) == 7.0
    # memmap views are read-only: accidental mutation must fail loudly
    with pytest.raises((ValueError, OSError)):
        art2["x"][0, 0] = 1.0


def test_small_arrays_stay_in_npz(monkeypatch):
    monkeypatch.setattr(cache, "_MMAP_THRESHOLD", 1 << 30)
    big = np.ones((64, 64), dtype=np.float32)
    art, _ = cache.cached("sm_v1", lambda: {"x": big})
    assert not isinstance(art["x"], np.memmap)
    assert not os.path.exists(os.path.join(cache.cache_dir(), "sm_v1__x.npy"))


def test_missing_sidecar_invalidates_and_rebuilds(monkeypatch):
    monkeypatch.setattr(cache, "_MMAP_THRESHOLD", 1024)
    big = np.ones((64, 64), dtype=np.float32)
    cache.cached("inv_v1", lambda: {"x": big})
    os.remove(os.path.join(cache.cache_dir(), "inv_v1__x.npy"))
    calls = {"n": 0}

    def rebuild():
        calls["n"] += 1
        return {"x": 2.0 * big}

    art, was_cached = cache.cached("inv_v1", rebuild)
    assert not was_cached and calls["n"] == 1
    np.testing.assert_array_equal(np.asarray(art["x"]), 2.0 * big)
