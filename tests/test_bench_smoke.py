"""bench.py path smoke tests at tiny shapes (CPU, in the core group).

VERDICT r2 item 9: bench regressions must be caught by CI, not by the
driver timeout. Each config function runs end-to-end with toy sizes and
must return a well-formed result dict (metric/value/unit/vs_baseline).
The artifact cache is pointed at a tmpdir so tests never touch (or
pollute) the real .benchcache.
"""

import json
import sys

import numpy as np
import pytest


@pytest.fixture(autouse=True)
def _isolated_cache(tmp_path, monkeypatch):
    monkeypatch.setenv("VECTORINDEX_BENCH_CACHE", str(tmp_path / "bc"))


def _load_bench():
    import importlib.util
    import os

    path = os.path.join(os.path.dirname(__file__), "..", "bench.py")
    spec = importlib.util.spec_from_file_location("bench_main", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


REQUIRED = ("metric", "value", "unit", "vs_baseline")


def _check(out):
    for k in REQUIRED:
        assert k in out, f"missing {k}"
    json.dumps(out)  # must be a single JSON-serializable line
    assert np.isfinite(out["value"])


def test_bench_flat_smoke():
    bench = _load_bench()
    out = bench.bench_flat(iters=2, n=4096, d=32, b=16)
    _check(out)
    assert out["recall_at_10"] > 0.9  # exact path at toy scale


def test_bench_adc_smoke():
    bench = _load_bench()
    out = bench.bench_adc(iters=2, n=4096, d=32, b=16)
    _check(out)
    assert "encode_rows_per_s" in out


def test_bench_ivf_smoke():
    bench = _load_bench()
    out = bench.bench_ivf(iters=2, n=6000, d=32, nlist=8, b=4)
    _check(out)
    assert [p["nprobe"] for p in out["sweep"]] == [1, 8, 32]
    # cache round-trip: second call must reuse the k-means artifact
    out2 = bench.bench_ivf(iters=2, n=6000, d=32, nlist=8, b=4)
    assert out2["build_cached"] is True
    assert out2["kmeans_train_s"] == out["kmeans_train_s"]


def test_bench_ivfpq_smoke():
    bench = _load_bench()
    out = bench.bench_ivfpq(n=6000, d=32, nlist=8, iters=2, m_pq=4,
                            with_flat=True)
    _check(out)
    assert out["routing"] == "trained_kmeans"
    assert "crossover" in out and "flat_fused_qps" in out
    # the nprobe sweep must show real routing: a trained quantizer cannot
    # give bit-identical recall at 8 and 32 probes unless both saturate
    recalls = [p["recall_at_10"] for p in out["sweep"]]
    assert recalls[-1] >= recalls[0]


def test_bench_ivfpq_spill_smoke():
    bench = _load_bench()
    out = bench.bench_ivfpq(n=6000, d=32, nlist=8, iters=2, m_pq=4,
                            spill_eps=0.3, spill_nprobes=(2, 4))
    _check(out)
    assert out["spill"]["spill_frac"] > 0
    assert [p["nprobe"] for p in out["spill"]["sweep"]] == [2, 4]
    assert all(p["recall_at_10"] >= 0 for p in out["spill"]["sweep"])


def test_bench_hnsw_smoke():
    bench = _load_bench()
    out = bench.bench_hnsw(n=1500, d=32, iters=2)
    _check(out)
    assert "serving_b8" in out and out["serving_b8"]["batch"] == 8
    assert [p["ef_search"] for p in out["sweep"]] == [64, 128, 256]
    # graph-container cache round-trip
    out2 = bench.bench_hnsw(n=1500, d=32, iters=2)
    assert out2["build_cached"] is True


def test_bench_main_emits_headline_first_and_last(capsys, monkeypatch):
    bench = _load_bench()
    calls = {"flat": 0}

    def fake_flat(iters=20, **kw):
        calls["flat"] += 1
        return {"metric": "flat_x", "value": 1.0, "unit": "qps",
                "vs_baseline": 1.0}

    monkeypatch.setattr(bench, "bench_flat", fake_flat)
    monkeypatch.setattr(
        bench, "bench_adc", lambda *a, **k: {"metric": "adc_x", "value": 2.0,
                                             "unit": "qps", "vs_baseline": 1.0})
    bench.main(["--only", "flat,adc"])
    lines = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert calls["flat"] == 1  # measured once, emitted twice
    assert lines[0]["metric"] == "flat_x" and lines[0].get("provisional")
    assert lines[-1]["metric"] == "flat_x" and "provisional" not in lines[-1]
    assert lines[1]["metric"] == "adc_x"


def test_bench_hostpq_smoke():
    bench = _load_bench()
    out = bench.bench_hostpq(n=6000, d=32, nlist=8, m_pq=4, b=4, nprobe=8,
                             repeats=1)
    _check(out)
    assert out["hbm_bytes_per_row"] == 4 + 4 + 4
    assert "device_candidates_qps" in out and "pcie_bytes_per_batch" in out


def test_bench_churn_smoke():
    bench = _load_bench()
    out = bench.bench_churn(n=3000, d=32, stream=512, nlist=16, nprobe=8)
    _check(out)
    assert out["hnsw"]["recall_new_at_10"] > 0.5
    assert out["ivf_retrained"]["recall_new_at_10"] >= out[
        "ivf_stale_quantizer"]["recall_new_at_10"] - 0.05


def test_bench_budget_guard_skips_when_exhausted(monkeypatch, capsys):
    """With a zero budget, main() must still exit cleanly: every non-flat
    config emits a SKIPPED line and the flat headline still brackets the
    run (provisional first, final last)."""
    import functools

    bench = _load_bench()
    monkeypatch.setenv("VECTORINDEX_BENCH_BUDGET_S", "0")
    bench.bench_flat = functools.partial(bench.bench_flat, n=2048, d=32, b=8)
    bench.main(["--iters", "2"])
    lines = [json.loads(l) for l in capsys.readouterr().out.splitlines()
             if l.startswith("{")]
    assert lines[0]["metric"].startswith("flat")
    assert lines[0].get("provisional") is True
    assert lines[-1]["metric"].startswith("flat")
    assert "provisional" not in lines[-1]
    mid = lines[1:-1]
    assert mid and all(m["metric"].endswith("_SKIPPED") for m in mid)


def test_bench_crossover_smoke():
    bench = _load_bench()
    out = bench.bench_crossover(n=6000, d=32, nlist=8, iters=2, m_pq=8,
                                points=((2, 64), (4, 128)))
    _check(out)
    assert "crossover" in out and "flat_fused_qps" in out
    assert out["at_spill_eps"] == 0.2 and "spill_frac" in out
    assert [(p["nprobe"], p["rerank_c"]) for p in out["sweep"]] == [
        (2, 64), (4, 128)
    ]
    # cache round-trip
    out2 = bench.bench_crossover(n=6000, d=32, nlist=8, iters=2, m_pq=8,
                                 points=((2, 64), (4, 128)))
    assert out2["build_cached"] is True
