"""Telemetry (#46): gating, counters, timers, ring buffer, JSON snapshot,
recorder callbacks (reference Telemetry.swift behaviors)."""

import json

import numpy as np

from vectorindex_tpu.models import FlatIndex
from vectorindex_tpu.utils import telemetry
from vectorindex_tpu.utils.telemetry import TELEM, QueryStats


def setup_function(_):
    TELEM.reset()
    TELEM.disable()


def test_disabled_is_noop():
    TELEM.inc("x")
    with TELEM.timer("topk"):
        pass
    TELEM.record_query(QueryStats())
    snap = TELEM.snapshot()
    assert snap["counters"] == {}
    assert snap["recent_queries"] == 0


def test_counters_and_bytes():
    telemetry.enable()
    TELEM.inc("scans", 3)
    TELEM.add_bytes("vecs", 1024)
    snap = TELEM.snapshot()
    assert snap["counters"]["scans"] == 3
    assert snap["bytes"]["vecs"] == 1024


def test_timer_records_histogram_and_stats():
    telemetry.enable()
    st = QueryStats()
    with TELEM.timer("topk", st):
        sum(range(1000))
    assert "topk" in st.stage_ms and st.stage_ms["topk"] >= 0
    snap = TELEM.snapshot()
    assert "topk" in snap["stage_histograms_us"]


def test_ring_buffer_and_recorder():
    telemetry.enable()
    seen = []
    TELEM.register_recorder("t", seen.append)
    for i in range(5):
        TELEM.record_query(QueryStats(batch=2))
    assert len(seen) == 5
    assert len(TELEM.recent(3)) == 3
    assert TELEM.snapshot()["counters"]["queries"] == 10
    TELEM.unregister_recorder("t")


def test_sampling_rate():
    telemetry.enable(sample_rate=0.0)
    for _ in range(20):
        TELEM.record_query(QueryStats())
    assert TELEM.snapshot()["recent_queries"] == 0


def test_snapshot_json_roundtrip(tmp_path):
    telemetry.enable()
    TELEM.inc("a")
    p = str(tmp_path / "telem.json")
    s = TELEM.snapshot_json(p)
    loaded = json.loads(open(p).read())
    assert loaded == json.loads(s)
    assert loaded["counters"]["a"] == 1


def test_flat_search_emits_telemetry():
    telemetry.enable()
    rng = np.random.default_rng(0)
    x = rng.standard_normal((100, 8)).astype(np.float32)
    idx = FlatIndex(8)
    idx.insert_batch(list(range(100)), x)
    idx.batch_search(x[:4], 3)
    snap = TELEM.snapshot()
    assert snap["counters"]["queries"] == 4
    assert snap["bytes"]["vecs"] > 0
    assert "score_flat" in snap["stage_histograms_us"]
    rec = TELEM.recent(1)[0]
    assert rec.rows_scored == 4 * 100
    assert "dot_trick" in rec.flags


# -- debug checks (SURVEY.md §5.2) --


def test_debug_check_finite_and_invariants():
    from vectorindex_tpu.utils import debug
    from vectorindex_tpu.utils.errors import IndexError

    debug.enable()
    try:
        import pytest

        with pytest.raises(IndexError):
            debug.check_finite("x", np.asarray([1.0, np.nan]))
        debug.check_finite("ok", np.ones(3))
        # healthy index passes the invariant sweep
        rng = np.random.default_rng(0)
        x = rng.standard_normal((50, 8)).astype(np.float32)
        idx = FlatIndex(8)
        idx.insert_batch(list(range(50)), x)
        debug.check_index_invariants(idx)
        # corrupt the control plane -> caught
        idx._valid[idx._idmap.lookup(3)] = False
        with pytest.raises(IndexError):
            debug.check_index_invariants(idx)
    finally:
        debug.disable()
    assert not debug.is_enabled()


def test_ivfpq_search_records_telemetry():
    """IVF-PQ search emits scan_adc stage stats; the host tier additionally
    accounts its PCIe gather traffic on the 'vecs' byte stream."""
    from vectorindex_tpu.models.ivf import IVFPQConfig, IVFPQIndex
    from vectorindex_tpu.utils import telemetry
    from vectorindex_tpu.utils.config import Metric

    rng = np.random.default_rng(7)
    n, d = 1200, 16
    x = rng.standard_normal((n, d)).astype(np.float32)
    idx = IVFPQIndex(
        d, Metric.L2,
        IVFPQConfig(nlist=4, nprobe=4, m=4, ks=16, rerank=True,
                    rerank_c=32, host_rerank=True),
    )
    idx.insert_batch(list(range(n)), x)
    idx.optimize()
    telemetry.TELEM.reset()
    telemetry.enable()
    try:
        idx.batch_search(x[:8], 5)
        snap = telemetry.TELEM.snapshot()
        rec = telemetry.TELEM.recent(1)[0]
    finally:
        telemetry.disable()
    assert "scan_adc" in rec.stage_ms
    assert rec.lists_routed == 8 * 4
    assert "u4" in rec.flags and "host_rerank" in rec.flags
    assert rec.bytes_read["codes"] > 0
    # PCIe gather: B * rerank_c rows * d * 4 bytes on the vecs stream
    assert snap["bytes"]["vecs"] == 8 * 32 * d * 4


def test_kernel_recorder_sinks():
    """Per-kernel counter sinks (reference per-kernel TelemetryRecorder
    callbacks, L2SqrKernel.swift:46-57): model search paths bump
    kernel.<name>.{calls,rows,bytes} counters when telemetry is on."""
    import numpy as np

    from vectorindex_tpu.models.flat import FlatIndex
    from vectorindex_tpu.utils.config import Metric
    from vectorindex_tpu.utils.telemetry import TELEM

    rng = np.random.default_rng(0)
    x = rng.standard_normal((300, 16)).astype(np.float32)
    idx = FlatIndex(16, Metric.L2)
    idx.insert_batch(list(range(300)), x)
    TELEM.enable()
    TELEM.reset()
    try:
        idx.batch_search(x[:4], 3)
        snap = TELEM.snapshot()
    finally:
        TELEM.disable()
    ks = [k for k in snap["counters"] if k.startswith("kernel.")]
    assert any(".calls" in k for k in ks), snap["counters"]
    assert any(".rows" in k for k in ks), snap["counters"]
    # disabled: no recording
    TELEM.reset()
    idx.batch_search(x[:4], 3)
    assert not any(
        k.startswith("kernel.") for k in TELEM.snapshot()["counters"]
    )
