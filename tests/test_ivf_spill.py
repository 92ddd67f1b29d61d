"""Spill multi-assignment (ops.ivf.spill_assign) + dedup search epilogue.

The TPU-native recall/QPS lever the reference lacks: boundary rows encoded
into their two nearest lists lift the nprobe-routing recall ceiling while
the probe kernels' grid cost (b x nprobe steps) stays fixed. Duplicated ids
must be deduped before top-k (kernel #32 contract, CandidateDedup.swift).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from vectorindex_tpu.bench.synth import (
    exact_truth,
    lowdim_corpus,
    lowdim_queries,
    pack_ivf,
    pq_csr_state,
    recall_at_k,
    trained_quantizer,
)
from vectorindex_tpu.kernels.adc_probe import (
    _dedup_missing,
    ivf_search_pq_pallas,
)
from vectorindex_tpu.ops import pq as pq_ops
from vectorindex_tpu.ops.ivf import spill_assign
from vectorindex_tpu.ops.topk import INVALID_ID
from vectorindex_tpu.utils.config import Metric

INTERP = True  # CPU tests run the Pallas kernels in interpret mode


def _corpus(n=6000, d=32, nlist=16, seed=3):
    x, W = lowdim_corpus(n, d, dz=8, seed=seed)
    centers, assign = trained_quantizer(
        x, nlist, seed=5, train_sample=2048, iters=10
    )
    return x, W, centers, assign


def test_dedup_missing_marks_later_copies():
    iids = jnp.asarray([[7, 3, 7, 3, 5], [1, 1, 1, 2, 2]])
    missing = jnp.zeros((2, 5), bool)
    out = np.asarray(_dedup_missing(iids, missing))
    # first occurrence survives, later copies marked
    np.testing.assert_array_equal(
        out, [[False, False, True, True, False],
              [False, True, True, False, True]]
    )


def test_dedup_missing_keeps_existing_missing():
    iids = jnp.asarray([[INVALID_ID, 4, INVALID_ID]])
    missing = jnp.asarray([[True, False, True]])
    out = np.asarray(_dedup_missing(iids, missing))
    assert out[0, 1] == False  # noqa: E712
    assert out[0, 0] and out[0, 2]


def test_spill_assign_shapes_and_criterion():
    x, _, centers, assign = _corpus()
    n = x.shape[0]
    src, a_sp, frac = spill_assign(x, centers, eps=0.3, chunk=2048)
    assert src.shape == a_sp.shape and src.dtype == np.int32
    # primary block: identity source, nearest-centroid assignment
    np.testing.assert_array_equal(src[:n], np.arange(n))
    np.testing.assert_array_equal(a_sp[:n], assign)
    assert 0.0 < frac < 1.0 and len(src) == n + int(round(frac * n))
    # every spilled copy goes to the row's SECOND-nearest list and meets
    # the boundary criterion
    d2mat = (
        np.sum(x**2, 1)[:, None]
        + np.sum(centers**2, 1)[None, :]
        - 2.0 * x @ centers.T
    )
    top2 = np.argsort(d2mat, axis=1, kind="stable")[:, :2]
    for j in range(n, len(src)):
        i = src[j]
        assert a_sp[j] == top2[i, 1]
        d1, d2 = d2mat[i, top2[i, 0]], d2mat[i, top2[i, 1]]
        assert d2 <= 1.3 * max(d1, 1e-30) + 1e-3


def test_spill_eps_monotone():
    x, _, centers, _ = _corpus(n=3000)
    _, _, f_small = spill_assign(x, centers, eps=0.05)
    _, _, f_big = spill_assign(x, centers, eps=0.5)
    assert f_big >= f_small


def test_pack_ivf_with_src_maps_original_ids():
    x, _, centers, assign = _corpus(n=4000)
    src, a_sp, _ = spill_assign(x, centers, eps=0.3)
    arrays, order, probe_cap = pack_ivf(x, a_sp, centers.shape[0], src=src)
    row_ids = np.asarray(arrays.row_ids)
    live = row_ids >= 0
    assert live.sum() == len(src)
    # ids are original corpus indices; spilled rows appear exactly twice
    counts = np.bincount(row_ids[live], minlength=x.shape[0])
    assert counts.min() >= 1 and counts.max() == 2
    assert (counts == 2).sum() == len(src) - x.shape[0]
    # packed vectors match their source rows
    sample = np.flatnonzero(live)[::97]
    dpad = np.asarray(arrays.vecs).shape[1]
    np.testing.assert_allclose(
        np.asarray(arrays.vecs)[sample, : x.shape[1]].astype(np.float32),
        x[row_ids[sample]],
        atol=0.01,  # bf16 storage
    )
    assert dpad % 128 == 0


def test_spilled_codes_encode_against_own_list():
    """A spilled copy's residual codes must differ from the primary's
    (different coarse centroid ⇒ different residual)."""
    x, _, centers, assign = _corpus(n=4000)
    src, a_sp, frac = spill_assign(x, centers, eps=0.4)
    assert frac > 0.01
    arrays, order, _ = pack_ivf(x, a_sp, centers.shape[0], src=src)
    books, codes, tcorr = pq_csr_state(
        x, a_sp, centers, arrays, order, m=4, ks=16, iters=4,
        train_sample=2048,
    )
    row_ids = np.asarray(arrays.row_ids)
    codes_np = np.asarray(codes)
    dup_id = None
    live = np.flatnonzero(row_ids >= 0)
    seen = {}
    for r in live:
        i = int(row_ids[r])
        if i in seen:
            dup_id = (seen[i], r)
            break
        seen[i] = r
    assert dup_id is not None
    r1, r2 = dup_id
    assert not np.array_equal(codes_np[r1], codes_np[r2]) or (
        float(tcorr[r1]) != float(tcorr[r2])
    )


def test_spill_search_unique_ids_and_recall():
    x, W, centers, assign = _corpus(n=6000, nlist=16)
    k = 10
    qs = lowdim_queries(W, 32, seed=11)
    truth = exact_truth(qs, x, k)

    def run(a, src, dedup, nprobe):
        arrays, order, probe_cap = pack_ivf(x, a, centers.shape[0], src=src)
        books, codes, tcorr = pq_csr_state(
            x, a, centers, arrays, order, m=4, ks=16, iters=6,
            train_sample=2048,
        )
        sd, si = ivf_search_pq_pallas(
            jnp.asarray(qs), jnp.asarray(centers), arrays, codes, tcorr,
            books, nprobe=nprobe, probe_cap=probe_cap, k=k,
            metric=Metric.L2, rerank_c=64, dedup=dedup, interpret=INTERP,
        )
        return np.asarray(sd), np.asarray(si)

    src, a_sp, frac = spill_assign(x, centers, eps=0.4)
    sd, si = run(a_sp, src, True, nprobe=2)
    # k UNIQUE live results per query
    for row in si:
        live = row[row != INVALID_ID]
        assert len(live) == len(set(live.tolist())) == k
    rec_spill = recall_at_k(si, truth)
    _, si_plain = run(assign, None, False, nprobe=2)
    rec_plain = recall_at_k(si_plain, truth)
    # the point of spill: strictly better routing coverage at equal nprobe
    assert rec_spill >= rec_plain
    assert rec_spill > 0.6


def test_spill_search_without_dedup_wastes_slots():
    """Sanity: with spill but WITHOUT dedup, duplicate ids can appear —
    this is exactly what the dedup flag exists to prevent."""
    x, W, centers, assign = _corpus(n=4000, nlist=8)
    src, a_sp, _ = spill_assign(x, centers, eps=0.6)
    arrays, order, probe_cap = pack_ivf(x, a_sp, centers.shape[0], src=src)
    books, codes, tcorr = pq_csr_state(
        x, a_sp, centers, arrays, order, m=4, ks=16, iters=4,
        train_sample=2048,
    )
    qs = lowdim_queries(W, 16, seed=13)
    _, si = ivf_search_pq_pallas(
        jnp.asarray(qs), jnp.asarray(centers), arrays, codes, tcorr, books,
        nprobe=8, probe_cap=probe_cap, k=10, metric=Metric.L2,
        rerank_c=0, dedup=False, interpret=INTERP,
    )
    si = np.asarray(si)
    any_dup = any(
        len(set(r[r != INVALID_ID].tolist())) < (r != INVALID_ID).sum()
        for r in si
    )
    # duplicates are likely but not guaranteed at toy scale; the assertion
    # is on the DEDUP run below either way
    _, si_d = ivf_search_pq_pallas(
        jnp.asarray(qs), jnp.asarray(centers), arrays, codes, tcorr, books,
        nprobe=8, probe_cap=probe_cap, k=10, metric=Metric.L2,
        rerank_c=0, dedup=True, interpret=INTERP,
    )
    for r in np.asarray(si_d):
        live = r[r != INVALID_ID]
        assert len(live) == len(set(live.tolist()))
    if not any_dup:
        pytest.skip("no duplicate surfaced at toy scale (dedup still verified)")


class TestIVFPQIndexSpill:
    """Model-level spill (IVFPQConfig.spill_eps): the framework feature, not
    just the bench path — optimize/insert/remove/update maintain spill
    copies, every search backend dedups."""

    def _index(self, n=3000, d=32, nlist=16, eps=0.4):
        from vectorindex_tpu.models.ivf import IVFPQConfig, IVFPQIndex

        x, W = lowdim_corpus(n, d, dz=8, seed=21)
        idx = IVFPQIndex(
            d, Metric.L2,
            IVFPQConfig(nlist=nlist, nprobe=4, m=4, ks=16, rerank=True,
                        rerank_c=64, spill_eps=eps),
        )
        idx.insert_batch(list(range(n)), x)
        idx.optimize()
        return idx, x, W

    def test_spill_copies_exist_and_search_dedups(self):
        idx, x, W = self._index()
        assert len(idx._slot_spill) > 0
        stats = idx._store.list_stats()
        assert stats["total"] == idx.count + len(idx._slot_spill)
        qs = lowdim_queries(W, 16, seed=3)
        res = idx.batch_search(qs, 10)
        for row in res:
            ids = [r.id for r in row]
            assert len(ids) == len(set(ids)) == 10

    def test_spill_recall_not_worse_than_plain(self):
        from vectorindex_tpu.models.ivf import IVFPQConfig, IVFPQIndex

        n, d, nlist = 4000, 32, 16
        x, W = lowdim_corpus(n, d, dz=8, seed=22)
        qs = lowdim_queries(W, 48, seed=5)
        truth = exact_truth(qs, x, 10)

        def run(eps):
            idx = IVFPQIndex(
                d, Metric.L2,
                IVFPQConfig(nlist=nlist, nprobe=2, m=4, ks=16,
                            rerank=True, rerank_c=64, spill_eps=eps),
            )
            idx.insert_batch(list(range(n)), x)
            idx.optimize()
            found = np.full((48, 10), -1, np.int64)
            for i, row in enumerate(idx.batch_search(qs, 10)):
                for j, r in enumerate(row):
                    found[i, j] = int(r.id)
            return recall_at_k(found, truth)

        assert run(0.4) >= run(0.0)

    def test_spill_crud_maintains_copies(self):
        idx, x, _ = self._index(n=1500)
        spilled = [s for s in idx._slot_spill][:3]
        assert spilled
        total0 = idx._store.list_stats()["total"]
        ext = idx._idmap.external_for(spilled[0])
        idx.remove(ext)
        assert spilled[0] not in idx._slot_spill
        assert idx._store.list_stats()["total"] <= total0 - 2  # both copies
        # trickle insert after training gets a spill copy when boundary
        before = len(idx._slot_spill)
        idx.insert_batch([10_000 + i for i in range(64)],
                         x[:64] + np.float32(1e-3))
        assert idx._store.list_stats()["total"] >= total0 - 2 + 64
        res = idx.search(x[5] + np.float32(1e-3), 5)
        assert len(res) == 5

    def test_spill_durable_rejected(self):
        import pytest as _pytest

        from vectorindex_tpu.models.ivf import IVFPQConfig, IVFPQIndex
        from vectorindex_tpu.utils.errors import IndexError as VIndexError

        idx, x, _ = self._index(n=1000)
        idx._durable = object()  # simulate enabled journal
        with _pytest.raises(VIndexError):
            idx.insert(99999, x[0])


def test_spill_dedup_no_rerank_returns_full_rows():
    """rerank_c=0 + dedup: a dedup'd duplicate must not keep its finite
    ADC distance — an INVALID_ID mid-top-k makes consumers break at the
    first invalid slot and silently truncate result rows (round-5 review
    finding; repro measured rows of length 1-7 for k=10)."""
    import numpy as np

    from vectorindex_tpu.models.ivf import IVFPQConfig, IVFPQIndex
    from vectorindex_tpu.utils.config import Metric

    rng = np.random.default_rng(13)
    n, d = 400, 16
    x = rng.standard_normal((n, d)).astype(np.float32)
    idx = IVFPQIndex(
        d, Metric.L2,
        IVFPQConfig(nlist=4, nprobe=4, m=4, ks=16, rerank=False,
                    spill_eps=0.5),
    )
    idx.insert_batch(list(range(n)), x)
    idx.optimize()
    res = idx.batch_search(x[:8], 10)
    for row in res:
        assert len(row) == 10, [len(r) for r in res]
        ids = [r.id for r in row]
        assert len(set(ids)) == 10  # dedup holds too
