"""ID-set filtering end-to-end (VERDICT r3 next #4).

Parity targets: reference allow/deny bitset filtering threaded through the
search kernels — FilterMode allow/deny (IDFilter.swift:104), HNSW traversal
allow-bitset (HNSWTraversal.swift:25), IVFSelectOpts.disabledLists
(IVFSelect.swift:16-56).

The contract under test: k results are returned (not k-minus-filtered)
under highly selective filters, every returned id passes the filter, and
the results match brute force over the allowed subset.
"""

import numpy as np
import pytest

from vectorindex_tpu.models.flat import FlatIndex
from vectorindex_tpu.models.hnsw import HNSWConfig, HNSWIndex
from vectorindex_tpu.models.ivf import IVFConfig, IVFIndex, IVFPQConfig, IVFPQIndex
from vectorindex_tpu.utils.config import Metric

K = 10


def _corpus(n=2000, d=32, seed=3):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((n, d)).astype(np.float32)
    q = x[rng.choice(n, 8, replace=False)] + 0.01 * rng.standard_normal(
        (8, d)
    ).astype(np.float32)
    return x, q.astype(np.float32)


def _brute_topk_allowed(q, x, allowed_rows, k):
    """Exact L2 top-k restricted to `allowed_rows` (row indices into x)."""
    sub = x[allowed_rows]
    d = (
        np.sum(q**2, 1)[:, None]
        + np.sum(sub**2, 1)[None, :]
        - 2.0 * (q @ sub.T)
    )
    order = np.argsort(d, axis=1, kind="stable")[:, :k]
    return np.asarray(allowed_rows)[order]


def _returned_ids(res_rows):
    return [[int(r.id) for r in row] for row in res_rows]


# ---------------------------------------------------------------------------
# flat
# ---------------------------------------------------------------------------


class TestFlatIDFilter:
    def test_allow_90pct_selective_returns_k_exact(self):
        x, q = _corpus()
        idx = FlatIndex(x.shape[1], Metric.L2)
        idx.insert_batch(list(range(len(x))), x)
        rng = np.random.default_rng(7)
        allowed = np.sort(rng.choice(len(x), len(x) // 10, replace=False))
        res = idx.batch_search(q, K, allow_ids=[int(a) for a in allowed])
        truth = _brute_topk_allowed(q, x, allowed, K)
        got = _returned_ids(res)
        for i in range(len(q)):
            assert len(got[i]) == K  # k results, not k-minus-filtered
            assert got[i] == [int(t) for t in truth[i]]  # exact over allowed

    def test_deny_excludes_and_still_returns_k(self):
        x, q = _corpus()
        idx = FlatIndex(x.shape[1], Metric.L2)
        idx.insert_batch(list(range(len(x))), x)
        # deny exactly the unfiltered top-K of query 0: all must vanish
        base = _returned_ids(idx.batch_search(q, K))
        denied = set(base[0])
        res = idx.batch_search(q, K, deny_ids=list(denied))
        got = _returned_ids(res)
        for i in range(len(q)):
            assert len(got[i]) == K
            assert not (set(got[i]) & denied)
        allowed = np.setdiff1d(np.arange(len(x)), np.asarray(list(denied)))
        truth = _brute_topk_allowed(q, x, allowed, K)
        assert got[0] == [int(t) for t in truth[0]]

    def test_allow_and_deny_compose(self):
        x, q = _corpus()
        idx = FlatIndex(x.shape[1], Metric.L2)
        idx.insert_batch(list(range(len(x))), x)
        allow = list(range(0, 1000))
        deny = list(range(0, 500))
        res = idx.batch_search(q, K, allow_ids=allow, deny_ids=deny)
        got = _returned_ids(res)
        truth = _brute_topk_allowed(q, x, np.arange(500, 1000), K)
        for i in range(len(q)):
            assert got[i] == [int(t) for t in truth[i]]

    def test_unknown_ids_ignored(self):
        x, q = _corpus(n=200)
        idx = FlatIndex(x.shape[1], Metric.L2)
        idx.insert_batch(list(range(len(x))), x)
        res = idx.search(q[0], K, allow_ids=list(range(100)) + [99999])
        assert len(res) == K
        assert all(int(r.id) < 100 for r in res)


# ---------------------------------------------------------------------------
# ivf (flat lists)
# ---------------------------------------------------------------------------


def _trained_ivf(x, nlist=16, nprobe=16):
    idx = IVFIndex(
        x.shape[1], Metric.L2, IVFConfig(nlist=nlist, nprobe=nprobe)
    )
    idx.insert_batch(list(range(len(x))), x)
    idx.optimize()
    return idx


class TestIVFIDFilter:
    def test_allow_selective_full_probe_exact(self):
        """nprobe == nlist probes everything, so filtered results must
        exactly match brute force over the allowed subset — this proves the
        mask lands BEFORE candidate selection (a post-top-k mask would
        under-return)."""
        x, q = _corpus()
        idx = _trained_ivf(x)
        rng = np.random.default_rng(11)
        allowed = np.sort(rng.choice(len(x), len(x) // 10, replace=False))
        res = idx.batch_search(q, K, allow_ids=[int(a) for a in allowed])
        truth = _brute_topk_allowed(q, x, allowed, K)
        got = _returned_ids(res)
        for i in range(len(q)):
            assert len(got[i]) == K
            assert got[i] == [int(t) for t in truth[i]]

    def test_deny_excludes(self):
        x, q = _corpus()
        idx = _trained_ivf(x)
        base = _returned_ids(idx.batch_search(q, K))
        denied = set(base[0]) | set(base[1])
        res = idx.batch_search(q, K, deny_ids=list(denied))
        got = _returned_ids(res)
        for i in range(len(q)):
            assert len(got[i]) == K
            assert not (set(got[i]) & denied)

    def test_disabled_lists_exclude_routing(self):
        x, q = _corpus()
        idx = _trained_ivf(x, nprobe=16)
        # disable the list that owns query 0's nearest neighbor
        base = idx.batch_search(q, 1)
        nn_slot = idx._idmap.lookup(base[0][0].id)
        dead_list = idx._slot_list[nn_slot]
        res = idx.batch_search(q, K, disabled_lists=[dead_list])
        members = {s for s, l in idx._slot_list.items() if l == dead_list}
        for row in res:
            assert row, "disabled list must not empty the results"
            for r in row:
                assert idx._idmap.lookup(r.id) not in members

    def test_untrained_path_respects_filters(self):
        x, q = _corpus(n=300)
        idx = IVFIndex(x.shape[1], Metric.L2, IVFConfig(nlist=8))
        idx.insert_batch(list(range(len(x))), x)  # no optimize(): untrained
        allowed = np.arange(0, 30)
        res = idx.batch_search(q, K, allow_ids=[int(a) for a in allowed])
        truth = _brute_topk_allowed(q, x, allowed, K)
        got = _returned_ids(res)
        for i in range(len(q)):
            assert got[i] == [int(t) for t in truth[i]]


# ---------------------------------------------------------------------------
# ivf-pq
# ---------------------------------------------------------------------------


class TestIVFPQIDFilter:
    def test_allow_selective_returns_k_allowed_only(self):
        x, q = _corpus(n=3000, d=32)
        idx = IVFPQIndex(
            32, Metric.L2,
            IVFPQConfig(nlist=16, nprobe=16, m=8, ks=256, rerank=True),
        )
        idx.insert_batch(list(range(len(x))), x)
        idx.optimize()
        rng = np.random.default_rng(5)
        allowed = set(
            int(a) for a in rng.choice(len(x), len(x) // 10, replace=False)
        )
        res = idx.batch_search(q, K, allow_ids=list(allowed))
        got = _returned_ids(res)
        truth = _brute_topk_allowed(
            q, x, np.asarray(sorted(allowed)), K
        )
        for i in range(len(q)):
            assert len(got[i]) == K
            assert set(got[i]) <= allowed
            # ADC is approximate: demand high overlap with the allowed truth,
            # exactness is the flat/ivf tests' job
            overlap = len(set(got[i]) & set(int(t) for t in truth[i]))
            assert overlap >= K - 3


# ---------------------------------------------------------------------------
# hnsw
# ---------------------------------------------------------------------------


class TestHNSWIDFilter:
    @pytest.fixture(scope="class")
    def built(self):
        x, q = _corpus(n=3000, d=32, seed=13)
        idx = HNSWIndex(32, Metric.L2, HNSWConfig(build_chunk=512))
        idx.insert_batch([str(i) for i in range(len(x))], x)
        idx.statistics()
        return idx, x, q

    def test_allow_selective_exact_scan_path(self, built):
        """≤ max(4k, 2048) allowed rows → the exact gather-scan regime:
        results must match brute force over the allowed subset exactly."""
        idx, x, q = built
        rng = np.random.default_rng(17)
        allowed = np.sort(rng.choice(len(x), 300, replace=False))
        res = idx.batch_search(q, K, allow_ids=[str(a) for a in allowed])
        truth = _brute_topk_allowed(q, x, allowed, K)
        for i in range(len(q)):
            got = [int(r.id) for r in res[i]]
            assert len(got) == K
            assert got == [int(t) for t in truth[i]]

    def test_deny_small_set_beam_path(self, built):
        """Deny a handful of ids → beam regime: denied ids never surface,
        k results still returned, recall vs allowed-truth stays high."""
        idx, x, q = built
        base = idx.batch_search(q, K)
        denied = {r.id for r in base[0]} | {r.id for r in base[1]}
        res = idx.batch_search(q, K, deny_ids=list(denied))
        allowed = np.setdiff1d(
            np.arange(len(x)), np.asarray([int(i) for i in denied])
        )
        truth = _brute_topk_allowed(q, x, allowed, K)
        hits = 0
        for i in range(len(q)):
            got = [r.id for r in res[i]]
            assert len(got) == K
            assert not (set(got) & denied)
            hits += len(set(int(g) for g in got) & set(int(t) for t in truth[i]))
        assert hits / (len(q) * K) >= 0.9

    def test_allow_half_corpus_beam_recall(self, built):
        """50%-selective allow set → beam regime with scaled ef: k results
        and ≥0.9 recall vs the allowed-subset truth."""
        idx, x, q = built
        rng = np.random.default_rng(23)
        allowed = np.sort(
            rng.choice(len(x), len(x) // 2, replace=False)
        )
        res = idx.batch_search(q, K, allow_ids=[str(a) for a in allowed])
        truth = _brute_topk_allowed(q, x, allowed, K)
        hits = 0
        for i in range(len(q)):
            got = [int(r.id) for r in res[i]]
            assert len(got) == K
            assert set(got) <= set(int(a) for a in allowed)
            hits += len(set(got) & set(int(t) for t in truth[i]))
        assert hits / (len(q) * K) >= 0.9

    def test_allow_everything_matches_unfiltered(self, built):
        idx, x, q = built
        res_f = idx.batch_search(
            q, K, allow_ids=[str(i) for i in range(len(x))]
        )
        res_u = idx.batch_search(q, K)
        for rf, ru in zip(res_f, res_u):
            assert [r.id for r in rf] == [r.id for r in ru]


def test_ivf_filtered_rank_major_all_metrics():
    """IP/cosine filtered IVF search rides the same masked rank-major fast
    path as L2 (round 5 — VERDICT r4 next #8): the deny mask folds into
    the sqnorm stream as a +inf sentinel that the kernels read explicitly
    for metrics whose score doesn't consume ‖x‖². Results must equal brute
    force over the ALLOWED rows for every metric."""
    import jax.numpy as jnp
    import numpy as np

    from vectorindex_tpu.bench.synth import pack_ivf
    from vectorindex_tpu.kernels.ivf_probe import (
        ivf_search_flat_pallas,
        rank_major_fits,
    )
    from vectorindex_tpu.ops import kmeans as km
    from vectorindex_tpu.utils.config import Metric

    rng = np.random.default_rng(3)
    n, d, nlist, b, k = 4000, 32, 16, 8, 5
    x = rng.standard_normal((n, d)).astype(np.float32)
    res = km.kmeans(jnp.asarray(x), km.KMeansConfig(k=nlist, iters=8, seed=2))
    assign = np.asarray(res.assignments).astype(np.int32)
    arrays, order, cap = pack_ivf(x, assign, nlist, storage_dtype=jnp.float32)
    assert rank_major_fits(b, cap, d, 4)  # the fast path must be in play
    allow_corpus = rng.random(n) < 0.2
    row_ids = np.asarray(arrays.row_ids)
    ra = np.zeros(row_ids.shape[0], bool)
    live = row_ids >= 0
    ra[live] = allow_corpus[row_ids[live]]
    row_allow = jnp.asarray(ra)
    q = x[rng.choice(n, b, replace=False)] + 0.05 * rng.standard_normal(
        (b, d)
    ).astype(np.float32)
    allowed = np.nonzero(allow_corpus)[0]
    sub = x[allowed]
    for metric in (Metric.L2, Metric.INNER_PRODUCT, Metric.COSINE):
        sd, si = ivf_search_flat_pallas(
            jnp.asarray(q), res.centroids, arrays, None, row_allow,
            nprobe=nlist, probe_cap=cap, k=k, metric=metric, interpret=True,
        )
        si = np.asarray(si)
        if metric == Metric.L2:
            ref = (
                np.sum(q**2, 1)[:, None] + np.sum(sub**2, 1)[None, :]
                - 2.0 * q @ sub.T
            )
        elif metric == Metric.INNER_PRODUCT:
            ref = -(q @ sub.T)
        else:
            qn = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-30)
            sn = sub / np.maximum(
                np.linalg.norm(sub, axis=1, keepdims=True), 1e-30
            )
            ref = 1.0 - qn @ sn.T
        truth = allowed[np.argsort(ref, axis=1)[:, :k]]
        # full probe (nprobe == nlist): the allowed top-k must be exact
        for i in range(b):
            assert set(si[i].tolist()) == set(truth[i].tolist()), (
                metric, i, si[i], truth[i]
            )
        # and no denied id may ever appear
        assert allow_corpus[si[si >= 0]].all()
