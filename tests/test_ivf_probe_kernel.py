"""Pallas IVF probe kernel (kernels/ivf_probe.py): interpret-mode parity vs
the XLA gather path (the Swift-vs-C cross-implementation tier of SURVEY.md §4
— two structurally different implementations must agree bit-for-bit on ids)."""

import numpy as np
import jax.numpy as jnp
import pytest

from vectorindex_tpu.kernels.ivf_probe import ivf_search_flat_pallas
from vectorindex_tpu.ops.ivf import IVFListStore, ivf_search_flat, probe_cap_for
from vectorindex_tpu.ops.topk import INVALID_ID
from vectorindex_tpu.utils.config import Metric


def _clustered(n=900, d=32, kc=13, seed=0, skew=1.5):
    rng = np.random.default_rng(seed)
    cent = rng.standard_normal((kc, d)).astype(np.float32)
    p = np.exp(rng.standard_normal(kc) * skew)
    p /= p.sum()
    assign = rng.choice(kc, size=n, p=p)
    x = (cent[assign] + 0.3 * rng.standard_normal((n, d))).astype(np.float32)
    store = IVFListStore(kc, d)
    store.append_batch(assign, np.arange(n), x)
    return cent, x, store


@pytest.mark.parametrize(
    "metric", [Metric.L2, Metric.INNER_PRODUCT, Metric.COSINE]
)
@pytest.mark.parametrize("nprobe", [1, 4, 13])
def test_parity_vs_xla_path(metric, nprobe):
    cent, x, store = _clustered()
    arrays = store.sync_device()
    cap = probe_cap_for(store.max_length)
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.standard_normal((7, x.shape[1])).astype(np.float32))
    c = jnp.asarray(cent)
    d1, i1 = ivf_search_flat(
        q, c, arrays, nprobe=nprobe, probe_cap=cap, k=10, metric=metric
    )
    d2, i2 = ivf_search_flat_pallas(
        q, c, arrays, nprobe=nprobe, probe_cap=cap, k=10, metric=metric,
        interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(
        np.asarray(d1), np.asarray(d2), atol=1e-4, rtol=1e-4
    )


def test_skewed_lists_no_padding_leak():
    """Heavy skew: the kernel must mask list tails — padding rows (zero
    vectors) would otherwise win IP/cosine queries."""
    cent, x, store = _clustered(skew=3.0, seed=3)
    arrays = store.sync_device()
    cap = probe_cap_for(store.max_length)
    q = jnp.asarray(np.random.default_rng(2).standard_normal((5, 32)).astype(np.float32))
    _, ids = ivf_search_flat_pallas(
        q, jnp.asarray(cent), arrays, nprobe=13, probe_cap=cap, k=10,
        metric=Metric.INNER_PRODUCT, interpret=True,
    )
    ids = np.asarray(ids)
    assert (ids != -1).all()  # -1 = padding row id; must never surface


def test_empty_lists_and_small_k():
    kc, d = 8, 16
    store = IVFListStore(kc, d)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((5, d)).astype(np.float32)
    store.append_batch([0, 0, 3, 3, 3], np.arange(5), x)  # most lists empty
    arrays = store.sync_device()
    cent = rng.standard_normal((kc, d)).astype(np.float32)
    q = jnp.asarray(x[:2])
    dist, ids = ivf_search_flat_pallas(
        q, jnp.asarray(cent), arrays, nprobe=kc,
        probe_cap=probe_cap_for(store.max_length), k=10, metric=Metric.L2,
        interpret=True,
    )
    dist, ids = np.asarray(dist), np.asarray(ids)
    for b in range(2):
        live = ids[b][np.isfinite(dist[b])]
        assert set(live.tolist()) == set(range(5))
    assert (ids[~np.isfinite(dist)] == INVALID_ID).all()


def test_bf16_storage_parity():
    cent, x, store = _clustered(seed=5)
    arrays = store.sync_device(jnp.bfloat16)
    cap = probe_cap_for(store.max_length)
    q = jnp.asarray(np.random.default_rng(4).standard_normal((4, 32)).astype(np.float32))
    d1, i1 = ivf_search_flat(
        q, jnp.asarray(cent), arrays, nprobe=6, probe_cap=cap, k=8,
        metric=Metric.L2,
    )
    d2, i2 = ivf_search_flat_pallas(
        q, jnp.asarray(cent), arrays, nprobe=6, probe_cap=cap, k=8,
        metric=Metric.L2, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=1e-2, rtol=1e-2)


def test_strict_tie_contract():
    """Duplicate vectors: ties at the k boundary must resolve by ascending
    internal id (reference TopK.swift:8-30)."""
    kc, d = 4, 16
    store = IVFListStore(kc, d)
    v = np.ones((12, d), np.float32)  # identical rows → identical distances
    # scatter into lists out of id order
    store.append_batch([2, 0, 1, 3, 2, 0, 1, 3, 2, 0, 1, 3], np.arange(12)[::-1], v)
    arrays = store.sync_device()
    cent = np.zeros((kc, d), np.float32)
    q = jnp.asarray(np.zeros((1, d), np.float32))
    _, ids = ivf_search_flat_pallas(
        q, jnp.asarray(cent), arrays, nprobe=kc,
        probe_cap=probe_cap_for(store.max_length), k=5, metric=Metric.L2,
        interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(ids)[0], np.arange(5))


def test_rank_major_matches_pair_kernel():
    """Rank-major scores (serving-batch grid) == per-pair scores."""
    import numpy as np

    from vectorindex_tpu.bench.synth import clustered_corpus, pack_ivf
    from vectorindex_tpu.kernels.ivf_probe import (
        ivf_probe_scores,
        ivf_probe_scores_rankmajor,
    )
    from vectorindex_tpu.ops.ivf import ivf_select

    n, d, nlist, b, nprobe = 4000, 32, 16, 8, 4
    x, centers, assign = clustered_corpus(n, d, nlist=nlist, seed=3)
    arrays, order, probe_cap = pack_ivf(x, assign, nlist, storage_dtype=jnp.float32)
    rng = np.random.default_rng(5)
    q = jnp.asarray(x[rng.choice(n, b)] + 0.01)
    _, pl_ = ivf_select(q, jnp.asarray(centers), nprobe=nprobe, metric=Metric.L2)
    starts = arrays.starts[pl_]
    lens = arrays.lengths[pl_]
    a = ivf_probe_scores(
        q, starts, lens, arrays.vecs, arrays.sqnorms,
        nprobe=nprobe, probe_cap=probe_cap, metric=Metric.L2, interpret=True,
    )
    r = ivf_probe_scores_rankmajor(
        q, starts, lens, arrays.vecs, arrays.sqnorms,
        nprobe=nprobe, probe_cap=probe_cap, metric=Metric.L2, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(r), np.asarray(a), rtol=1e-5, atol=1e-5)


def test_rank_major_end_to_end_recall():
    """ivf_search_flat_pallas routed through the rank-major kernel (small B
    hits the fits() gate) must stay exact within probed lists."""
    import numpy as np

    from vectorindex_tpu.bench.synth import clustered_corpus, pack_ivf
    from vectorindex_tpu.kernels.ivf_probe import (
        ivf_search_flat_pallas,
        rank_major_fits,
    )

    n, d, nlist, b, k = 5000, 16, 8, 8, 5
    x, centers, assign = clustered_corpus(n, d, nlist=nlist, seed=7)
    arrays, order, probe_cap = pack_ivf(x, assign, nlist, storage_dtype=jnp.float32)
    assert rank_major_fits(b, probe_cap, d, 4)
    q = jnp.asarray(x[:b])
    sd, si = ivf_search_flat_pallas(
        q, jnp.asarray(centers), arrays, nprobe=nlist, probe_cap=probe_cap,
        k=k, metric=Metric.L2, interpret=True,
    )
    si = np.asarray(si)
    assert (si[:, 0] == np.arange(b)).all()  # self top-1 with all lists probed


def test_binned_topc_complete_and_matches_pair():
    """Well-spread data: the binned kernel's candidates must contain the
    exact top-k (drop proof passes) and the end-to-end result must equal the
    pair-kernel pipeline bit-for-bit."""
    import vectorindex_tpu.kernels.ivf_probe as kp
    from vectorindex_tpu.bench.synth import clustered_corpus, pack_ivf
    from vectorindex_tpu.ops.ivf import ivf_select

    n, d, nlist, b, k, nprobe = 4000, 32, 16, 8, 10, 8
    x, centers, assign = clustered_corpus(n, d, nlist=nlist, seed=11)
    arrays, order, probe_cap = pack_ivf(x, assign, nlist, storage_dtype=jnp.float32)
    rng = np.random.default_rng(6)
    q = jnp.asarray(x[rng.choice(n, b)] + 0.01)
    cent = jnp.asarray(centers)
    _, pl_ = ivf_select(q, cent, nprobe=nprobe, metric=Metric.L2)
    cd, ci, d4 = kp.ivf_probe_topc_rankmajor(
        q, arrays.starts[pl_], arrays.lengths[pl_], arrays.vecs,
        arrays.sqnorms, nprobe=nprobe, probe_cap=probe_cap,
        metric=Metric.L2, interpret=True,
    )
    assert cd.shape == (b, 3 * kp.CBINS) and d4.shape == (b, kp.CBINS)
    # the full-dist oracle: binned candidates must include its exact top-k
    a = kp.ivf_probe_scores(
        q, arrays.starts[pl_], arrays.lengths[pl_], arrays.vecs,
        arrays.sqnorms, nprobe=nprobe, probe_cap=probe_cap,
        metric=Metric.L2, interpret=True,
    )
    an = np.sort(np.asarray(a), axis=1)[:, :k]
    cn = np.sort(np.asarray(cd), axis=1)[:, :k]
    np.testing.assert_allclose(cn, an, rtol=1e-5, atol=1e-5)
    # completeness proof holds on spread data (no fallback needed)
    tau = cn[:, k - 1]
    assert (np.asarray(d4).min(axis=1) > tau).all()


def test_binned_drop_detector_fires_on_class_crowding():
    """FIVE identical rows in one residue class (same list) overflow the
    2-in-step + 3-tier capacity; drop_min must record a dropped value at
    the tie distance so the caller's completeness proof fails (and the
    search wrapper falls back — covered by test_strict_tie_contract)."""
    import vectorindex_tpu.kernels.ivf_probe as kp
    from vectorindex_tpu.bench.synth import pack_ivf
    from vectorindex_tpu.ops.ivf import ivf_select

    d, nlist = 16, 2
    # list 0: 5 duplicates at slot positions 0, C, 2C, ... — all class 0.
    # pack_ivf keeps one list contiguous, slots = CSR offsets 0..4 — to
    # crowd ONE class we need rows spaced C apart: use 5 blocks' worth of
    # filler so the duplicates land at offsets {0, 256, 512, 768, 1024}.
    nfill = 4 * kp.CBINS - 4
    dup = np.ones((5, d), np.float32)
    fill = 100.0 + np.arange(nfill * d, dtype=np.float32).reshape(nfill, d) / (nfill * d)
    x = np.concatenate([dup, fill])
    # interleave: dup rows at list-0 offsets 0,256,512,768,1024
    slots = [0, 256, 512, 768, 1024]
    xx = np.empty_like(x)
    rest = [i for i in range(len(x)) if i not in slots]
    xx[slots] = dup
    xx[rest] = fill
    assign = np.zeros(len(x), np.int32)
    arrays, order, probe_cap = pack_ivf(xx, assign, nlist, storage_dtype=jnp.float32)
    q = jnp.asarray(np.ones((1, d), np.float32))
    cent = np.zeros((nlist, d), np.float32)
    _, pl_ = ivf_select(q, jnp.asarray(cent), nprobe=1, metric=Metric.L2)
    cd, ci, d4 = kp.ivf_probe_topc_rankmajor(
        q, arrays.starts[pl_], arrays.lengths[pl_], arrays.vecs,
        arrays.sqnorms, nprobe=1, probe_cap=probe_cap,
        metric=Metric.L2, interpret=True,
    )
    # 5 zero-distance ties in class 0, capacity <= 4 → a 0.0 drop recorded
    assert float(np.asarray(d4)[0].min()) == 0.0
    # and the end-to-end search still returns the 5 duplicates exactly
    sd, si = kp.ivf_search_flat_pallas(
        q, jnp.asarray(cent), arrays, nprobe=1, probe_cap=probe_cap,
        k=5, metric=Metric.L2, interpret=True,
    )
    got = set(np.asarray(si)[0].tolist())
    want = set(np.asarray(arrays.row_ids)[np.asarray(slots)].tolist())
    assert got == want


@pytest.mark.parametrize("skew_case", ["one_giant", "pow2_edges", "empty_heavy"])
def test_rankseg_property_adversarial_skew(skew_case, monkeypatch):
    """Property: the (rank, segment) 2-D grid kernel matches the per-pair
    kernel on EVERY slot for adversarial list-length distributions — the
    regimes where the round-2 whole-region rank-major kernel either refused
    to engage (VMEM gate) or could not exist (probe_cap >> mean length).
    RANK_MAJOR_VMEM is shrunk so segments are 2 blocks and nseg > 1."""
    import jax.numpy as jnp
    import numpy as np

    import vectorindex_tpu.kernels.ivf_probe as kp
    from vectorindex_tpu.bench.synth import pack_ivf
    from vectorindex_tpu.ops.ivf import ivf_select

    b, d, nlist, nprobe = 6, 48, 12, 7
    monkeypatch.setattr(kp, "RANK_MAJOR_VMEM", 2 * (2 * b * 256 * d * 4))
    rng = np.random.default_rng(hash(skew_case) % 2**31)
    if skew_case == "one_giant":
        lengths = [1400] + [5] * (nlist - 1)
    elif skew_case == "pow2_edges":
        lengths = [255, 256, 257, 512, 1, 0, 513, 2, 767, 768, 3, 100]
    else:  # empty_heavy
        lengths = [0] * (nlist - 2) + [900, 4]
    n = sum(lengths)
    assign = np.repeat(np.arange(nlist, dtype=np.int32), lengths)
    x = rng.standard_normal((n, d)).astype(np.float32)
    arrays, order, probe_cap = pack_ivf(x, assign, nlist, storage_dtype=jnp.float32)
    kbr = probe_cap // kp.BLK
    d_pad = arrays.vecs.shape[1]  # storage is lane-padded to 128
    sgb = kp._seg_blocks(b, kbr, d_pad, 4)
    assert sgb >= 1 and -(-kbr // sgb) > 1  # the 2-D grid is really exercised

    q = jnp.asarray(rng.standard_normal((b, d)).astype(np.float32))
    cent = np.stack(
        [x[assign == i].mean(0) if (assign == i).any() else np.zeros(d) for i in range(nlist)]
    ).astype(np.float32)
    _, pl_ = ivf_select(q, jnp.asarray(cent), nprobe=nprobe, metric=Metric.L2)
    starts = arrays.starts[pl_]
    lens = arrays.lengths[pl_]
    a = kp.ivf_probe_scores(
        q, starts, lens, arrays.vecs, arrays.sqnorms,
        nprobe=nprobe, probe_cap=probe_cap, metric=Metric.L2, interpret=True,
    )
    r = kp.ivf_probe_scores_rankmajor(
        q, starts, lens, arrays.vecs, arrays.sqnorms,
        nprobe=nprobe, probe_cap=probe_cap, metric=Metric.L2, interpret=True,
    )
    an, rn = np.asarray(a), np.asarray(r)
    np.testing.assert_array_equal(np.isfinite(an), np.isfinite(rn))
    np.testing.assert_allclose(
        rn[np.isfinite(rn)], an[np.isfinite(an)], rtol=1e-5, atol=1e-5
    )


def test_filtered_l2_rank_major_matches_pair_path():
    """L2 row-allow filtering rides the sqnorm stream through the fast
    rank-major kernel (round 4: the pair-path fallback measured 24x slower
    at the bench point). Results must be identical to the exhaustive pair
    path with the mask applied on the probed-distance matrix, and every
    returned id must be allowed."""
    cent, x, store = _clustered(n=1200, kc=11)
    arrays = store.sync_device()
    cap = probe_cap_for(store.max_length)
    rng = np.random.default_rng(7)
    b, k = 8, 10  # b <= 16: rank-major eligible
    q = jnp.asarray(rng.standard_normal((b, x.shape[1])).astype(np.float32))
    c = jnp.asarray(cent)
    allow_corpus = rng.random(x.shape[0]) < 0.2
    row_ids = np.asarray(arrays.row_ids)
    ra = np.zeros(row_ids.shape[0], dtype=bool)
    live = row_ids >= 0
    ra[live] = allow_corpus[row_ids[live]]
    row_allow = jnp.asarray(ra)

    d_rm, i_rm = ivf_search_flat_pallas(
        q, c, arrays, None, row_allow,
        nprobe=11, probe_cap=cap, k=k, metric=Metric.L2, interpret=True,
    )
    # force the pair path by exceeding the rank-major batch bound: pad the
    # query batch past 16 and compare the shared prefix
    q_big = jnp.concatenate([q] * 3, axis=0)  # b=24 > 16
    d_pp, i_pp = ivf_search_flat_pallas(
        q_big, c, arrays, None, row_allow,
        nprobe=11, probe_cap=cap, k=k, metric=Metric.L2, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(i_rm), np.asarray(i_pp)[:b])
    np.testing.assert_allclose(
        np.asarray(d_rm), np.asarray(d_pp)[:b], atol=1e-4, rtol=1e-4
    )
    ids = np.asarray(i_rm)
    for row in ids:
        lv = row[row != INVALID_ID]
        assert len(lv) == k  # k results survive a 20%-selective filter
        assert allow_corpus[lv].all()
    # brute force over the allowed subset at full probe = exact
    allowed = np.flatnonzero(allow_corpus)
    qn = np.asarray(q)
    dist = (
        np.sum(qn**2, 1)[:, None]
        + np.sum(x[allowed] ** 2, 1)[None, :]
        - 2.0 * qn @ x[allowed].T
    )
    ref = allowed[np.argsort(dist, axis=1, kind="stable")[:, :k]]
    assert (np.sort(ref, axis=1) == np.sort(ids, axis=1)).mean() > 0.95
