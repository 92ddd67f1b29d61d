"""Top-k selection/merge: determinism and the (score, id) tie-break contract
(reference TopK.swift:8-30, TopKMerge.swift:66-71)."""

import jax
import jax.numpy as jnp
import numpy as np

from vectorindex_tpu.ops import topk as tk


def test_topk_basic():
    d = jnp.asarray([[3.0, 1.0, 2.0, 0.5, 9.0]])
    dist, ids = tk.topk(d, 3)
    np.testing.assert_allclose(np.asarray(dist), [[0.5, 1.0, 2.0]])
    np.testing.assert_array_equal(np.asarray(ids), [[3, 1, 2]])


def test_topk_tie_break_by_id():
    # equal scores → ascending id order (reference TopK.swift:8-30)
    d = jnp.asarray([[1.0, 1.0, 1.0, 0.0]])
    ids = jnp.asarray([[42, 7, 13, 99]])
    dist, out = tk.topk(d, 4, ids=ids, strict_ties=True)
    np.testing.assert_array_equal(np.asarray(out), [[99, 7, 13, 42]])


def test_topk_vs_numpy_random():
    rng = np.random.default_rng(1)
    d = rng.standard_normal((5, 301)).astype(np.float32)
    dist, ids = tk.topk(jnp.asarray(d), 17)
    ref = np.sort(d, axis=-1)[:, :17]
    np.testing.assert_allclose(np.asarray(dist), ref, rtol=1e-6)
    # ids must point at the right values
    np.testing.assert_allclose(
        np.take_along_axis(d, np.asarray(ids), axis=-1), ref, rtol=1e-6
    )


def test_topk_fast_path_matches_strict_when_no_ties():
    rng = np.random.default_rng(2)
    d = jnp.asarray(rng.standard_normal((3, 100)).astype(np.float32))
    d1, i1 = tk.topk(d, 10, strict_ties=True)
    d2, i2 = tk.topk(d, 10, strict_ties=False)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


def test_topk_k_larger_than_n():
    d = jnp.asarray([[2.0, 1.0]])
    dist, ids = tk.topk(d, 5)
    assert dist.shape == (1, 2)


def test_merge_topk_deterministic_across_list_order():
    rng = np.random.default_rng(3)
    # 4 shards × 8 partials with globally unique ids
    dists = rng.standard_normal((4, 8)).astype(np.float32)
    ids = np.arange(32, dtype=np.int32).reshape(4, 8)
    d1, i1 = tk.merge_topk(jnp.asarray(dists), jnp.asarray(ids), 10)
    perm = [2, 0, 3, 1]
    d2, i2 = tk.merge_topk(jnp.asarray(dists[perm]), jnp.asarray(ids[perm]), 10)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2))


def test_merge_topk_matches_global_topk():
    rng = np.random.default_rng(4)
    n, shards, k = 640, 8, 13
    d = rng.standard_normal((n,)).astype(np.float32)
    ids = np.arange(n, dtype=np.int32)
    # per-shard topk then merge == global topk
    ds = d.reshape(shards, -1)
    per_d, per_i = tk.topk(jnp.asarray(ds), k, ids=jnp.asarray(ids.reshape(shards, -1)))
    md, mi = tk.merge_topk(per_d[None], per_i[None], k)
    gd, gi = tk.topk(jnp.asarray(d)[None], k)
    np.testing.assert_allclose(np.asarray(md), np.asarray(gd), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(mi), np.asarray(gi))


def test_topk_padded_sentinels():
    d = jnp.asarray([[1.0, 2.0, 3.0, 4.0]])
    valid = jnp.asarray([[True, False, True, False]])
    ids = jnp.asarray([[10, 11, 12, 13]])
    dist, out = tk.topk_padded(d, valid, 3, ids=ids)
    assert np.asarray(dist)[0, 2] == np.inf
    assert np.asarray(out)[0, 2] == tk.INVALID_ID
    np.testing.assert_array_equal(np.asarray(out)[0, :2], [10, 12])


def test_topk_jit():
    f = jax.jit(lambda d: tk.topk(d, 4))
    d = jnp.asarray(np.random.default_rng(5).standard_normal((2, 50), ).astype(np.float32))
    dist, ids = f(d)
    assert dist.shape == (2, 4)
