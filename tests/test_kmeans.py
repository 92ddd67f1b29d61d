"""K-means stack: seeding quality, convergence, determinism, streaming
(reference KMeansSeeding/KMeansMiniBatch test patterns — SURVEY.md §4)."""

import jax.numpy as jnp
import numpy as np
import pytest

from vectorindex_tpu.ops import kmeans as km
from vectorindex_tpu.ops import rng as vrng


def _blobs(n_per=100, k=8, d=16, spread=0.05, seed=0):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((k, d)).astype(np.float32) * 3
    pts = (
        centers[:, None, :] + rng.standard_normal((k, n_per, d)).astype(np.float32) * spread
    ).reshape(-1, d)
    perm = rng.permutation(len(pts))
    return jnp.asarray(pts[perm]), centers


def test_pp_seed_shapes_and_distinct():
    x, _ = _blobs()
    key = vrng.make_key(1)
    seeds = km.kmeans_pp_seed(key, x, 8)
    assert seeds.shape == (8, x.shape[1])
    # seeds should be distinct points (D² sampling never repeats a chosen
    # point: its distance is 0)
    s = np.asarray(seeds)
    assert len(np.unique(s, axis=0)) == 8


def test_pp_seed_covers_blobs():
    x, centers = _blobs(k=8, spread=0.01)
    seeds = np.asarray(km.kmeans_pp_seed(vrng.make_key(2), x, 8))
    # every true center should have a seed nearby (within blob radius ~0.1)
    d = np.linalg.norm(centers[:, None, :] - seeds[None, :, :], axis=-1)
    assert d.min(axis=1).max() < 0.5


def test_pp_seed_deterministic():
    x, _ = _blobs()
    a = np.asarray(km.kmeans_pp_seed(vrng.make_key(3), x, 5))
    b = np.asarray(km.kmeans_pp_seed(vrng.make_key(3), x, 5))
    np.testing.assert_array_equal(a, b)
    c = np.asarray(km.kmeans_pp_seed(vrng.make_key(4), x, 5))
    assert not np.array_equal(a, c)


def test_parallel_seed_quality():
    x, centers = _blobs(k=16, n_per=50, spread=0.01, seed=5)
    seeds = np.asarray(km.kmeans_parallel_seed(vrng.make_key(5), x, 16))
    assert seeds.shape == (16, x.shape[1])
    d = np.linalg.norm(centers[:, None, :] - seeds[None, :, :], axis=-1)
    assert d.min(axis=1).max() < 1.0  # every blob represented


def test_lloyd_recovers_blobs():
    x, centers = _blobs(k=8, spread=0.02, seed=7)
    res = km.kmeans(x, km.KMeansConfig(k=8, iters=20, algo="lloyd", seed=7))
    got = np.asarray(res.centroids)
    d = np.linalg.norm(centers[:, None, :] - got[None, :, :], axis=-1)
    assert d.min(axis=1).max() < 0.1  # centroids land on true centers
    assert float(res.inertia) < x.shape[0] * 0.02**2 * x.shape[1] * 3


def test_lloyd_inertia_decreases_vs_seed_only():
    x, _ = _blobs(k=8, spread=0.5, seed=9)
    seeds = km.kmeans_pp_seed(vrng.make_key(9), x, 8)
    i0 = float(km.inertia(x, seeds))
    res = km.kmeans_lloyd(vrng.make_key(9), x, seeds, k=8, iters=15)
    assert float(res.inertia) <= i0


def test_minibatch_converges():
    x, centers = _blobs(k=8, n_per=200, spread=0.02, seed=11)
    res = km.kmeans(
        x, km.KMeansConfig(k=8, iters=100, batch_size=256, algo="minibatch", seed=11)
    )
    got = np.asarray(res.centroids)
    d = np.linalg.norm(centers[:, None, :] - got[None, :, :], axis=-1)
    assert d.min(axis=1).max() < 0.3


def test_assignments_consistent():
    x, _ = _blobs()
    res = km.kmeans(x, km.KMeansConfig(k=8, iters=10, seed=1))
    assign, d2 = km.assign_clusters(x, res.centroids)
    np.testing.assert_array_equal(np.asarray(assign), np.asarray(res.assignments))
    assert np.asarray(d2).min() >= 0


def test_empty_cluster_repair():
    # k larger than distinct points forces empties; repair keeps centroids finite
    x = jnp.asarray(np.random.default_rng(0).standard_normal((20, 4)).astype(np.float32))
    res = km.kmeans(x, km.KMeansConfig(k=16, iters=5, seed=0))
    assert np.all(np.isfinite(np.asarray(res.centroids)))


def test_streaming_matches_minibatch_ballpark():
    x, centers = _blobs(k=4, n_per=500, spread=0.02, seed=13)
    init = km.kmeans_pp_seed(vrng.make_key(13), x, 4)
    state = km.kmeans_stream_init(init)
    xs = np.asarray(x)
    for c in range(0, len(xs), 250):
        state = km.kmeans_stream_update(state, jnp.asarray(xs[c : c + 250]))
    cent = np.asarray(km.kmeans_stream_finalize(state))
    d = np.linalg.norm(centers[:, None, :] - cent[None, :, :], axis=-1)
    assert d.min(axis=1).max() < 0.3


def test_assign_clusters_chunked_matches_full():
    """The scan-chunked assigner (bounded [chunk, k] intermediate) must agree
    with the full-matrix path on assignments and distances, including the
    ragged tail chunk."""
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((1000, 16)).astype(np.float32))
    cent = jnp.asarray(rng.standard_normal((13, 16)).astype(np.float32))
    a_full, d_full = km.assign_clusters(x, cent)
    a_ch, d_ch = km.assign_clusters_chunked(x, cent, chunk=256)
    np.testing.assert_array_equal(np.asarray(a_full), np.asarray(a_ch))
    np.testing.assert_allclose(np.asarray(d_full), np.asarray(d_ch), rtol=1e-5)


def test_parallel_seed_large_k_quality():
    """k > 256 routes through k-means|| with bf16 chunked reductions; the
    seeds must still cover well-separated blobs (selection-grade precision
    is enough for D^2 sampling)."""
    x, centers = _blobs(k=20, n_per=200, spread=0.02, seed=5)
    seeds = km.kmeans_parallel_seed(vrng.make_key(5), x, 300, rounds=3)
    assert seeds.shape == (300, x.shape[1])
    d = np.linalg.norm(
        centers[:, None, :] - np.asarray(seeds)[None, :, :], axis=-1
    )
    # every true blob center has a seed nearby
    assert d.min(axis=1).max() < 0.5
