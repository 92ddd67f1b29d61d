"""Sharded search on the 8-device CPU mesh: shard-count invariance and
determinism of the ICI top-k merge (SURVEY.md §4 rebuild translation — the
multi-chip tests the reference never needed)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vectorindex_tpu.ops import scoring
from vectorindex_tpu.ops.topk import topk_padded
from vectorindex_tpu.parallel import make_mesh, pad_rows, shard_rows, sharded_flat_search
from vectorindex_tpu.utils.config import Metric


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    n, d, b = 4096, 32, 16
    x = rng.standard_normal((n, d)).astype(np.float32)
    q = rng.standard_normal((b, d)).astype(np.float32)
    return jnp.asarray(q), jnp.asarray(x)


def test_eight_devices_available():
    assert len(jax.devices()) == 8


@pytest.mark.parametrize("metric", [Metric.L2, Metric.INNER_PRODUCT, Metric.COSINE])
def test_sharded_matches_single_device(data, metric):
    q, x = data
    valid = jnp.ones((x.shape[0],), dtype=bool)
    # single-device reference
    dist = scoring.distance_block(q, x, metric)
    rd, ri = topk_padded(dist, valid[None], 10)

    mesh = make_mesh(8)
    xs = shard_rows(mesh, x)
    sd, si = sharded_flat_search(mesh, q, xs, valid, 10, metric)
    np.testing.assert_array_equal(np.asarray(si), np.asarray(ri))
    np.testing.assert_allclose(np.asarray(sd), np.asarray(rd), rtol=1e-5, atol=1e-5)


def test_shard_count_invariance(data):
    q, x = data
    valid = jnp.ones((x.shape[0],), dtype=bool)
    results = []
    for n_dev in (1, 2, 4, 8):
        mesh = make_mesh(n_dev)
        xs = shard_rows(mesh, x)
        sd, si = sharded_flat_search(mesh, q, xs, valid, 10, Metric.L2)
        results.append((np.asarray(sd), np.asarray(si)))
    for sd, si in results[1:]:
        np.testing.assert_array_equal(si, results[0][1])
        np.testing.assert_allclose(sd, results[0][0], rtol=1e-6)


def test_sharded_with_padding_and_mask(data):
    q, x = data
    # odd N that doesn't divide 8
    x_odd = x[:4091]
    xp, n = pad_rows(x_odd, 8)
    valid = jnp.arange(xp.shape[0]) < n

    dist = scoring.distance_block(q, x_odd, Metric.L2)
    rd, ri = topk_padded(dist, jnp.ones((1, n), bool), 7)

    mesh = make_mesh(8)
    xs = shard_rows(mesh, xp)
    sd, si = sharded_flat_search(mesh, q, xs, valid, 7, Metric.L2)
    np.testing.assert_array_equal(np.asarray(si), np.asarray(ri))


def test_sharded_with_precomputed_norms(data):
    q, x = data
    valid = jnp.ones((x.shape[0],), dtype=bool)
    sqn = scoring.squared_norms(x)
    mesh = make_mesh(8)
    xs = shard_rows(mesh, x)
    sd, si = sharded_flat_search(
        mesh, q, xs, valid, 5, Metric.L2, x_sqnorms=shard_rows(mesh, sqn)
    )
    dist = scoring.distance_block(q, x, Metric.L2)
    rd, ri = topk_padded(dist, valid[None], 5)
    np.testing.assert_array_equal(np.asarray(si), np.asarray(ri))


# -- sharded IVF --


def test_sharded_ivf_matches_single_device():
    from vectorindex_tpu.ops import ivf as ivf_ops
    from vectorindex_tpu.ops import kmeans as km
    from vectorindex_tpu.parallel.sharded_ivf import (
        partition_store,
        sharded_ivf_search,
    )

    rng = np.random.default_rng(21)
    x = rng.standard_normal((2000, 16)).astype(np.float32)
    res = km.kmeans(jnp.asarray(x), km.KMeansConfig(k=32, iters=8, seed=3))
    store = ivf_ops.IVFListStore(32, 16)
    store.append_batch(np.asarray(res.assignments), np.arange(2000), x)
    arrays = store.sync_device()
    cap = ivf_ops.probe_cap_for(store.max_length)
    q = jnp.asarray(rng.standard_normal((12, 16)).astype(np.float32))

    ref_d, ref_i = ivf_ops.ivf_search_flat(
        q, res.centroids, arrays, nprobe=8, probe_cap=cap, k=5
    )

    mesh = make_mesh(8)
    sharded = partition_store(store, mesh)
    sd, si = sharded_ivf_search(
        mesh, q, res.centroids, sharded, nprobe=8, probe_cap=cap, k=5
    )
    np.testing.assert_array_equal(np.asarray(si), np.asarray(ref_i))
    np.testing.assert_allclose(np.asarray(sd), np.asarray(ref_d), rtol=1e-4, atol=1e-4)


def test_sharded_ivf_balances_lists():
    from vectorindex_tpu.ops import ivf as ivf_ops
    from vectorindex_tpu.parallel.sharded_ivf import partition_store

    rng = np.random.default_rng(22)
    store = ivf_ops.IVFListStore(16, 4)
    # skewed list sizes
    for l in range(16):
        for i in range((l + 1) * 10):
            store.append(l, l * 1000 + i, rng.standard_normal(4).astype(np.float32))
    mesh = make_mesh(4)
    sharded = partition_store(store, mesh)
    lens = np.asarray(sharded.lengths)
    per_shard = lens.sum(axis=1)
    assert per_shard.sum() == sum((l + 1) * 10 for l in range(16))
    assert per_shard.max() <= per_shard.min() * 2  # greedy balance
