"""Sharded IVF-PQ (codes shard like vectors) + 2-D replica×data mesh
(round-1 VERDICT #7). Validated on the 8-virtual-device CPU mesh: shard-count
invariance vs the single-device ADC path, exactness of the per-shard rerank,
and query-sharded 2-D flat search equal to the 1-D result."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vectorindex_tpu.ops import pq as pq_ops
from vectorindex_tpu.ops.ivf import IVFListStore, probe_cap_for
from vectorindex_tpu.ops.ivf_pq import ivf_search_pq, rerank_rows
from vectorindex_tpu.parallel.mesh import make_mesh, make_mesh_2d
from vectorindex_tpu.parallel.sharded_ivf import (
    partition_store,
    sharded_ivf_pq_search,
)
from vectorindex_tpu.parallel.sharded_search import (
    sharded_flat_search,
    sharded_flat_search_2d,
)
from vectorindex_tpu.ops import rng as vrng
from vectorindex_tpu.utils.config import Metric


def _pq_fixture(n=600, d=16, kc=8, m=4, ks=16, seed=0):
    rng = np.random.default_rng(seed)
    cent = rng.standard_normal((kc, d)).astype(np.float32)
    assign = rng.integers(0, kc, n)
    x = (cent[assign] + 0.25 * rng.standard_normal((n, d))).astype(np.float32)
    store = IVFListStore(kc, d)
    store.append_batch(assign, np.arange(n), x)
    arrays = store.sync_device()
    # residual PQ books + codes in the CSR layout
    starts = np.asarray(arrays.starts)
    lengths = np.asarray(arrays.lengths)
    n_pad = arrays.vecs.shape[0]
    row_list = np.zeros(n_pad, dtype=np.int32)
    for l in range(kc):
        row_list[starts[l] : starts[l] + lengths[l]] = l
    books = pq_ops.pq_train_residual(
        vrng.make_key(0, 1), jnp.asarray(x), jnp.asarray(cent),
        jnp.asarray(assign.astype(np.int32)), m=m, ks=ks, iters=8,
    )
    codes = pq_ops.pq_encode_residual(
        arrays.vecs.astype(jnp.float32), jnp.asarray(cent),
        jnp.asarray(row_list), books, chunk=256,
    )
    return cent, x, store, arrays, books, codes


@pytest.mark.parametrize("n_shards", [2, 8])
def test_sharded_adc_matches_single_device(n_shards):
    cent, x, store, arrays, books, codes = _pq_fixture()
    cap = probe_cap_for(store.max_length)
    q = jnp.asarray(np.random.default_rng(1).standard_normal((6, 16)).astype(np.float32))
    d1, i1 = ivf_search_pq(
        q, jnp.asarray(cent), arrays, codes, books,
        nprobe=8, probe_cap=cap, k=10,
    )
    mesh = make_mesh(n_shards)
    sharded = partition_store(store, mesh, codes=codes)
    d2, i2 = sharded_ivf_pq_search(
        mesh, q, jnp.asarray(cent), sharded, books,
        nprobe=8, probe_cap=cap, k=10,
    )
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=1e-4, rtol=1e-4)


def test_sharded_rerank_matches_single_device():
    cent, x, store, arrays, books, codes = _pq_fixture(seed=3)
    cap = probe_cap_for(store.max_length)
    q = jnp.asarray(np.random.default_rng(2).standard_normal((4, 16)).astype(np.float32))
    # single-device: ADC top-C then exact rerank via slot→row table
    c = 32
    ad, ai = ivf_search_pq(
        q, jnp.asarray(cent), arrays, codes, books, nprobe=8, probe_cap=cap, k=c,
    )
    n_slots = int(np.asarray(arrays.row_ids).max()) + 1
    slot_rows = np.full(n_slots, -1, np.int32)
    rid = np.asarray(arrays.row_ids)
    live = rid >= 0
    slot_rows[rid[live]] = np.nonzero(live)[0].astype(np.int32)
    d1, i1 = rerank_rows(
        q, ai, jnp.asarray(slot_rows), arrays.vecs, arrays.sqnorms, k=10,
    )
    mesh = make_mesh(4)
    sharded = partition_store(store, mesh, codes=codes)
    d2, i2 = sharded_ivf_pq_search(
        mesh, q, jnp.asarray(cent), sharded, books,
        nprobe=8, probe_cap=cap, k=10, rerank_c=c,
    )
    # per-shard rerank covers a superset of the single-device ADC top-C, so
    # every single-device result must be present with an exact distance ≥
    # quality (compare sets and distances)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=1e-4, rtol=1e-4)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


def test_packed_u4_sharding():
    cent, x, store, arrays, books, codes = _pq_fixture(ks=16, seed=5)
    from vectorindex_tpu.ops.dtypes import pack_u4

    packed = pack_u4(codes)
    cap = probe_cap_for(store.max_length)
    q = jnp.asarray(np.random.default_rng(4).standard_normal((3, 16)).astype(np.float32))
    d1, i1 = ivf_search_pq(
        q, jnp.asarray(cent), arrays, packed, books,
        nprobe=8, probe_cap=cap, k=8, packed_u4=True,
    )
    mesh = make_mesh(8)
    sharded = partition_store(store, mesh, codes=packed)
    d2, i2 = sharded_ivf_pq_search(
        mesh, q, jnp.asarray(cent), sharded, books,
        nprobe=8, probe_cap=cap, k=8, packed_u4=True,
    )
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


def test_2d_mesh_flat_search_matches_1d():
    rng = np.random.default_rng(0)
    n, d, b, k = 512, 16, 8, 5
    x = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    q = jnp.asarray(rng.standard_normal((b, d)).astype(np.float32))
    valid = jnp.ones((n,), bool)
    mesh1 = make_mesh(8)
    d1, i1 = sharded_flat_search(mesh1, q, x, valid, k)
    mesh2 = make_mesh_2d(2, 4)
    d2, i2 = sharded_flat_search_2d(mesh2, q, x, valid, k)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=1e-5)
    # output really is replica-sharded
    assert len(jax.devices()) == 8


def test_2d_mesh_shape():
    m = make_mesh_2d(4, 2)
    assert m.shape == {"replica": 4, "data": 2}
