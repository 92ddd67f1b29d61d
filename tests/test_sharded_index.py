"""ShardedFlatIndex on the 8-device CPU mesh: parity with single-device
FlatIndex, CRUD, filters."""

import numpy as np
import pytest

from vectorindex_tpu.models.flat import FlatIndex
from vectorindex_tpu.models.sharded import ShardedFlatIndex
from vectorindex_tpu.utils.config import Metric


def _data(n=500, d=16, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n, d)).astype(np.float32)


def test_sharded_matches_flat():
    x = _data()
    flat = FlatIndex(16)
    sharded = ShardedFlatIndex(16, n_devices=8)
    ids = [f"v{i}" for i in range(len(x))]
    flat.insert_batch(ids, x)
    sharded.insert_batch(ids, x)
    q = x[:10] + 0.01
    r1 = flat.batch_search(q, 7)
    r2 = sharded.batch_search(q, 7)
    for a, b in zip(r1, r2):
        assert [r.id for r in a] == [r.id for r in b]
        np.testing.assert_allclose(
            [r.score for r in a], [r.score for r in b], rtol=1e-5, atol=1e-5
        )


def test_sharded_crud_and_filter():
    x = _data(300)
    idx = ShardedFlatIndex(16, n_devices=4)
    idx.insert_batch(list(range(300)), x, [{"i": i} for i in range(300)])
    idx.remove(5)
    assert idx.search(x[5], 1)[0].id != 5
    res = idx.search(x[0], 5, filter=lambda m: m and m["i"] % 2 == 0)
    assert all(r.metadata["i"] % 2 == 0 for r in res)
    st = idx.statistics()
    assert st.details["n_shards"] == 4


def test_sharded_growth():
    idx = ShardedFlatIndex(8, n_devices=8)
    x = _data(1500, 8, seed=3)
    idx.insert_batch(list(range(1500)), x)
    assert idx.capacity % 8 == 0
    assert idx.search(x[1400], 1)[0].id == 1400


@pytest.mark.parametrize("metric", [Metric.INNER_PRODUCT, Metric.COSINE])
def test_sharded_metrics(metric):
    x = _data(400, 8, seed=4)
    idx = ShardedFlatIndex(8, metric=metric, n_devices=8)
    idx.insert_batch(list(range(400)), x)
    q = x[9]
    res = idx.search(q, 5)
    if metric == Metric.INNER_PRODUCT:
        ref = np.argsort(-(x @ q))[:5]
    else:
        ref = np.argsort(-(x @ q) / (np.linalg.norm(x, axis=1) * np.linalg.norm(q)))[:5]
    assert [r.id for r in res] == ref.tolist()


def test_sharded_persistence_roundtrip(tmp_path):
    x = _data(200, 8, seed=9)
    idx = ShardedFlatIndex(8, n_devices=4)
    idx.insert_batch(list(range(200)), x)
    p = str(tmp_path / "s.json")
    idx.save(p)
    idx2 = ShardedFlatIndex.load(p)
    assert isinstance(idx2, ShardedFlatIndex)
    r1 = [r.id for r in idx.search(x[7], 5)]
    r2 = [r.id for r in idx2.search(x[7], 5)]
    assert r1 == r2


def test_sharded_bf16_storage():
    import jax.numpy as jnp

    x = _data(400, 16, seed=10)
    idx = ShardedFlatIndex(16, n_devices=8, storage_dtype=jnp.bfloat16)
    idx.insert_batch(list(range(400)), x)
    res = idx.batch_search(x[:10], 1)
    top1 = np.mean([row[0].id == i for i, row in enumerate(res)])
    assert top1 >= 0.9  # bf16 quantization keeps self-recall


def test_sharded_flat_id_set_filtering():
    """allow/deny id sets reach the sharded scan mask BEFORE the per-shard
    top-k (round 4: search() forwarded them but batch_search rejected the
    kwargs — every sharded flat search with defaults raised TypeError)."""
    idx = ShardedFlatIndex(8, n_devices=8)
    x = _data(400, 8, seed=9)
    idx.insert_batch(list(range(400)), x)
    allowed = set(range(0, 400, 7))
    res = idx.search(x[21], 5, allow_ids=allowed)
    assert len(res) == 5 and res[0].id == 21
    assert all(r.id in allowed for r in res)
    res2 = idx.search(x[21], 5, deny_ids={21})
    assert len(res2) == 5 and all(r.id != 21 for r in res2)


def test_sharded_hnsw_id_set_filtering():
    from vectorindex_tpu.models.sharded import ShardedHNSWIndex

    idx = ShardedHNSWIndex(8, n_devices=4)
    x = _data(600, 8, seed=10)
    idx.insert_batch(list(range(600)), x)
    res = idx.search(x[33], 3, deny_ids={33})
    assert res and all(r.id != 33 for r in res)
    allowed = set(range(0, 600, 2))
    res2 = idx.search(x[34], 3, allow_ids=allowed)
    assert res2 and all(r.id in allowed for r in res2)
