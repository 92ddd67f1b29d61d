"""Typed input interop across index entry points.

Parity model: reference TypedOverloadsTests.swift — every index accepts the
shared typed vector kinds without manual conversion. Here: numpy (any float
dtype), JAX arrays, torch CPU tensors, array.array, memoryview, lists,
tuples, generators-of-lists for batches.
"""

import array

import numpy as np
import pytest

from vectorindex_tpu.models.flat import FlatIndex
from vectorindex_tpu.models.hnsw import HNSWConfig, HNSWIndex
from vectorindex_tpu.models.ivf import IVFConfig, IVFIndex
from vectorindex_tpu.models.typed import as_matrix, as_vector
from vectorindex_tpu.utils.config import Metric
from vectorindex_tpu.utils.errors import IndexError as VIError

D = 8


def _variants(v: np.ndarray):
    import jax.numpy as jnp

    yield "numpy_f32", v
    yield "numpy_f64", v.astype(np.float64)
    yield "jax", jnp.asarray(v)
    yield "list", v.tolist()
    yield "tuple", tuple(v.tolist())
    yield "array_array", array.array("f", v.tolist())
    try:
        import torch

        yield "torch", torch.tensor(v)
    except ImportError:  # pragma: no cover
        pass


def test_as_vector_all_variants_equal():
    v = np.arange(D, dtype=np.float32) / 3.0
    for name, var in _variants(v):
        got = as_vector(var, D)
        assert got.dtype == np.float32, name
        np.testing.assert_allclose(got, v, rtol=1e-6, err_msg=name)


def test_as_matrix_mixed_rows():
    rows = [np.ones(D, np.float32), [2.0] * D, tuple([3.0] * D)]
    m = as_matrix(rows, D)
    assert m.shape == (3, D)
    assert (m[1] == 2.0).all()


def test_as_vector_rejects_strings_and_dims():
    with pytest.raises(VIError):
        as_vector("not a vector", D)
    with pytest.raises(VIError):
        as_vector(np.ones(D + 1, np.float32), D)


@pytest.mark.parametrize(
    "mk",
    [
        lambda: FlatIndex(D),
        lambda: HNSWIndex(D, Metric.L2, HNSWConfig(m=4, ef_construction=16, build_chunk=16)),
        lambda: IVFIndex(D, Metric.L2, IVFConfig(nlist=2, nprobe=2)),
    ],
)
def test_every_index_accepts_typed_inserts_and_queries(mk):
    import jax.numpy as jnp

    idx = mk()
    base = np.eye(D, dtype=np.float32) * 4.0
    idx.insert("np", base[0])
    idx.insert("jax", jnp.asarray(base[1]))
    idx.insert("list", base[2].tolist())
    idx.insert("arr", array.array("f", base[3].tolist()))
    try:
        import torch

        idx.insert("torch", torch.tensor(base[4]))
        n_expected = 5
    except ImportError:  # pragma: no cover
        n_expected = 4
    assert idx.count == n_expected
    # query with each kind too
    assert idx.search(base[0].tolist(), 1)[0].id == "np"
    assert idx.search(jnp.asarray(base[1]), 1)[0].id == "jax"
    assert idx.search(array.array("f", base[2].tolist()), 1)[0].id == "list"


def test_batch_insert_accepts_list_of_lists():
    idx = FlatIndex(D)
    rows = [[float(i)] * D for i in range(6)]
    idx.insert_batch([f"v{i}" for i in range(6)], rows)
    assert idx.count == 6
    assert idx.search(rows[4], 1)[0].id == "v4"
