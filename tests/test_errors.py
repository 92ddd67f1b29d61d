"""Error-infrastructure coverage (reference ErrorInfrastructureTests — the
43-test suite per docs/CHANGELOG.md:64; SURVEY.md §5.3): the full
IndexErrorKind matrix (category + recoverability per kind,
IndexErrorKind.swift:42-122), fluent builder, cause chains with root_cause
(VectorIndexError.swift:10-40), and the error paths every index family must
actually raise."""

import numpy as np
import pytest

from vectorindex_tpu.models.flat import FlatIndex
from vectorindex_tpu.models.hnsw import HNSWConfig, HNSWIndex
from vectorindex_tpu.models.ivf import IVFConfig, IVFIndex, IVFPQConfig, IVFPQIndex
from vectorindex_tpu.utils.config import Metric
from vectorindex_tpu.utils.errors import (
    ErrorBuilder,
    ErrorCategory,
    IndexError as VIndexError,
    IndexErrorContext,
    IndexErrorKind,
    dimension_mismatch,
    duplicate_id,
    not_found,
)

# ---------------------------------------------------------------------------
# kind matrix: every kind carries the documented category + recoverability
# ---------------------------------------------------------------------------

_EXPECTED = {
    # validation — all recoverable
    IndexErrorKind.DIMENSION_MISMATCH: (ErrorCategory.VALIDATION, True),
    IndexErrorKind.INVALID_ARGUMENT: (ErrorCategory.VALIDATION, True),
    IndexErrorKind.INVALID_VECTOR: (ErrorCategory.VALIDATION, True),
    IndexErrorKind.INVALID_ID: (ErrorCategory.VALIDATION, True),
    IndexErrorKind.EMPTY_INPUT: (ErrorCategory.VALIDATION, True),
    IndexErrorKind.OUT_OF_RANGE: (ErrorCategory.VALIDATION, True),
    # resource
    IndexErrorKind.OUT_OF_MEMORY: (ErrorCategory.RESOURCE, False),
    IndexErrorKind.CAPACITY_EXCEEDED: (ErrorCategory.RESOURCE, True),
    IndexErrorKind.IO_ERROR: (ErrorCategory.RESOURCE, True),
    IndexErrorKind.DEVICE_UNAVAILABLE: (ErrorCategory.RESOURCE, True),
    # data integrity — never recoverable
    IndexErrorKind.CORRUPT_DATA: (ErrorCategory.DATA_INTEGRITY, False),
    IndexErrorKind.CHECKSUM_MISMATCH: (ErrorCategory.DATA_INTEGRITY, False),
    IndexErrorKind.VERSION_MISMATCH: (ErrorCategory.DATA_INTEGRITY, False),
    IndexErrorKind.ENDIANNESS_MISMATCH: (ErrorCategory.DATA_INTEGRITY, False),
    # operation
    IndexErrorKind.NOT_FOUND: (ErrorCategory.OPERATION, True),
    IndexErrorKind.DUPLICATE_ID: (ErrorCategory.OPERATION, True),
    IndexErrorKind.NOT_TRAINED: (ErrorCategory.OPERATION, True),
    IndexErrorKind.UNSUPPORTED_OPERATION: (ErrorCategory.OPERATION, False),
    IndexErrorKind.UNSUPPORTED_METRIC: (ErrorCategory.OPERATION, True),
    IndexErrorKind.CONCURRENT_MODIFICATION: (ErrorCategory.OPERATION, True),
    # configuration / internal
    IndexErrorKind.INVALID_CONFIGURATION: (ErrorCategory.CONFIGURATION, True),
    IndexErrorKind.INTERNAL_INVARIANT: (ErrorCategory.INTERNAL, False),
    IndexErrorKind.NOT_IMPLEMENTED: (ErrorCategory.INTERNAL, False),
}


def test_every_kind_is_covered():
    assert set(_EXPECTED) == set(IndexErrorKind)
    assert len(IndexErrorKind) == 23  # reference: 23 kinds in 6 categories


@pytest.mark.parametrize("kind", list(IndexErrorKind))
def test_kind_category_and_recoverability(kind):
    cat, rec = _EXPECTED[kind]
    assert kind.category is cat
    assert kind.recoverable is rec
    err = ErrorBuilder(kind).message("x").build()
    assert err.category is cat
    assert err.recoverable is rec


def test_six_categories():
    assert len({k.category for k in IndexErrorKind}) == 6


def test_slugs_unique():
    slugs = [k.slug for k in IndexErrorKind]
    assert len(slugs) == len(set(slugs))


# ---------------------------------------------------------------------------
# builder / chaining / context
# ---------------------------------------------------------------------------


def test_builder_fluent_fields():
    err = (
        ErrorBuilder(IndexErrorKind.IO_ERROR)
        .message("disk went away")
        .operation("save")
        .detail("path", "/tmp/x")
        .detail("attempt", 2)
        .build()
    )
    assert err.kind is IndexErrorKind.IO_ERROR
    assert err.message == "disk went away"
    assert err.context.operation == "save"
    assert err.context.details == {"path": "/tmp/x", "attempt": 2}
    assert "[io_error]" in str(err)


def test_cause_chain_and_root_cause():
    root = OSError("ENOSPC")
    mid = (
        ErrorBuilder(IndexErrorKind.IO_ERROR).message("write failed").caused_by(root).build()
    )
    top = (
        ErrorBuilder(IndexErrorKind.CORRUPT_DATA)
        .message("partial record")
        .caused_by(mid)
        .build()
    )
    assert top.cause is mid
    assert top.root_cause() is root
    assert top.__cause__ is mid  # python exception chaining wired up


def test_root_cause_self_when_unchained():
    err = ErrorBuilder(IndexErrorKind.NOT_FOUND).message("nope").build()
    assert err.root_cause() is err


def test_context_defaults_independent():
    a = IndexErrorContext()
    b = IndexErrorContext()
    a.details["k"] = 1
    assert b.details == {}


def test_helper_constructors():
    e = dimension_mismatch(8, 4, "op")
    assert e.kind is IndexErrorKind.DIMENSION_MISMATCH
    assert e.context.details == {"expected": 8, "got": 4}
    assert not_found("x").kind is IndexErrorKind.NOT_FOUND
    assert duplicate_id("x").kind is IndexErrorKind.DUPLICATE_ID


# ---------------------------------------------------------------------------
# error paths raised by every index family
# ---------------------------------------------------------------------------

_FAMILIES = [
    lambda: FlatIndex(8),
    lambda: HNSWIndex(8, config=HNSWConfig(m=4, ef_construction=16)),
    lambda: IVFIndex(8, config=IVFConfig(nlist=2)),
    lambda: IVFPQIndex(8, config=IVFPQConfig(nlist=2, m=2, ks=16)),
]


@pytest.mark.parametrize("mk", _FAMILIES)
def test_insert_dimension_mismatch(mk):
    idx = mk()
    with pytest.raises(VIndexError) as ei:
        idx.insert("a", np.zeros(5, np.float32))
    assert ei.value.kind is IndexErrorKind.DIMENSION_MISMATCH


@pytest.mark.parametrize("mk", _FAMILIES)
def test_insert_duplicate_id(mk):
    idx = mk()
    idx.insert("a", np.ones(8, np.float32))
    with pytest.raises(VIndexError) as ei:
        idx.insert("a", np.ones(8, np.float32))
    assert ei.value.kind is IndexErrorKind.DUPLICATE_ID


@pytest.mark.parametrize("mk", _FAMILIES)
def test_insert_nonfinite_vector(mk):
    idx = mk()
    v = np.ones(8, np.float32)
    v[3] = np.nan
    with pytest.raises(VIndexError) as ei:
        idx.insert("a", v)
    assert ei.value.kind is IndexErrorKind.INVALID_VECTOR


@pytest.mark.parametrize("mk", _FAMILIES)
def test_remove_missing_raises_not_found(mk):
    idx = mk()
    with pytest.raises(VIndexError) as ei:
        idx.remove("ghost")
    assert ei.value.kind is IndexErrorKind.NOT_FOUND


@pytest.mark.parametrize("mk", _FAMILIES)
def test_search_dimension_mismatch(mk):
    idx = mk()
    idx.insert("a", np.ones(8, np.float32))
    with pytest.raises(VIndexError) as ei:
        idx.search(np.zeros(3, np.float32), k=1)
    assert ei.value.kind is IndexErrorKind.DIMENSION_MISMATCH


def test_unsupported_metric_per_family():
    with pytest.raises(VIndexError) as ei:
        HNSWIndex(8, metric=Metric.MANHATTAN)
    assert ei.value.kind is IndexErrorKind.UNSUPPORTED_METRIC
    with pytest.raises(VIndexError) as ei:
        IVFIndex(8, metric=Metric.CHEBYSHEV)
    assert ei.value.kind is IndexErrorKind.UNSUPPORTED_METRIC
    with pytest.raises(VIndexError) as ei:
        IVFPQIndex(8, metric=Metric.COSINE)  # PQ narrows to L2/IP
    assert ei.value.kind is IndexErrorKind.UNSUPPORTED_METRIC


def test_ivfpq_bad_subspace_config():
    with pytest.raises(VIndexError) as ei:
        IVFPQIndex(10, config=IVFPQConfig(nlist=2, m=3, ks=16))
    assert ei.value.kind is IndexErrorKind.INVALID_CONFIGURATION


def test_ivfpq_pq4_odd_m_config():
    with pytest.raises(VIndexError) as ei:
        IVFPQIndex(9, config=IVFPQConfig(nlist=2, m=3, ks=16))
    assert ei.value.kind is IndexErrorKind.INVALID_CONFIGURATION
