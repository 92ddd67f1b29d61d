"""Typed vector overloads — array-protocol interop sugar.

Parity target: reference TypedOverloads.swift:6-24 — generic
`VectorProtocol` overloads letting each index accept VectorCore's typed
vector structs without manual conversion; VectorReferenceCollection.swift's
typed views.

Python analog: a `VectorLike` protocol (anything exposing __array__ /
tolist / being a sequence of floats) plus `as_vector`/`as_matrix` adapters
that every index entry point routes through. Covers numpy arrays, JAX
arrays, torch CPU tensors, array.array, memoryview, and plain sequences.
"""

from __future__ import annotations

from typing import Any, Protocol, Sequence, Union, runtime_checkable

import numpy as np

from vectorindex_tpu.utils.errors import ErrorBuilder, IndexErrorKind


@runtime_checkable
class VectorLike(Protocol):
    """Anything convertible to a 1-D float vector."""

    def __array__(self) -> Any: ...  # pragma: no cover - protocol


VectorInput = Union[VectorLike, Sequence[float], bytes, memoryview]


def as_vector(v: VectorInput, dimension: int | None = None) -> np.ndarray:
    """Normalize any vector-like input to a contiguous f32 [d] array.
    Torch tensors are accepted via __array__ (CPU only — device tensors
    must be moved by the caller)."""
    try:
        arr = np.asarray(v, dtype=np.float32).reshape(-1)
    except (TypeError, ValueError) as e:
        raise (
            ErrorBuilder(IndexErrorKind.INVALID_VECTOR)
            .message(f"cannot convert {type(v).__name__} to a float vector")
            .caused_by(e)
            .build()
        )
    if dimension is not None and arr.shape[0] != dimension:
        from vectorindex_tpu.utils.errors import dimension_mismatch

        raise dimension_mismatch(dimension, arr.shape[0], "as_vector")
    return np.ascontiguousarray(arr)


def as_matrix(vs, dimension: int | None = None) -> np.ndarray:
    """Normalize a batch of vector-likes to f32 [n, d]."""
    try:
        arr = np.asarray(vs, dtype=np.float32)
    except (TypeError, ValueError):
        arr = np.stack([as_vector(v) for v in vs])
    if arr.ndim == 1:
        arr = arr[None, :]
    if arr.ndim != 2:
        raise (
            ErrorBuilder(IndexErrorKind.INVALID_VECTOR)
            .message(f"expected 2-D batch, got ndim={arr.ndim}")
            .build()
        )
    if dimension is not None and arr.shape[1] != dimension:
        from vectorindex_tpu.utils.errors import dimension_mismatch

        raise dimension_mismatch(dimension, arr.shape[1], "as_matrix")
    return np.ascontiguousarray(arr)
