"""Structured error infrastructure.

Parity target: reference ErrorHandling/ (VectorIndexError.swift:10-40,
IndexErrorKind.swift:42-122, ErrorBuilder.swift, IndexErrorContext.swift) —
23 error kinds in 6 categories, recoverability flags, context payloads, and
error chaining with a root cause.
"""

from __future__ import annotations

import enum
from dataclasses import dataclass, field
from typing import Any, Optional


class ErrorCategory(enum.Enum):
    VALIDATION = "validation"
    RESOURCE = "resource"
    DATA_INTEGRITY = "data_integrity"
    OPERATION = "operation"
    CONFIGURATION = "configuration"
    INTERNAL = "internal"


class IndexErrorKind(enum.Enum):
    # -- validation --
    DIMENSION_MISMATCH = ("dimension_mismatch", ErrorCategory.VALIDATION, True)
    INVALID_ARGUMENT = ("invalid_argument", ErrorCategory.VALIDATION, True)
    INVALID_VECTOR = ("invalid_vector", ErrorCategory.VALIDATION, True)
    INVALID_ID = ("invalid_id", ErrorCategory.VALIDATION, True)
    EMPTY_INPUT = ("empty_input", ErrorCategory.VALIDATION, True)
    OUT_OF_RANGE = ("out_of_range", ErrorCategory.VALIDATION, True)
    # -- resource --
    OUT_OF_MEMORY = ("out_of_memory", ErrorCategory.RESOURCE, False)
    CAPACITY_EXCEEDED = ("capacity_exceeded", ErrorCategory.RESOURCE, True)
    IO_ERROR = ("io_error", ErrorCategory.RESOURCE, True)
    DEVICE_UNAVAILABLE = ("device_unavailable", ErrorCategory.RESOURCE, True)
    # -- data integrity --
    CORRUPT_DATA = ("corrupt_data", ErrorCategory.DATA_INTEGRITY, False)
    CHECKSUM_MISMATCH = ("checksum_mismatch", ErrorCategory.DATA_INTEGRITY, False)
    VERSION_MISMATCH = ("version_mismatch", ErrorCategory.DATA_INTEGRITY, False)
    ENDIANNESS_MISMATCH = ("endianness_mismatch", ErrorCategory.DATA_INTEGRITY, False)
    # -- operation --
    NOT_FOUND = ("not_found", ErrorCategory.OPERATION, True)
    DUPLICATE_ID = ("duplicate_id", ErrorCategory.OPERATION, True)
    NOT_TRAINED = ("not_trained", ErrorCategory.OPERATION, True)
    UNSUPPORTED_OPERATION = ("unsupported_operation", ErrorCategory.OPERATION, False)
    UNSUPPORTED_METRIC = ("unsupported_metric", ErrorCategory.OPERATION, True)
    CONCURRENT_MODIFICATION = ("concurrent_modification", ErrorCategory.OPERATION, True)
    # -- configuration --
    INVALID_CONFIGURATION = ("invalid_configuration", ErrorCategory.CONFIGURATION, True)
    # -- internal --
    INTERNAL_INVARIANT = ("internal_invariant", ErrorCategory.INTERNAL, False)
    NOT_IMPLEMENTED = ("not_implemented", ErrorCategory.INTERNAL, False)

    def __init__(self, slug: str, category: ErrorCategory, recoverable: bool):
        self.slug = slug
        self.category = category
        self.recoverable = recoverable


@dataclass
class IndexErrorContext:
    """Structured context attached to an error (reference IndexErrorContext.swift)."""

    operation: str = ""
    details: dict[str, Any] = field(default_factory=dict)


class IndexError(Exception):
    """Structured index error with kind, context, and a cause chain.

    Mirrors reference VectorIndexError.swift:10-40 (kind + message + context +
    chained underlying error).
    """

    def __init__(
        self,
        kind: IndexErrorKind,
        message: str,
        context: Optional[IndexErrorContext] = None,
        cause: Optional[BaseException] = None,
    ):
        self.kind = kind
        self.message = message
        self.context = context or IndexErrorContext()
        self.cause = cause
        super().__init__(f"[{kind.slug}] {message}")
        if cause is not None:
            self.__cause__ = cause

    @property
    def category(self) -> ErrorCategory:
        return self.kind.category

    @property
    def recoverable(self) -> bool:
        return self.kind.recoverable

    def root_cause(self) -> BaseException:
        err: BaseException = self
        while getattr(err, "cause", None) is not None:
            err = err.cause  # type: ignore[assignment]
        return err


class ErrorBuilder:
    """Fluent builder (reference ErrorBuilder.swift)."""

    def __init__(self, kind: IndexErrorKind):
        self._kind = kind
        self._message = ""
        self._context = IndexErrorContext()
        self._cause: Optional[BaseException] = None

    def message(self, msg: str) -> "ErrorBuilder":
        self._message = msg
        return self

    def operation(self, op: str) -> "ErrorBuilder":
        self._context.operation = op
        return self

    def detail(self, key: str, value: Any) -> "ErrorBuilder":
        self._context.details[key] = value
        return self

    def caused_by(self, err: BaseException) -> "ErrorBuilder":
        self._cause = err
        return self

    def build(self) -> IndexError:
        return IndexError(self._kind, self._message, self._context, self._cause)


def dimension_mismatch(expected: int, got: int, operation: str = "") -> IndexError:
    return (
        ErrorBuilder(IndexErrorKind.DIMENSION_MISMATCH)
        .message(f"expected dimension {expected}, got {got}")
        .operation(operation)
        .detail("expected", expected)
        .detail("got", got)
        .build()
    )


def not_found(identifier: Any, operation: str = "") -> IndexError:
    return (
        ErrorBuilder(IndexErrorKind.NOT_FOUND)
        .message(f"id not found: {identifier!r}")
        .operation(operation)
        .detail("id", identifier)
        .build()
    )


def duplicate_id(identifier: Any, operation: str = "") -> IndexError:
    return (
        ErrorBuilder(IndexErrorKind.DUPLICATE_ID)
        .message(f"duplicate id: {identifier!r}")
        .operation(operation)
        .detail("id", identifier)
        .build()
    )
