"""Index protocol and shared result types.

Parity targets:
  - VectorIndexProtocol (actor protocol)   IndexProtocols.swift:56-110
  - SearchResult                           IndexProtocols.swift:29
  - IndexStats                             IndexProtocols.swift:39

The reference serializes mutation through Swift actors; here each index is a
plain host object owning functional device arrays — the JAX single-controller
model makes the actor moot (SURVEY.md §2.4 row 1). The full CRUD+search+
persistence surface is preserved: insert/remove/update/search/batch_search/
optimize/save/load/compact/statistics.
"""

from __future__ import annotations

import abc
from dataclasses import dataclass, field
from typing import Any, Callable, Hashable, Optional, Sequence

import numpy as np

VectorID = Hashable  # reference VectorID is String; we accept str or int
Metadata = Optional[dict]
FilterFn = Callable[[Metadata], bool]


@dataclass
class SearchResult:
    """One hit (reference SearchResult, IndexProtocols.swift:29).

    score is the metric's public value: true L2 distance (sqrt applied at the
    API boundary like HNSWIndex.swift:158), dot product for IP, similarity
    for cosine. Results are ordered best-first.
    """

    id: VectorID
    score: float
    metadata: Metadata = None


@dataclass
class IndexStats:
    """Typed stats (reference IndexStats, IndexProtocols.swift:39) with a
    details map per index family (HNSWIndex.swift:374-395,
    IVFIndex.swift:612-628)."""

    count: int
    dimension: int
    metric: str
    memory_bytes: int
    details: dict[str, Any] = field(default_factory=dict)


class VectorIndex(abc.ABC):
    """The index family interface (reference VectorIndexProtocol,
    IndexProtocols.swift:56-110)."""

    # -- CRUD --

    @abc.abstractmethod
    def insert(self, id: VectorID, vector, metadata: Metadata = None) -> None: ...

    @abc.abstractmethod
    def remove(self, id: VectorID) -> None: ...

    @abc.abstractmethod
    def update(
        self, id: VectorID, vector=None, metadata: Metadata = None
    ) -> None: ...

    @abc.abstractmethod
    def contains(self, id: VectorID) -> bool: ...

    def insert_batch(
        self,
        ids: Sequence[VectorID],
        vectors,
        metadatas: Optional[Sequence[Metadata]] = None,
    ) -> None:
        vectors = np.asarray(vectors)
        for i, id_ in enumerate(ids):
            self.insert(id_, vectors[i], None if metadatas is None else metadatas[i])

    # -- search --

    @abc.abstractmethod
    def search(
        self, query, k: int, filter: Optional[FilterFn] = None
    ) -> list[SearchResult]: ...

    @abc.abstractmethod
    def batch_search(
        self, queries, k: int, filter: Optional[FilterFn] = None
    ) -> list[list[SearchResult]]: ...

    # -- maintenance --

    def optimize(self) -> None:
        """Rebuild acceleration structures (reference optimize(); k-means for
        IVF, no-op for flat)."""

    def compact(self) -> None:
        """Reclaim tombstoned slots."""

    # -- persistence --

    @abc.abstractmethod
    def save(self, path: str) -> None: ...

    @abc.abstractmethod
    def statistics(self) -> IndexStats: ...
