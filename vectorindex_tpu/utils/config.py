"""Shared configuration types.

The reference has no global config system — per-kernel options structs with a
static `.default` (SURVEY.md §5.6). We mirror that with frozen dataclasses so
configs are hashable and usable as jit static args. Recurring knobs carried
over: `strict_fp` (bit-exact / deterministic-reduction mode), seeds+stream ids,
`use_dot_trick` (None = auto).
"""

from __future__ import annotations

import enum
from dataclasses import dataclass
from typing import Optional


class Metric(enum.Enum):
    """Distance/similarity metric.

    Parity: reference SupportedDistanceMetric (via VectorCore) restricted per
    index — HNSW supports L2/IP/cosine only (HNSWIndex.swift:36-49); Flat
    supports all five incl. manhattan/chebyshev (DistanceUtils.swift:12-67).
    """

    L2 = "l2"  # squared L2 internally; sqrt at API boundary like reference
    INNER_PRODUCT = "ip"
    COSINE = "cosine"
    MANHATTAN = "manhattan"
    CHEBYSHEV = "chebyshev"

    @property
    def higher_is_better(self) -> bool:
        """Ordering: IP/cosine are similarities (descending); the rest are
        distances (ascending). Reference: TopK.swift:193 `ordering(for:)`."""
        return self in (Metric.INNER_PRODUCT,)

    @property
    def is_similarity(self) -> bool:
        return self in (Metric.INNER_PRODUCT, Metric.COSINE)


class ScoreOrder(enum.Enum):
    """Result ordering for top-k selection (reference TopK.swift:8-30)."""

    ASCENDING = "ascending"  # distances: smaller is better
    DESCENDING = "descending"  # similarities: larger is better


def ordering_for(metric: Metric) -> ScoreOrder:
    """Internal score ordering per metric.

    We score cosine as *similarity* but, mirroring the reference
    (HNSWTraversal.swift:60-70: L2=d², IP=−dot, cos=1−sim), all internal
    pipelines convert to an ascending 'distance' convention. Public search
    results convert back at the API boundary.
    """
    return ScoreOrder.ASCENDING


@dataclass(frozen=True)
class RNGConfig:
    """Deterministic stream config (reference S2: seed + streamID keying;
    S2_RNGDtype.swift:242 rngSplit)."""

    seed: int = 0xDEADBEEF
    stream: int = 0


@dataclass(frozen=True)
class ScoreOpts:
    """Options for block scoring (reference L2SqrOpts, L2SqrKernel.swift:19-42).

    use_dot_trick: None = auto (d >= 256 or norms present,
    L2SqrKernel.swift:122-134). strict_fp: fully deterministic reductions.
    """

    use_dot_trick: Optional[bool] = None
    strict_fp: bool = False
    chunk_rows: int = 0  # 0 = no chunking (whole block at once)
    clamp: bool = True  # max(d²,0); selection paths may skip (monotone)


@dataclass(frozen=True)
class TopKConfig:
    """Reference TopKConfig (TopK.swift:115). strict_ties enables the exact
    (score, id) lexicographic tie-break contract (TopK.swift:8-30)."""

    strict_ties: bool = True


DEFAULT_RNG = RNGConfig()
