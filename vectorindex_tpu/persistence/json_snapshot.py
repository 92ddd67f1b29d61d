"""JSON snapshot persistence (tier 1).

Parity target: reference Persistence.swift:6-18 — a versioned
`PersistedIndex{type, version, dimension, metric, records}` envelope with
`PersistedRecord{id, vector, metadata}` entries, shared by all index
families. Acceleration structures are NOT persisted in this tier: HNSW
rebuilds its graph by reinsertion on load (HNSWIndex.swift:755-781) and IVF
re-runs optimize() (IVFIndex.swift:657-665) — same contract here. The binary
container (persistence/container.py) is tier 2.
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from typing import Any, Optional

import numpy as np

from vectorindex_tpu.utils.errors import ErrorBuilder, IndexErrorKind

FORMAT_VERSION = 1


@dataclass
class PersistedRecord:
    id: Any
    vector: np.ndarray
    metadata: Optional[dict] = None


@dataclass
class PersistedIndex:
    type: str
    dimension: int
    metric: str
    records: list[PersistedRecord]
    version: int = FORMAT_VERSION
    config: Optional[dict] = None


def save_snapshot(path: str, snap: PersistedIndex) -> None:
    payload = {
        "type": snap.type,
        "version": snap.version,
        "dimension": snap.dimension,
        "metric": snap.metric,
        "config": snap.config or {},
        "records": [
            {
                "id": r.id,
                "vector": np.asarray(r.vector, dtype=np.float32).tolist(),
                "metadata": r.metadata,
            }
            for r in snap.records
        ],
    }
    with open(path, "w") as f:
        json.dump(payload, f)


def load_snapshot(path: str, expected_type: Optional[str] = None) -> PersistedIndex:
    try:
        with open(path) as f:
            payload = json.load(f)
    except (OSError, json.JSONDecodeError) as e:
        raise (
            ErrorBuilder(IndexErrorKind.IO_ERROR)
            .message(f"failed to read snapshot {path}")
            .caused_by(e)
            .build()
        )
    version = payload.get("version")
    if version != FORMAT_VERSION:
        raise (
            ErrorBuilder(IndexErrorKind.VERSION_MISMATCH)
            .message(f"snapshot version {version}, expected {FORMAT_VERSION}")
            .build()
        )
    if expected_type is not None and payload.get("type") != expected_type:
        raise (
            ErrorBuilder(IndexErrorKind.INVALID_CONFIGURATION)
            .message(
                f"snapshot type {payload.get('type')!r}, expected {expected_type!r}"
            )
            .build()
        )
    records = [
        PersistedRecord(
            id=r["id"],
            vector=np.asarray(r["vector"], dtype=np.float32),
            metadata=r.get("metadata"),
        )
        for r in payload["records"]
    ]
    return PersistedIndex(
        type=payload["type"],
        dimension=payload["dimension"],
        metric=payload["metric"],
        records=records,
        version=version,
        config=payload.get("config") or {},
    )
