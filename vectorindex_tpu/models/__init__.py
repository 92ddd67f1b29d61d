"""Index families (the reference's index-level components, SURVEY.md §2.3)."""

from vectorindex_tpu.models.base import (  # noqa: F401
    IndexStats,
    SearchResult,
    VectorIndex,
)
from vectorindex_tpu.models.filters import JournalFilter  # noqa: F401
from vectorindex_tpu.models.flat import FlatIndex  # noqa: F401
from vectorindex_tpu.models.hnsw import HNSWConfig, HNSWIndex  # noqa: F401
from vectorindex_tpu.models.ivf import (  # noqa: F401
    IVFConfig,
    IVFIndex,
    IVFPQConfig,
    IVFPQIndex,
)
from vectorindex_tpu.models.sharded import (  # noqa: F401
    ShardedFlatIndex,
    ShardedHNSWIndex,
)
from vectorindex_tpu.models import accel  # noqa: F401


def load_index(path: str):
    """Open any JSON snapshot, dispatching on its `type` field (flat / hnsw /
    ivf / ivfpq / sharded_flat). Binary containers load via
    `IVFIndex.load_durable`."""
    import json

    with open(path) as f:
        t = json.load(f).get("type")
    cls = {
        FlatIndex.TYPE: FlatIndex,
        ShardedFlatIndex.TYPE: ShardedFlatIndex,
        ShardedHNSWIndex.TYPE: ShardedHNSWIndex,
        HNSWIndex.TYPE: HNSWIndex,
        IVFIndex.TYPE: IVFIndex,
        IVFPQIndex.TYPE: IVFPQIndex,
    }.get(t)
    if cls is None:
        from vectorindex_tpu.utils.errors import ErrorBuilder, IndexErrorKind

        raise (
            ErrorBuilder(IndexErrorKind.INVALID_CONFIGURATION)
            .message(f"unknown snapshot type {t!r}")
            .build()
        )
    return cls.load(path)
