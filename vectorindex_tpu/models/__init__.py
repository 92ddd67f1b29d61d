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
    """Open any persisted index, dispatching on format and `type`:
    JSON snapshots (flat / hnsw / ivf / ivfpq / sharded_*) and binary
    INDEXTPU containers (flat / hnsw via the container tier; ivf / ivfpq
    via the durable loader)."""
    import json

    with open(path, "rb") as f:
        magic = f.read(8)
    if magic == b"INDEXTPU":
        return _load_container_index(path)
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


def _load_container_index(path: str):
    """Dispatch a binary container by its META section (or durable-IVF
    layout when no META blob exists)."""
    import json as _json

    from vectorindex_tpu.persistence.container import Container, SectionType

    from vectorindex_tpu.utils.errors import ErrorBuilder, IndexErrorKind

    meta = None
    with Container.open(path) as c:
        if c.find(SectionType.META) >= 0:
            try:
                meta = _json.loads(c.read_blob(SectionType.META))
            except ValueError as e:
                # a META section that exists but won't parse is corruption,
                # not a durable-IVF container — surfacing it as a confusing
                # load_durable failure hides the real problem (ADVICE r2 #5)
                raise (
                    ErrorBuilder(IndexErrorKind.CORRUPT_DATA)
                    .message(f"container META section is unparseable: {path}")
                    .caused_by(e)
                    .build()
                )
    t = (meta or {}).get("type")
    if t == "flat":
        return FlatIndex.load_container(path)
    if t == "hnsw":
        return HNSWIndex.load_container(path)
    # durable IVF(-PQ) containers carry their state in typed sections
    # without a META envelope
    return IVFIndex.load_durable(path)
