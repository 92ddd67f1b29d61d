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
from vectorindex_tpu.models.sharded import ShardedFlatIndex  # noqa: F401
from vectorindex_tpu.models import accel  # noqa: F401
