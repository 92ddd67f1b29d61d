from vectorindex_tpu.parallel.mesh import (  # noqa: F401
    DATA_AXIS,
    corpus_sharding,
    make_mesh,
    pad_rows,
    replicated,
    shard_rows,
)
from vectorindex_tpu.parallel.sharded_search import (  # noqa: F401
    make_sharded_search_fn,
    sharded_flat_search,
)
from vectorindex_tpu.parallel.sharded_ivf import (  # noqa: F401
    ShardedIVFArrays,
    partition_store,
    sharded_ivf_search,
)
