from vectorindex_tpu.persistence.json_snapshot import (  # noqa: F401
    PersistedIndex,
    PersistedRecord,
    load_snapshot,
    save_snapshot,
)
