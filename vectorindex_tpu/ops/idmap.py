"""ID remapping: external ids ↔ internal dense indices.

Parity targets (reference kernel #50):
  - IDMap (swiss-table hash map, u64↔dense i64)   Kernels/IDMap.swift:125
  - TombstoneSet                                   Kernels/IDMap.swift:32
  - ExternalIDRegistry (string↔u64)                Kernels/IDRegistry.swift:6
  - serialize/deserialize blob                     Kernels/IDMap.swift:352,370

TPU-native framing: id bookkeeping is *host-side control plane* — Python dicts
are the platform's native hash table (the reference's swiss-table/robin-hood
variants are CPU micro-architecture choices with no TPU analog). The data
plane (device) only ever sees dense int32 internal indices; this module is the
boundary where external ids stop.
"""

from __future__ import annotations

import json
from typing import Hashable, Iterable, Optional

from vectorindex_tpu.utils.errors import duplicate_id, not_found


class IDMap:
    """External id (string/int) ↔ internal dense slot index.

    Internal ids are dense array slots assigned by the caller (index layer),
    monotonically or via free-list reuse. Erased entries leave tombstones so
    `external_for` on stale internal ids fails loudly.
    """

    def __init__(self) -> None:
        self._ext_to_int: dict[Hashable, int] = {}
        self._int_to_ext: dict[int, Hashable] = {}
        self._tombstones: set[int] = set()

    def __len__(self) -> int:
        return len(self._ext_to_int)

    def __contains__(self, external_id: Hashable) -> bool:
        return external_id in self._ext_to_int

    def append(self, external_id: Hashable, internal_id: int) -> None:
        if external_id in self._ext_to_int:
            raise duplicate_id(external_id, "idmap.append")
        self._ext_to_int[external_id] = internal_id
        self._int_to_ext[internal_id] = external_id
        self._tombstones.discard(internal_id)

    def lookup(self, external_id: Hashable) -> int:
        try:
            return self._ext_to_int[external_id]
        except KeyError:
            raise not_found(external_id, "idmap.lookup") from None

    def get(self, external_id: Hashable) -> Optional[int]:
        return self._ext_to_int.get(external_id)

    def external_for(self, internal_id: int) -> Hashable:
        try:
            return self._int_to_ext[internal_id]
        except KeyError:
            raise not_found(internal_id, "idmap.external_for") from None

    def erase(self, external_id: Hashable) -> int:
        """Remove a mapping, leaving a tombstone on the internal slot.
        Returns the freed internal id."""
        internal = self.lookup(external_id)
        del self._ext_to_int[external_id]
        del self._int_to_ext[internal]
        self._tombstones.add(internal)
        return internal

    @property
    def tombstones(self) -> frozenset[int]:
        return frozenset(self._tombstones)

    def clear_tombstones(self) -> None:
        self._tombstones.clear()

    def remap_internal(self, old_to_new: dict[int, int]) -> None:
        """Apply a compaction remap (reference compact() remaps indices,
        HNSWIndex.swift:783-857)."""
        new_int_to_ext: dict[int, Hashable] = {}
        for old, ext in self._int_to_ext.items():
            new = old_to_new.get(old, old)
            new_int_to_ext[new] = ext
            self._ext_to_int[ext] = new
        self._int_to_ext = new_int_to_ext
        self._tombstones = {old_to_new.get(t, t) for t in self._tombstones}

    def items(self) -> Iterable[tuple[Hashable, int]]:
        return self._ext_to_int.items()

    # -- persistence blob (reference serializeIDMap/deserializeIDMap) --

    def to_blob(self) -> bytes:
        payload = {
            "version": 1,
            "entries": [[k, v] for k, v in self._ext_to_int.items()],
            "tombstones": sorted(self._tombstones),
        }
        return json.dumps(payload).encode("utf-8")

    @staticmethod
    def from_blob(blob: bytes) -> "IDMap":
        payload = json.loads(blob.decode("utf-8"))
        if payload.get("version") != 1:
            from vectorindex_tpu.utils.errors import ErrorBuilder, IndexErrorKind

            raise (
                ErrorBuilder(IndexErrorKind.VERSION_MISMATCH)
                .message(f"idmap blob version {payload.get('version')}")
                .build()
            )
        m = IDMap()
        for k, v in payload["entries"]:
            m.append(k, int(v))
        m._tombstones = set(payload.get("tombstones", []))
        return m

    def stats(self) -> dict:
        return {
            "count": len(self._ext_to_int),
            "tombstones": len(self._tombstones),
        }
