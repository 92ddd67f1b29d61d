"""ID filtering: bitsets over internal ids, allow/deny modes.

Parity targets (reference kernel #08):
  - IDFilterBitset                  Operations/Filtering/IDFilter.swift:16
  - idFilterPass/Mask/Compact       IDFilter.swift:123-323
  - IDFilterOverlay (base+delta)    IDFilter.swift:363
  - FilterMode allow/deny           IDFilter.swift:104

TPU-native design: the device-side representation is a packed uint32 word
array (same 64→32-bit word layout idea; 32 keeps int ops on the VPU's native
width). Filters compose on device with bitwise ops and are consumed by search
pipelines as boolean masks fused into the top-k padding step — there is no
per-candidate branch, matching how the traversal kernels consume an
allow-bitset (hnsw_traversal.h allow-bitset param).
"""

from __future__ import annotations

import enum
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

WORD_BITS = 32


class FilterMode(enum.Enum):
    ALLOW = "allow"  # only ids in the set pass
    DENY = "deny"  # ids in the set are rejected


def bitset_size_words(n: int) -> int:
    return (n + WORD_BITS - 1) // WORD_BITS


def bitset_from_ids(ids, n: int) -> Array:
    """Build a packed bitset [⌈n/32⌉] u32 from a host list/array of ids."""
    words = np.zeros(bitset_size_words(n), dtype=np.uint32)
    ids = np.asarray(ids, dtype=np.int64)
    if ids.size:
        np.bitwise_or.at(words, ids // WORD_BITS, np.uint32(1) << (ids % WORD_BITS).astype(np.uint32))
    return jnp.asarray(words)


def bitset_test(bitset: Array, ids: Array) -> Array:
    """Vectorized membership test → bool array shaped like `ids`."""
    word = bitset[ids // WORD_BITS]
    bit = (word >> (ids % WORD_BITS).astype(jnp.uint32)) & jnp.uint32(1)
    return bit.astype(jnp.bool_)


def bitset_set(bitset: Array, ids: Array) -> Array:
    """Functional set: returns a new bitset with `ids` bits on (device scatter)."""
    word_idx = ids // WORD_BITS
    bits = (jnp.uint32(1) << (ids % WORD_BITS).astype(jnp.uint32)).astype(jnp.uint32)
    return bitset.at[word_idx].set(bitset[word_idx] | bits)


def bitset_to_mask(bitset: Array, n: int) -> Array:
    """Unpack to a dense bool mask [n] — the form search pipelines fuse into
    top-k padding."""
    words = bitset[:, None]
    shifts = jax.lax.broadcasted_iota(jnp.uint32, (1, WORD_BITS), 1)
    bits = ((words >> shifts) & jnp.uint32(1)).astype(jnp.bool_)
    return bits.reshape(-1)[:n]


def bitset_union(a: Array, b: Array) -> Array:
    return a | b


def bitset_intersect(a: Array, b: Array) -> Array:
    return a & b


def bitset_difference(a: Array, b: Array) -> Array:
    return a & ~b


class IDFilterOverlay:
    """Base set + delta adds/removes composed lazily (reference
    IDFilterOverlay, IDFilter.swift:363)."""

    def __init__(self, base: Array, mode: FilterMode = FilterMode.ALLOW):
        self.base = base
        self.mode = mode
        self.added: Optional[Array] = None
        self.removed: Optional[Array] = None

    def add(self, ids, n: int) -> "IDFilterOverlay":
        delta = bitset_from_ids(ids, n)
        self.added = delta if self.added is None else self.added | delta
        return self

    def remove(self, ids, n: int) -> "IDFilterOverlay":
        delta = bitset_from_ids(ids, n)
        self.removed = delta if self.removed is None else self.removed | delta
        return self

    def effective(self) -> Array:
        out = self.base
        if self.added is not None:
            out = out | self.added
        if self.removed is not None:
            out = out & ~self.removed
        return out

    def allow_mask(self, n: int) -> Array:
        """Dense allow mask [n]: True = candidate passes."""
        member = bitset_to_mask(self.effective(), n)
        return member if self.mode == FilterMode.ALLOW else ~member


def slot_mask_np(
    n: int,
    idmap,
    allow_ids=None,
    deny_ids=None,
) -> Optional[np.ndarray]:
    """Host-side allow mask [n] over internal slots from EXTERNAL id sets
    (the form index search paths consume; reference FilterMode allow/deny,
    IDFilter.swift:104). Unknown external ids are ignored — an allow set
    entry that was never inserted simply matches nothing. Returns None when
    no filter was requested (the unfiltered fast path stays mask-free)."""
    if allow_ids is None and deny_ids is None:
        return None
    mask = np.ones(n, dtype=bool)
    if allow_ids is not None:
        allow = np.zeros(n, dtype=bool)
        for ext in allow_ids:
            if ext in idmap:
                allow[idmap.lookup(ext)] = True
        mask &= allow
    if deny_ids is not None:
        for ext in deny_ids:
            if ext in idmap:
                mask[idmap.lookup(ext)] = False
    return mask


def filter_mask(
    n: int,
    allow_ids=None,
    deny_ids=None,
) -> Array:
    """Convenience: dense allow mask from optional allow/deny id lists
    (reference idFilterPass allow/deny modes)."""
    mask = jnp.ones((n,), dtype=jnp.bool_)
    if allow_ids is not None:
        mask = mask & bitset_to_mask(bitset_from_ids(allow_ids, n), n)
    if deny_ids is not None:
        mask = mask & ~bitset_to_mask(bitset_from_ids(deny_ids, n), n)
    return mask
