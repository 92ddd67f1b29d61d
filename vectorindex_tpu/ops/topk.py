"""Deterministic top-k selection and k-way merge.

Parity targets (reference kernels #05, #06):
  - selectTopK + TopKHeap    Operations/Selection/TopK.swift:127,54
  - mergeTopK                Operations/Selection/TopKMerge.swift:11,51

Contract carried over: results are ordered by (score, id) — ascending id
breaks score ties (TopK.swift:8-30); merges are deterministic regardless of
shard/list order (TopKMerge.swift:66-71). The reference picks streaming-heap
vs quickselect per call (TopK.swift:134-137); on TPU selection is either
XLA's `lax.top_k` (fast path — deterministic, ties broken by *position*) or a
two-key `lax.sort` (strict path — exact (score, id) lexicographic contract
even when ids are arbitrary, e.g. gathered candidates).

All scores here use the internal ascending "distance" convention (smaller is
better); use `ops.scoring.as_distance` first. Invalid/padded slots must carry
`INVALID_DIST` (+inf) and will sort last; `INVALID_ID` is the id sentinel.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array

INVALID_ID = jnp.iinfo(jnp.int32).max  # sorts after every real id on ties
INVALID_DIST = jnp.inf


def topk(
    dist: Array,
    k: int,
    ids: Optional[Array] = None,
    strict_ties: bool = True,
) -> Tuple[Array, Array]:
    """Top-k smallest along the last axis → (dists [..., k], ids [..., k]).

    ids: optional id array aligned with `dist`'s last axis; defaults to
    positional indices (the dense-corpus case). With strict_ties the full
    (score, id) lexicographic contract holds (reference TopK.swift:8-30);
    without it, ties break by position (lax.top_k), which equals the id
    contract whenever ids are positionally sorted.
    """
    n = dist.shape[-1]
    k = min(k, n)
    dist = dist.astype(jnp.float32)
    if ids is None and not strict_ties:
        neg_top, idx = jax.lax.top_k(-dist, k)
        return -neg_top, idx.astype(jnp.int32)
    if ids is None:
        ids = jnp.broadcast_to(
            jax.lax.broadcasted_iota(jnp.int32, dist.shape, dist.ndim - 1), dist.shape
        )
    ids = ids.astype(jnp.int32)
    if strict_ties:
        # Two-key stable sort: primary = dist ascending, secondary = id
        # ascending. NaNs sort to the end under lax.sort's total order.
        sd, si = jax.lax.sort((dist, ids), dimension=-1, num_keys=2, is_stable=False)
        return sd[..., :k], si[..., :k]
    neg_top, idx = jax.lax.top_k(-dist, k)
    return -neg_top, jnp.take_along_axis(ids, idx, axis=-1)


def merge_topk(
    dists: Array,
    ids: Array,
    k: int,
) -> Tuple[Array, Array]:
    """Merge L partial top-k lists → one top-k (reference mergeTopK,
    TopKMerge.swift:11).

    dists/ids: [..., L, k_partial]. Merged deterministically by (score, id) —
    the reference additionally tie-breaks by list index for identical
    (score, id) pairs (TopKMerge.swift:66-71); with globally unique ids the
    (score, id) order is already total. This is the cross-shard ICI merge
    primitive (SURVEY.md §2.4).
    """
    flat_d = dists.reshape(*dists.shape[:-2], -1)
    flat_i = ids.reshape(*ids.shape[:-2], -1)
    return topk(flat_d, k, ids=flat_i, strict_ties=True)


def topk_padded(
    dist: Array,
    valid: Array,
    k: int,
    ids: Optional[Array] = None,
    strict_ties: bool = True,
) -> Tuple[Array, Array]:
    """topk over a masked block: invalid slots get (+inf, INVALID_ID) so they
    sort last (reference rerank's ±inf sentinel, ExactRerank.swift:76-78)."""
    dist = jnp.where(valid, dist, INVALID_DIST)
    if ids is not None:
        ids = jnp.where(valid, ids, INVALID_ID)
    return topk(dist, k, ids=ids, strict_ties=strict_ties)
