"""Candidate deduplication / visited-set strategies.

Parity target (reference kernel #32): Operations/Dedup/CandidateDedup.swift —
  - VisitedSet protocol (:21) with modes denseEpoch / sparsePaged /
    fixedBitset (:29)
  - C-like API visitedInit/Reset/TestAndSet/MaskAndMark/dedupInPlace (:674-765)
  - epoch-stamp visited array avoids clearing between queries (:110)

TPU-native design (SURVEY.md §2.4 last row): per-query-thread epoch stamping
has no device analog — batched searches carry *functional* visited state:
  - VisitedBitset: packed u32 [B, ⌈n/32⌉] with vectorized test-and-set — the
    device equivalent of fixedBitset, O(n/8) bytes per query;
  - visited ring: the append-only expanded-id buffer used by beam search
    (ops/graph.py) — the sparse strategy, O(iters) per query;
  - dedup_sorted / dedup_candidates: value-level dedup of id lists via
    sort-adjacent-compare, the batch analog of dedupInPlace.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from vectorindex_tpu.ops.topk import INVALID_DIST, INVALID_ID

Array = jax.Array

WORD = 32


def visited_init(batch: int, n: int) -> Array:
    """Fresh per-query bitsets [B, ⌈n/32⌉] (reference visitedInit)."""
    return jnp.zeros((batch, (n + WORD - 1) // WORD), dtype=jnp.uint32)


@jax.jit
def visited_test(bits: Array, ids: Array) -> Array:
    """Vectorized membership: ids [B, W] → bool [B, W] (reference
    visitedTestAndSet's test half). Negative ids report visited=True so
    padding never gets processed."""
    safe = jnp.maximum(ids, 0)
    word = jnp.take_along_axis(bits, safe // WORD, axis=1)
    bit = (word >> (safe % WORD).astype(jnp.uint32)) & jnp.uint32(1)
    return (bit == 1) | (ids < 0)


@jax.jit
def visited_mark(bits: Array, ids: Array) -> Array:
    """Functional set: mark ids [B, W] visited → new bitsets (reference
    MaskAndMark's mark half; scatter-OR per query row)."""
    b = bits.shape[0]
    safe = jnp.maximum(ids, 0)
    words = safe // WORD
    masks = (jnp.uint32(1) << (safe % WORD).astype(jnp.uint32)).astype(jnp.uint32)
    masks = jnp.where(ids >= 0, masks, jnp.uint32(0))

    # fold columns with read-modify-write OR (W = ids row width is small;
    # a scatter can't OR multiple bits into the same word in one shot)
    def body(j, acc):
        idx = words[:, j]
        msk = masks[:, j]
        cur = acc[jnp.arange(b), idx]
        return acc.at[jnp.arange(b), idx].set(cur | msk)

    return jax.lax.fori_loop(0, ids.shape[1], body, bits)


@jax.jit
def visited_test_and_mark(bits: Array, ids: Array) -> Tuple[Array, Array]:
    """Combined test+set (reference visitedTestAndSet / MaskAndMark):
    returns (was_visited [B, W], new_bits). Duplicates *within* the same ids
    row are also flagged (first occurrence wins), matching the sequential
    semantics of per-candidate test-and-set."""
    seen_before = visited_test(bits, ids)
    w = ids.shape[1]
    earlier = jnp.tril(jnp.ones((w, w), bool), k=-1)
    dup_in_row = jnp.any(
        (ids[:, :, None] == ids[:, None, :]) & earlier[None], axis=-1
    )
    was = seen_before | dup_in_row
    return was, visited_mark(bits, ids)


@jax.jit
def dedup_mask(ids: Array, missing: Array) -> Array:
    """Position-preserving dedup: returns `missing` with all-but-the-first
    occurrence of each id additionally marked (reference dedupInPlace
    contract, CandidateDedup.swift:741, keeping output slots aligned with
    their companion arrays — the PQ probe epilogue's rows/dists stay
    index-matched). Candidates arrive rank-ordered and jnp.argsort is
    stable, so the surviving copy is deterministically the best-ranked one.
    Used by kernels/adc_probe under spill multi-assignment
    (ops.ivf.spill_assign), where a corpus row occupies one CSR slot per
    list it spilled into."""
    order = jnp.argsort(ids, axis=1)
    sid = jnp.take_along_axis(ids, order, axis=1)
    dup_sorted = jnp.concatenate(
        [jnp.zeros((ids.shape[0], 1), bool), sid[:, 1:] == sid[:, :-1]],
        axis=1,
    )
    inv = jnp.argsort(order, axis=1)
    return missing | jnp.take_along_axis(dup_sorted, inv, axis=1)


def dedup_candidates(dists: Array, ids: Array) -> Tuple[Array, Array]:
    """Batch dedupInPlace (reference :741): sort candidate lists by (id),
    blank duplicate ids to (+inf, INVALID_ID), then restore (dist, id)
    order. Output shapes match input; duplicates sort to the tail."""
    si, sd = jax.lax.sort((ids, dists), dimension=-1, num_keys=1)
    dup = jnp.zeros_like(si, dtype=bool).at[:, 1:].set(si[:, 1:] == si[:, :-1])
    sd = jnp.where(dup, INVALID_DIST, sd)
    si = jnp.where(dup, INVALID_ID, si)
    od, oi = jax.lax.sort((sd, si), dimension=-1, num_keys=2)
    return od, oi
