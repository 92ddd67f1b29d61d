"""Candidate reservoir: bounded top-C accumulation across scan stages.

Parity target (reference kernel #39): Operations/Reservoir/CandidateReservoir.swift —
  - CandidateReservoir (:94) with modes heap / block / adaptive (:27-31):
    block mode appends into C(1+α) then quickselect-prunes; adaptive flips
    block→heap at 75% occupancy (:36-74)
  - pushBatch (:205), extractTopK (:297), τ threshold tracking, SoA storage,
    stableTies, single-writer-per-query contract (:91-93)

TPU-native design: the reservoir is *functional state* [B, C] carried
through a scan pipeline. push = concat + two-key sort + truncate (the sort
IS the quickselect analog — on TPU a small sort beats any heap emulation);
τ (current C-th best) falls out of the sorted invariant for free, giving the
same threshold-based rejection the reference tracks explicitly. The
block-append amortization trick is unnecessary: batching amortizes instead.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from vectorindex_tpu.ops.topk import INVALID_DIST, INVALID_ID, topk

Array = jax.Array


class Reservoir(NamedTuple):
    """Sorted-by-(dist,id) bounded buffer per query."""

    dists: Array  # [B, C] ascending, INVALID_DIST padded
    ids: Array  # [B, C] INVALID_ID padded

    @property
    def capacity(self) -> int:
        return self.dists.shape[-1]


def reservoir_init(batch: int, capacity: int) -> Reservoir:
    return Reservoir(
        jnp.full((batch, capacity), INVALID_DIST),
        jnp.full((batch, capacity), INVALID_ID, dtype=jnp.int32),
    )


@jax.jit
def reservoir_push(res: Reservoir, dists: Array, ids: Array) -> Reservoir:
    """Merge a candidate block [B, W] (reference pushBatch, :205). Entries
    at/above the current τ are simply sorted out — no branchy threshold
    check needed. Deterministic (dist, id) tie ordering (stableTies)."""
    c = res.capacity
    all_d = jnp.concatenate([res.dists, dists.astype(jnp.float32)], axis=1)
    all_i = jnp.concatenate([res.ids, ids.astype(jnp.int32)], axis=1)
    sd, si = jax.lax.sort((all_d, all_i), dimension=-1, num_keys=2)
    return Reservoir(sd[:, :c], si[:, :c])


@jax.jit
def reservoir_push_masked(
    res: Reservoir, dists: Array, ids: Array, valid: Array
) -> Reservoir:
    """pushBatch with a validity mask (masked slots never enter)."""
    d = jnp.where(valid, dists, INVALID_DIST)
    i = jnp.where(valid, ids, INVALID_ID)
    return reservoir_push(res, d, i)


@jax.jit
def reservoir_tau(res: Reservoir) -> Array:
    """Current rejection threshold τ = worst kept distance per query
    (reference τ tracking; +inf while not full)."""
    return res.dists[:, -1]


@jax.jit
def reservoir_count(res: Reservoir) -> Array:
    """Live entries per query."""
    return jnp.sum(jnp.isfinite(res.dists).astype(jnp.int32), axis=-1)


@partial(jax.jit, static_argnames=("k",))
def reservoir_extract_topk(res: Reservoir, k: int) -> Tuple[Array, Array]:
    """Final top-k (reference extractTopK, :297) — the reservoir is already
    sorted, so this is a slice (kept as topk for the strict contract when
    k > capacity)."""
    return topk(res.dists, k, ids=res.ids, strict_ties=True)
