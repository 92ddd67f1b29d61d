"""Graph-index ops: level sampling, batched greedy descent, batched beam
search, diversity neighbor selection/pruning.

Parity targets:
  - #33 HNSW traversal           Kernels/HNSWTraversal.swift:282-307
    (greedyDescent maxLevel→1, bounded best-first efSearch at L0, visited
    bitset :31-39, allow-bitset filtering :25, batched neighbor scoring
    :99-167, dist conventions L2=d² :60-70)
  - #34 neighbor selection       Kernels/HNSWNeighborSelection.swift:132,253
    (diversity heuristic: keep candidate iff closer to the new point than
    to any already-selected; prune to M by the same rule)
  - #35 level assignment         Kernels/HNSWLevelAssignment.swift:77
    (geometric l = ⌊−ln(u)·1/ln(M)⌋ capped at 16, deterministic stream)

TPU-native design (SURVEY.md §7 step 7): the reference's per-query dynamic
best-first loop becomes *batched frontier expansion* with fixed iteration
counts and masked state:
  - a query batch walks the graph together; each iteration expands one beam
    slot per query, gathers its fixed-width neighbor row, scores the whole
    [B, M] block densely on the MXU, and merges via two-key sorts;
  - the visited set is an append-only ring of expanded ids per query (the
    epoch-stamp bitset has no cheap device analog; membership is a dense
    compare against the ring — #32's batched-mask strategy);
  - graphs are CSR-free fixed-degree tables nbrs [n, M] (−1 = empty), the
    XLA-friendly version of the reference's CSR layers, with upper levels
    stored compactly (level-local rows + global-id lookup).
Quality parity with sequential HNSW is validated by recall tests
(SURVEY.md §7 "hard parts").
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from vectorindex_tpu.ops.topk import INVALID_DIST, INVALID_ID

Array = jax.Array

LEVEL_CAP = 16  # reference cap (HNSWLevelAssignment.swift)
NO_NODE = jnp.int32(-1)


# ---------------------------------------------------------------------------
# #35 — level assignment
# ---------------------------------------------------------------------------


def sample_levels(key: Array, n: int, m: int, cap: int = LEVEL_CAP) -> Array:
    """Geometric levels l = ⌊−ln(u)·mL⌋, mL = 1/ln(M), capped (reference
    hnswSampleLevel). Deterministic per (key)."""
    u = jax.random.uniform(key, (n,), minval=1e-12, maxval=1.0)
    ml = 1.0 / jnp.log(jnp.maximum(float(m), 2.0))
    return jnp.minimum(jnp.floor(-jnp.log(u) * ml), cap).astype(jnp.int32)


# ---------------------------------------------------------------------------
# scoring helper (dense [B, M] neighbor block on the MXU)
# ---------------------------------------------------------------------------


def _dist_rows(q: Array, rows: Array, vecs: Array, sqn: Array) -> Array:
    """d²(q_b, vecs[rows[b, j]]) for row table rows [B, W] → [B, W].
    Invalid rows (<0) must be masked by the caller."""
    safe = jnp.maximum(rows, 0)
    xg = vecs[safe]  # [B, W, d]
    sg = sqn[safe]
    g = jnp.einsum(
        "bd,bwd->bw",
        q.astype(jnp.float32),
        xg.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    qn = jnp.sum(jnp.square(q.astype(jnp.float32)), axis=-1)
    return jnp.maximum(qn[:, None] + sg - 2.0 * g, 0.0)


# ---------------------------------------------------------------------------
# #33 — greedy descent (upper levels)
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("steps",))
def greedy_descent(
    q: Array,  # [B, d]
    vecs: Array,  # [N, d] global vector table
    sqn: Array,  # [N]
    nbrs: Array,  # [n_l, M] neighbor rows (global ids, −1 empty)
    lookup: Array,  # [N] global id → level-local row (−1 absent)
    entry: Array,  # [B] global entry ids
    *,
    steps: int,
) -> Array:
    """Batched greedy walk: repeatedly move to the closest neighbor if it
    improves; fixed `steps` iterations with converged queries masked
    (reference greedyDescent_core, HNSWTraversal.swift:176-211)."""
    cur_d = _dist_rows(q, entry[:, None], vecs, sqn)[:, 0]

    def body(_, state):
        cur, cur_d = state
        rows = lookup[cur]  # [B]
        nb = nbrs[jnp.maximum(rows, 0)]  # [B, M] global ids
        valid = (nb >= 0) & (rows >= 0)[:, None]
        nd = jnp.where(valid, _dist_rows(q, nb, vecs, sqn), INVALID_DIST)
        j = jnp.argmin(nd, axis=1)
        best_d = jnp.take_along_axis(nd, j[:, None], axis=1)[:, 0]
        best_i = jnp.take_along_axis(nb, j[:, None], axis=1)[:, 0]
        better = best_d < cur_d
        return jnp.where(better, best_i, cur), jnp.where(better, best_d, cur_d)

    cur, _ = jax.lax.fori_loop(0, steps, body, (entry, cur_d))
    return cur


# ---------------------------------------------------------------------------
# #33 — batched beam search (base layer ef-search)
# ---------------------------------------------------------------------------


class BeamResult(NamedTuple):
    dists: Array  # [B, ef] ascending
    ids: Array  # [B, ef] global ids (INVALID_ID padded)


@partial(jax.jit, static_argnames=("ef", "iters", "expand"))
def beam_search(
    q: Array,  # [B, d]
    vecs: Array,
    sqn: Array,
    nbrs: Array,  # [n, M] (level-0: n == N rows are global ids)
    lookup: Optional[Array],  # None for level 0 (identity)
    entry: Array,  # [B] global entry ids
    *,
    ef: int,
    iters: int,
    expand: int = 1,
) -> BeamResult:
    """Batched bounded best-first search (reference efSearch_core,
    HNSWTraversal.swift:221-280).

    State per query: beam of (dist, id, expanded) sorted ascending, plus an
    append-only visited ring of expanded ids. Each iteration expands the
    `expand` best unexpanded beam slots; their neighbor rows are scored
    densely; candidates already in the visited ring or current beam are
    masked; beam = top-ef of (beam ∪ candidates) by (dist, id) two-key sort.

    expand > 1 trades strict best-first order for ~expand× fewer sequential
    iterations (the device loop is latency-bound) — the standard beam-width
    relaxation; recall parity is covered by the index-level tests.
    """
    b = q.shape[0]
    m = nbrs.shape[1]
    e = expand
    w = e * m  # candidates per iteration

    beam_d = jnp.full((b, ef), INVALID_DIST)
    beam_i = jnp.full((b, ef), INVALID_ID, dtype=jnp.int32)
    beam_x = jnp.zeros((b, ef), dtype=jnp.int32)  # expanded flag (int for sort)
    ed = _dist_rows(q, entry[:, None], vecs, sqn)[:, 0]
    beam_d = beam_d.at[:, 0].set(ed)
    beam_i = beam_i.at[:, 0].set(entry)
    visited = jnp.full((b, iters * e), INVALID_ID, dtype=jnp.int32)
    rows_b = jnp.arange(b)

    def body(t, state):
        beam_d, beam_i, beam_x, visited = state
        # pick the e best unexpanded slots (beam sorted ascending → stable
        # argsort on the expanded flag keeps beam order among unexpanded)
        unexp = (beam_x == 0) & (beam_i != INVALID_ID)
        order = jnp.argsort(~unexp, axis=1, stable=True)[:, :e]  # [B, e]
        n_unexp = jnp.sum(unexp.astype(jnp.int32), axis=1)
        has = jax.lax.broadcasted_iota(jnp.int32, (b, e), 1) < n_unexp[:, None]
        cur = jnp.take_along_axis(beam_i, order, axis=1)  # [B, e]
        cur = jnp.where(has, cur, 0)
        # mark expanded + record in visited ring
        marks = jnp.where(has, 1, jnp.take_along_axis(beam_x, order, axis=1))
        beam_x = beam_x.at[rows_b[:, None], order].set(marks)
        visited = jax.lax.dynamic_update_slice(
            visited, jnp.where(has, cur, INVALID_ID), (0, t * e)
        )

        rws = lookup[cur] if lookup is not None else cur  # [B, e]
        nb = nbrs[jnp.maximum(rws, 0)]  # [B, e, M]
        valid = (nb >= 0) & (rws >= 0)[:, :, None] & has[:, :, None]
        nb = nb.reshape(b, w)
        valid = valid.reshape(b, w)
        # mask out already-visited / in-beam candidates and duplicates
        # within this iteration's candidate block
        seen_v = jnp.any(nb[:, :, None] == visited[:, None, :], axis=-1)
        seen_b = jnp.any(nb[:, :, None] == beam_i[:, None, :], axis=-1)
        earlier = jnp.tril(jnp.ones((w, w), bool), k=-1)
        dup_row = jnp.any((nb[:, :, None] == nb[:, None, :]) & earlier[None], axis=-1)
        valid = valid & ~seen_v & ~seen_b & ~dup_row
        nd = jnp.where(valid, _dist_rows(q, nb, vecs, sqn), INVALID_DIST)
        nbm = jnp.where(valid, nb, INVALID_ID)

        # merge beam ∪ candidates → top-ef by (dist, id), flags ride along
        all_d = jnp.concatenate([beam_d, nd], axis=1)
        all_i = jnp.concatenate([beam_i, nbm], axis=1)
        all_x = jnp.concatenate([beam_x, jnp.zeros_like(nbm)], axis=1)
        sd, si, sx = jax.lax.sort(
            (all_d, all_i, all_x), dimension=-1, num_keys=2
        )
        return sd[:, :ef], si[:, :ef], sx[:, :ef], visited

    beam_d, beam_i, beam_x, _ = jax.lax.fori_loop(
        0, iters, body, (beam_d, beam_i, beam_x, visited)
    )
    return BeamResult(beam_d, beam_i)


# ---------------------------------------------------------------------------
# #34 — diversity neighbor selection / pruning
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("m",))
def select_neighbors_diverse(
    cand_d: Array,  # [C, ef] candidate distances to the new point (ascending)
    cand_i: Array,  # [C, ef] candidate global ids (INVALID_ID padded)
    vecs: Array,
    sqn: Array,
    *,
    m: int,
) -> Array:
    """Heuristic selection (reference hnsw_select_neighbors_f32_swift,
    HNSWNeighborSelection.swift:132): walk candidates by ascending distance;
    keep c iff d(c, new) < min_{s selected} d(c, s). Returns [C, m] global
    ids (INVALID_ID padded).

    Batched formulation: at most m candidates are ever selected, and the
    alive set (valid ∧ d_to_new < min_d_to_selected) only shrinks as
    selections accumulate — so the next sequential selection is always the
    lowest-rank alive candidate. A fori over m steps picking argmax(alive)
    is exactly equivalent to the sequential ef-walk, ~ef/m× shorter, and
    needs one [C, ef] distance block per step instead of the full
    [C, ef, ef] pairwise tensor.
    """
    c, ef = cand_d.shape
    safe = jnp.maximum(cand_i, 0)
    cv = vecs[safe].astype(jnp.float32)  # [C, ef, d]
    csq = sqn[safe].astype(jnp.float32)
    valid = cand_i != INVALID_ID
    col = jax.lax.broadcasted_iota(jnp.int32, (c, ef), 1)

    def body(t, state):
        selected, min_d_to_sel = state  # [C, ef] bool, [C, ef] f32
        alive = valid & (cand_d < min_d_to_sel)
        any_alive = jnp.any(alive, axis=1)  # [C]
        j = jnp.argmax(alive, axis=1)  # first alive = next sequential pick
        selected = selected | (alive & (col == j[:, None]))
        # distances from every candidate to the picked one (dot-trick)
        vsel = jnp.take_along_axis(cv, j[:, None, None], axis=1)  # [C,1,d]
        ssel = jnp.take_along_axis(csq, j[:, None], axis=1)  # [C,1]
        dot = jnp.einsum(
            "ced,cfd->ce", cv, vsel, preferred_element_type=jnp.float32
        )
        dsel = jnp.maximum(csq + ssel - 2.0 * dot, 0.0)
        dsel = jnp.where(any_alive[:, None], dsel, INVALID_DIST)
        return selected, jnp.minimum(min_d_to_sel, dsel)

    selected, _ = jax.lax.fori_loop(
        0,
        min(m, ef),
        body,
        (jnp.zeros((c, ef), bool), jnp.full((c, ef), INVALID_DIST)),
    )
    # compact to [C, m]: diversity-selected first (by rank), then fill the
    # remaining slots with the nearest pruned candidates ("keep pruned
    # connections") — without the fill, batched construction underfills
    # degrees and strands low-in-degree nodes
    idx = jnp.arange(ef)[None, :]
    rank = jnp.where(selected, idx, ef + idx)
    rank = jnp.where(valid, rank, 2 * ef + idx)  # invalid last
    order = jnp.argsort(rank, axis=1)[:, :m]
    out = jnp.take_along_axis(cand_i, order, axis=1)
    ok = jnp.take_along_axis(valid, order, axis=1)
    return jnp.where(ok, out, INVALID_ID)


@partial(jax.jit, static_argnames=("m",))
def prune_neighbors(
    node_ids: Array,  # [C] nodes whose lists overflowed
    lists: Array,  # [C, M+1] candidate neighbor ids (incl. the new edge)
    vecs: Array,
    sqn: Array,
    *,
    m: int,
) -> Array:
    """Prune overflowed neighbor lists back to m by the same diversity rule
    (reference hnsw_prune_neighbors_f32_swift, HNSWNeighborSelection.swift:253).
    Returns [C, m]."""
    base = vecs[node_ids]  # [C, d]
    d = _dist_rows(base, lists, vecs, sqn)
    d = jnp.where(lists != INVALID_ID, d, INVALID_DIST)
    # sort by distance then apply selection
    sd, si = jax.lax.sort((d, lists), dimension=-1, num_keys=2)
    return select_neighbors_diverse(sd, si, vecs, sqn, m=m)
