"""Block scoring — the single scoring choke point, TPU-first.

Parity targets (reference kernels #01-#04, #09):
  - L2² block kernel      Operations/Scoring/L2SqrKernel.swift:101 (l2sqr_f32_block)
  - inner product          Operations/Scoring/InnerProduct.swift:8
  - cosine (fused norms)   Operations/Scoring/Cosine.swift:38,139
  - ScoreBlock dispatcher  Operations/Scoring/ScoreBlock.swift:24
  - norm cache             Operations/Support/Norms.swift:36

TPU-first design: where the reference runs SIMD scan loops row-partitioned via
DispatchQueue.concurrentPerform (L2SqrKernel.swift:205-216), we batch queries
and express every metric as one tiled MXU matmul `Q @ X.T` with a fused
epilogue:

  L2²:    ‖q‖² + ‖x‖² − 2·QXᵀ   (the "dot trick", always — the MXU makes the
                                  Gram matrix the cheap part; the reference
                                  auto-enables it at d≥256)
  IP:     QXᵀ
  cosine: QXᵀ ⊙ (1/‖q‖)(1/‖x‖)ᵀ  (fused with a precomputed inverse-norm cache,
                                  reference Cosine.runF16)

Manhattan/chebyshev have no matmul form; they run on the VPU via chunked
broadcasting (the reference likewise treats them as slow scalar fallbacks,
ScoreBlock.swift:53-63).

All functions are pure and jittable with static shapes; the batch (query)
dimension replaces the reference's per-query task fan-out (SURVEY.md §2.4).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

from vectorindex_tpu.utils.config import Metric, ScoreOpts

Array = jax.Array


# ---------------------------------------------------------------------------
# Norm cache (#09)
# ---------------------------------------------------------------------------


@dataclass
class NormCache:
    """Precomputed row norms (reference Norms.swift:36 NormCache).

    sq:  ‖x‖² per row — consumed by the L2 dot-trick epilogue.
    inv: 1/‖x‖ per row — consumed by fused cosine.
    Either may be None (mode none/inv/sq/both, Norms.swift:12). dtype may be
    f32 or bf16 (reference also supports f16, Norms.swift:22).
    """

    sq: Optional[Array] = None
    inv: Optional[Array] = None

    @staticmethod
    def build(x: Array, mode: str = "both", dtype=jnp.float32) -> "NormCache":
        sq = inv = None
        sqn = jnp.sum(jnp.square(x.astype(jnp.float32)), axis=-1)
        if mode in ("sq", "both"):
            sq = sqn.astype(dtype)
        if mode in ("inv", "both"):
            # rsqrt with zero-guard: zero vectors get inv-norm 0 so cosine
            # against them scores 0 rather than inf/nan.
            inv = jnp.where(sqn > 0, jax.lax.rsqrt(jnp.maximum(sqn, 1e-30)), 0.0)
            inv = inv.astype(dtype)
        return NormCache(sq=sq, inv=inv)


def squared_norms(x: Array) -> Array:
    """‖x‖² per row, f32 accumulate."""
    return jnp.sum(jnp.square(x.astype(jnp.float32)), axis=-1)


def inv_norms(x: Array) -> Array:
    """1/‖x‖ per row with zero-guard."""
    sqn = squared_norms(x)
    return jnp.where(sqn > 0, jax.lax.rsqrt(jnp.maximum(sqn, 1e-30)), 0.0)


# ---------------------------------------------------------------------------
# Core matmul-form metrics
# ---------------------------------------------------------------------------


def _gram(q: Array, x: Array, precision=None) -> Array:
    """Q @ Xᵀ on the MXU with f32 accumulation. [B,d]·[N,d] → [B,N].

    Precision policy: f32 inputs default to Precision.HIGHEST (true-f32
    result — the dot-trick epilogue subtracts large terms, so Gram error
    becomes distance error). bf16 inputs are the designed fast path: the MXU
    consumes bf16 natively with f32 accumulation at full speed, so they keep
    default precision.
    """
    if precision is None and q.dtype == jnp.float32 and x.dtype == jnp.float32:
        precision = jax.lax.Precision.HIGHEST
    return jax.lax.dot_general(
        q,
        x,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    )


def l2sqr_block(
    q: Array,
    x: Array,
    x_sqnorms: Optional[Array] = None,
    q_sqnorms: Optional[Array] = None,
    clamp: bool = True,
) -> Array:
    """Squared L2 distances [B,N] via the dot-trick.

    Reference: l2sqr_f32_block (L2SqrKernel.swift:101) — direct Σ(q−x)² vs
    dot-trick chosen at d≥256 (:122-134). On TPU the dot-trick is always the
    right form (the Gram matrix rides the MXU); clamping at 0 guards the
    cancellation the reference's direct path avoids.

    clamp=False skips the max(·, 0): the clamp is monotone so *selection*
    pipelines rank identically without it, and on [B, N] blocks feeding the
    PartialReduce custom call it forces an extra full-matrix HBM round-trip
    (~1 ms at 256×1M). Selection paths clamp only the k survivors.
    """
    if x_sqnorms is None:
        x_sqnorms = squared_norms(x)
    if q_sqnorms is None:
        q_sqnorms = squared_norms(q)
    g = _gram(q, x)
    d2 = q_sqnorms[:, None] + x_sqnorms[None, :].astype(jnp.float32) - 2.0 * g
    return jnp.maximum(d2, 0.0) if clamp else d2


def l2sqr_block_direct(q: Array, x: Array) -> Array:
    """Direct Σ(q−x)² via broadcasting — the strict/oracle path (reference
    strictFP + `L2Sqr.runScalarRef`, L2Sqr.swift:88-100). Chunks the corpus
    so the [B, chunk, d] intermediate stays bounded (~64 MB)."""
    b, d = q.shape
    n = x.shape[0]
    chunk = max(1, min(n, (16 * 1024 * 1024) // max(b * d, 1)))

    def direct(xs):
        diff = q[:, None, :].astype(jnp.float32) - xs[None, :, :].astype(jnp.float32)
        return jnp.sum(jnp.square(diff), axis=-1)

    if n <= chunk:
        return direct(x)
    pad = (-n) % chunk
    xp = jnp.concatenate([x, jnp.zeros((pad, d), x.dtype)]) if pad else x
    out = jax.lax.map(direct, xp.reshape(-1, chunk, d))  # [nc, B, chunk]
    return out.transpose(1, 0, 2).reshape(b, -1)[:, :n]


def inner_product_block(q: Array, x: Array) -> Array:
    """⟨q,x⟩ [B,N] (reference InnerProduct.swift:8)."""
    return _gram(q, x)


def cosine_block(
    q: Array,
    x: Array,
    x_invnorms: Optional[Array] = None,
    q_invnorms: Optional[Array] = None,
) -> Array:
    """Cosine similarity in [-1,1] [B,N], fused with cached inverse norms
    (reference Cosine.swift:38 / runF16 :139 with f16 inv-norm cache)."""
    if x_invnorms is None:
        x_invnorms = inv_norms(x)
    if q_invnorms is None:
        q_invnorms = inv_norms(q)
    g = _gram(q, x)
    sim = g * q_invnorms[:, None].astype(jnp.float32) * x_invnorms[None, :].astype(
        jnp.float32
    )
    return jnp.clip(sim, -1.0, 1.0)


def manhattan_block(q: Array, x: Array) -> Array:
    """Σ|q−x| via VPU broadcasting (reference slow fallback
    ScoreBlock.swift:53-63)."""
    diff = q[:, None, :].astype(jnp.float32) - x[None, :, :].astype(jnp.float32)
    return jnp.sum(jnp.abs(diff), axis=-1)


def chebyshev_block(q: Array, x: Array) -> Array:
    """max|q−x| via VPU broadcasting."""
    diff = q[:, None, :].astype(jnp.float32) - x[None, :, :].astype(jnp.float32)
    return jnp.max(jnp.abs(diff), axis=-1)


# ---------------------------------------------------------------------------
# ScoreBlock dispatcher (#04)
# ---------------------------------------------------------------------------


def score_block(
    q: Array,
    x: Array,
    metric: Metric,
    norms: Optional[NormCache] = None,
    q_norms: Optional[NormCache] = None,
    opts: ScoreOpts = ScoreOpts(),
) -> Array:
    """Metric dispatcher → [B,N] raw scores (reference ScoreBlock.run,
    ScoreBlock.swift:24 — "the single scoring choke point").

    Returns the metric's *native* score: L2 → squared distance, IP → dot,
    cosine → similarity, manhattan/chebyshev → distance. Use
    `as_distance` / `ordering_for` to normalize for selection.
    """
    if metric == Metric.L2:
        if opts.use_dot_trick is False or opts.strict_fp:
            return l2sqr_block_direct(q, x)
        return l2sqr_block(
            q,
            x,
            x_sqnorms=None if norms is None else norms.sq,
            q_sqnorms=None if q_norms is None else q_norms.sq,
            clamp=opts.clamp,
        )
    if metric == Metric.INNER_PRODUCT:
        return inner_product_block(q, x)
    if metric == Metric.COSINE:
        return cosine_block(
            q,
            x,
            x_invnorms=None if norms is None else norms.inv,
            q_invnorms=None if q_norms is None else q_norms.inv,
        )
    if metric == Metric.MANHATTAN:
        return manhattan_block(q, x)
    if metric == Metric.CHEBYSHEV:
        return chebyshev_block(q, x)
    raise ValueError(f"unsupported metric: {metric}")


def as_distance(scores: Array, metric: Metric) -> Array:
    """Convert native scores to the ascending 'distance' convention used by
    all internal pipelines (reference HNSWTraversal.swift:60-70: L2 = d²,
    IP = −dot, cosine = 1 − sim)."""
    if metric == Metric.INNER_PRODUCT:
        return -scores
    if metric == Metric.COSINE:
        return 1.0 - scores
    return scores


def from_distance(dist: Array, metric: Metric) -> Array:
    """Invert `as_distance` back to the metric's native score. For L2 the
    public API additionally applies sqrt (reference HNSWIndex.swift:158) —
    that happens at the index layer, not here."""
    if metric == Metric.INNER_PRODUCT:
        return -dist
    if metric == Metric.COSINE:
        return 1.0 - dist
    return dist


def distance_block(
    q: Array,
    x: Array,
    metric: Metric,
    norms: Optional[NormCache] = None,
    q_norms: Optional[NormCache] = None,
    opts: ScoreOpts = ScoreOpts(),
) -> Array:
    """score_block + as_distance: ascending-is-better [B,N] distances."""
    return as_distance(score_block(q, x, metric, norms, q_norms, opts), metric)


def pairwise_distance(a: Array, b: Array, metric: Metric) -> Array:
    """Convenience alias for small pairwise blocks (construction paths;
    reference DistanceUtils.swift:12)."""
    return distance_block(a, b, metric)
