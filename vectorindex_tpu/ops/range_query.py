"""Range / threshold queries.

Parity target (reference kernel #07): Operations/RangeQuery/RangeQuery.swift —
  - rangeScanBlock (:218) / rangeMaskBlock (:316): keep x iff ‖q−x‖ ≤ τ (L2)
    or score ≥ τ (IP/cosine) (:35-56)
  - output modes compacted / mask / reservoir (:65)
  - ADC variants rangeScanADC_u8/_u4 (:389/:469) scanning PQ codes against a
    LUT with a threshold
  - early-exit strategy knobs (:61) — moot on TPU: the scan is one fused
    matmul pass, there is nothing to exit early from.

TPU-native design: one scoring matmul + comparison produces the boolean mask
[B, N]; 'mask' mode returns it directly; 'count' fuses the popcount;
'compacted' returns fixed-width [B, max_results] id/score buffers filled by
a two-key sort (matches the reference's preallocated-out contract — dynamic
result sizes don't exist on device).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from vectorindex_tpu.ops import pq as pq_ops
from vectorindex_tpu.ops import scoring
from vectorindex_tpu.ops.topk import INVALID_DIST, INVALID_ID
from vectorindex_tpu.utils.config import Metric

Array = jax.Array


def _range_mask_from_dist(dist: Array, radius: Array, metric: Metric) -> Array:
    """Inclusive threshold in the metric's native convention: L2 keeps
    d ≤ τ (τ is a true distance → compare d² ≤ τ²); IP/cosine keep
    score ≥ τ (internal dist = −score / 1−sim)."""
    if metric == Metric.L2:
        return dist <= radius * radius
    if metric == Metric.INNER_PRODUCT:
        return -dist >= radius
    if metric == Metric.COSINE:
        return (1.0 - dist) >= radius
    return dist <= radius


@partial(jax.jit, static_argnames=("metric",))
def range_mask(
    q: Array,
    x: Array,
    radius: float,
    *,
    metric: Metric = Metric.L2,
    valid: Optional[Array] = None,
    x_sqnorms: Optional[Array] = None,
    x_invnorms: Optional[Array] = None,
) -> Array:
    """Boolean keep-mask [B, N] (reference rangeMaskBlock, RangeQuery.swift:316)."""
    norms = scoring.NormCache(sq=x_sqnorms, inv=x_invnorms)
    dist = scoring.distance_block(q, x, metric, norms=norms)
    mask = _range_mask_from_dist(dist, jnp.float32(radius), metric)
    if valid is not None:
        mask = mask & valid[None, :]
    return mask


@partial(jax.jit, static_argnames=("metric",))
def range_count(
    q: Array,
    x: Array,
    radius: float,
    *,
    metric: Metric = Metric.L2,
    valid: Optional[Array] = None,
) -> Array:
    """Per-query match count [B] — fused mask+popcount."""
    return jnp.sum(
        range_mask(q, x, radius, metric=metric, valid=valid).astype(jnp.int32),
        axis=-1,
    )


class RangeResult(NamedTuple):
    dists: Array  # [B, max_results] native-convention internal distance
    ids: Array  # [B, max_results] (INVALID_ID padded)
    counts: Array  # [B] true number of matches (may exceed max_results)


@partial(jax.jit, static_argnames=("metric", "max_results"))
def range_scan(
    q: Array,
    x: Array,
    radius: float,
    *,
    metric: Metric = Metric.L2,
    max_results: int = 128,
    valid: Optional[Array] = None,
    x_sqnorms: Optional[Array] = None,
    x_invnorms: Optional[Array] = None,
) -> RangeResult:
    """Compacted range scan (reference rangeScanBlock, RangeQuery.swift:218):
    fixed-width result buffers, nearest-first by (dist, id), with the true
    match count for overflow detection (the reference's reservoir mode is
    ops/reservoir.py)."""
    norms = scoring.NormCache(sq=x_sqnorms, inv=x_invnorms)
    dist = scoring.distance_block(q, x, metric, norms=norms)
    mask = _range_mask_from_dist(dist, jnp.float32(radius), metric)
    if valid is not None:
        mask = mask & valid[None, :]
    counts = jnp.sum(mask.astype(jnp.int32), axis=-1)
    n = x.shape[0]
    mr = min(max_results, n)
    ids = jax.lax.broadcasted_iota(jnp.int32, dist.shape, 1)
    dmask = jnp.where(mask, dist, INVALID_DIST)
    imask = jnp.where(mask, ids, INVALID_ID)
    sd, si = jax.lax.sort((dmask, imask), dimension=-1, num_keys=2)
    return RangeResult(sd[:, :mr], si[:, :mr], counts)


@partial(jax.jit, static_argnames=("max_results", "strategy", "chunk"))
def range_scan_adc(
    codes: Array,
    lut: Array,
    radius: float,
    *,
    max_results: int = 128,
    strategy: str = "gather",
    chunk: int = 8192,
    valid: Optional[Array] = None,
) -> RangeResult:
    """ADC range scan over PQ codes (reference rangeScanADC_u8,
    RangeQuery.swift:389): ADC distances vs τ² threshold, compacted output."""
    dist = pq_ops.adc_scan(codes, lut, strategy=strategy, chunk=chunk)
    mask = dist <= radius * radius
    if valid is not None:
        mask = mask & valid[None, :]
    counts = jnp.sum(mask.astype(jnp.int32), axis=-1)
    n = codes.shape[0]
    mr = min(max_results, n)
    ids = jax.lax.broadcasted_iota(jnp.int32, dist.shape, 1)
    dmask = jnp.where(mask, dist, INVALID_DIST)
    imask = jnp.where(mask, ids, INVALID_ID)
    sd, si = jax.lax.sort((dmask, imask), dimension=-1, num_keys=2)
    return RangeResult(sd[:, :mr], si[:, :mr], counts)


def range_scan_adc_u4(packed_codes: Array, lut: Array, radius: float, **kw):
    """u4 variant (reference rangeScanADC_u4, RangeQuery.swift:469)."""
    from vectorindex_tpu.ops.dtypes import unpack_u4

    return range_scan_adc(unpack_u4(packed_codes), lut, radius, **kw)


def range_scan_reservoir(
    q: Array,
    x: Array,
    radius: float,
    capacity: int,
    *,
    metric: Metric = Metric.L2,
    valid: Optional[Array] = None,
    chunk: int = 65536,
):
    """Reservoir output mode (reference RangeScanConfig output .reservoir,
    RangeQuery.swift:65): stream corpus chunks through a bounded top-C
    reservoir keeping the nearest in-radius matches — the memory-bounded
    variant for huge expected match counts. Returns a Reservoir."""
    from vectorindex_tpu.ops.reservoir import reservoir_init, reservoir_push_masked
    from vectorindex_tpu.ops.scoring import distance_block

    b, n = q.shape[0], x.shape[0]
    res = reservoir_init(b, capacity)
    r = jnp.float32(radius)
    for start in range(0, n, chunk):
        xs = x[start : start + chunk]
        dist = distance_block(q, xs, metric)
        mask = _range_mask_from_dist(dist, r, metric)
        if valid is not None:
            mask = mask & valid[start : start + chunk][None, :]
        ids = jax.lax.broadcasted_iota(jnp.int32, dist.shape, 1) + start
        res = reservoir_push_masked(res, dist, ids, mask)
    return res
