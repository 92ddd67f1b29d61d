"""Pallas TPU kernel: ADC scan (one-hot × LUT on the MXU).

The signature PQ kernel of the rebuild (SURVEY.md §7 "ADC (#22) = a
VMEM-resident LUT gather kernel; this determines QPS/chip"). Parity target
is adc_scan_u8 (ADCScan.swift:54-148) — dist[b,i] = Σ_j LUT[b,j,codes[i,j]].

Kernel shape: grid over code tiles; per tile
  1. DMA codes tile [T, m] u8 → VMEM (16 B/row — the whole point of PQ),
  2. expand to one-hot [T, m·ks] bf16 with VPU compares (never touches HBM —
     the XLA 'onehot' strategy materializes this 8 KB/row intermediate),
  3. one MXU dot with the bf16 LUTᵀ [m·ks, B] (stationary in VMEM across
     the whole grid),
  4. transpose the [T, B] tile and write the [B, T] output block.

FLOP note (measured + roofline): one-hot ADC costs m·ks MACs/row/query vs
d for an exact scan, so at ks=256 it trades 32× compute for 32× less HBM
traffic — the right trade once the corpus is capacity/bandwidth-bound. At
ks=16 (u4 codes) the trade is ~2× and ADC wins outright.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

DEFAULT_TILE = 1024
# scoped VMEM budget for the one-hot tile (one-hot [tile, m*ks] bf16 is the
# dominant allocation; the hw limit is 16 MB and the LUT/acc need room)
VMEM_ONEHOT_BUDGET = 9 * 1024 * 1024


def auto_tile(m: int, ks: int, requested: int = DEFAULT_TILE) -> int:
    """Largest pow2 tile whose one-hot fits the VMEM budget (measured at
    m·ks=4096: tile=1024 → 5.1 ms / 25G row-q/s at roofline; tile=2048
    OOMs scoped vmem at 18.8M > 16M)."""
    cap = max(128, VMEM_ONEHOT_BUDGET // (m * ks * 2))
    cap = 1 << (cap.bit_length() - 1)
    return min(requested, cap)


def _adc_kernel(codes_ref, lut_t_ref, out_ref, *, m: int, ks: int, mxu_dtype):
    """One tile: codes [T, m] u8 × lutᵀ [m·ks, B] → out [B, T] f32."""
    codes = codes_ref[:].astype(jnp.int32)  # [T, m]
    t = codes.shape[0]
    # one-hot expansion in VMEM: [T, m, ks] compares on the VPU
    ks_iota = jax.lax.broadcasted_iota(jnp.int32, (t, m, ks), dimension=2)
    onehot = (codes[:, :, None] == ks_iota).astype(mxu_dtype).reshape(t, m * ks)
    # MXU: contract [m·ks, B] × [T, m·ks] → [B, T] directly (a [T, B]
    # result + in-kernel transpose costs a Mosaic relayout per tile)
    out_ref[:] = jax.lax.dot_general(
        lut_t_ref[:],
        onehot,
        dimension_numbers=(((0,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


@partial(jax.jit, static_argnames=("tile", "interpret"))
def adc_scan_pallas(
    codes: Array,  # [N, m] u8
    lut: Array,  # [B, m, ks] f32
    *,
    tile: int = DEFAULT_TILE,
    interpret: bool = False,
) -> Array:
    """ADC distances [B, N] f32 (rows padded internally to the tile size)."""
    n, m = codes.shape
    b, m2, ks = lut.shape
    assert m2 == m
    tile = auto_tile(m, ks, tile)
    pad = (-n) % tile
    if pad:
        codes = jnp.concatenate(
            [codes, jnp.zeros((pad, m), dtype=codes.dtype)], axis=0
        )
    # bf16 operands ride the MXU natively on TPU; the CPU interpreter lacks
    # bf16 dots, so interpret mode runs f32 (results identical up to
    # rounding — the one-hot side is exact either way)
    mxu_dtype = jnp.float32 if interpret else jnp.bfloat16
    lut_t = lut.reshape(b, m * ks).T.astype(mxu_dtype)  # [m·ks, B]

    grid = ((n + pad) // tile,)
    return pl.pallas_call(
        partial(_adc_kernel, m=m, ks=ks, mxu_dtype=mxu_dtype),
        out_shape=jax.ShapeDtypeStruct((b, n), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, m), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m * ks, b), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((b, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(codes, lut_t)[:, :n]


def _adc_u4_kernel(packed_ref, lut_t_ref, out_ref, *, m: int, ks: int, mxu_dtype):
    """u4 tile: packed codes [T, m//2] u8 unpack in VMEM (8 B/row of HBM
    traffic for m=16 — half the u8 path), then the same one-hot MXU dot.

    Nibbles are CONCATENATED (all lows | all highs) rather than interleaved
    — Mosaic can't shape-cast the interleave, and the ADC sum is
    permutation-invariant over subspaces, so the caller permutes the LUT's
    subspace axis to match instead."""
    packed = packed_ref[:].astype(jnp.int32)  # [T, m//2]
    t = packed.shape[0]
    lo = packed & 0xF
    hi = packed >> 4
    codes = jnp.concatenate([lo, hi], axis=1)  # [T, m] in lo|hi order
    # build the one-hot directly in FLAT [T, m·ks] form: Mosaic cannot
    # shape-cast [T, m, ks]→[T, m·ks] when ks < the 128-lane width (the u8
    # kernel's ks=256 merge is lane-aligned). pltpu.repeat tiles the whole
    # row (codes_rep[:, f] = codes[:, f % m]), so column f encodes
    # (subspace f % m, code f // m) — the caller flattens the LUT
    # code-major to match.
    codes_rep = pltpu.repeat(codes, ks, axis=1)  # [T, m·ks]
    val = jax.lax.broadcasted_iota(jnp.int32, (t, m * ks), 1) // m
    onehot = (codes_rep == val).astype(mxu_dtype)
    out_ref[:] = jax.lax.dot_general(
        lut_t_ref[:],
        onehot,
        dimension_numbers=(((0,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


@partial(jax.jit, static_argnames=("tile", "interpret"))
def adc_scan_u4_pallas(
    packed_codes: Array,  # [N, m//2] u8 (pack_u4 layout: even idx → low nibble)
    lut: Array,  # [B, m, ks] f32, ks ≤ 16
    *,
    tile: int = DEFAULT_TILE,
    interpret: bool = False,
) -> Array:
    """ADC over packed u4 codes → [B, N] f32 (reference adc_scan_u4,
    ADCScan.swift:99 — here the nibble unpack happens in VMEM so HBM only
    ever sees the packed bytes)."""
    n, mh = packed_codes.shape
    m = mh * 2
    b, m2, ks = lut.shape
    assert m2 == m and ks <= 16, (m2, m, ks)
    mxu_dtype = jnp.float32 if interpret else jnp.bfloat16
    tile = auto_tile(m, ks, tile)
    pad = (-n) % tile
    if pad:
        packed_codes = jnp.concatenate(
            [packed_codes, jnp.zeros((pad, mh), dtype=packed_codes.dtype)], axis=0
        )
    # kernel emits codes in lo|hi (even-subspaces | odd-subspaces) order and
    # its flat one-hot is code-major (column f ↔ subspace f % m, code
    # f // m) → permute the subspace axis and flatten code-major to match
    # (ADC sums over subspaces, so consistent reordering is exact)
    perm = jnp.concatenate(
        [jnp.arange(0, m, 2, dtype=jnp.int32), jnp.arange(1, m, 2, dtype=jnp.int32)]
    )
    lut_t = (
        lut[:, perm, :].transpose(0, 2, 1).reshape(b, ks * m).T.astype(mxu_dtype)
    )

    grid = ((n + pad) // tile,)
    return pl.pallas_call(
        partial(_adc_u4_kernel, m=m, ks=ks, mxu_dtype=mxu_dtype),
        out_shape=jax.ShapeDtypeStruct((b, n + pad), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, mh), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ks * m, b), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((b, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(packed_codes, lut_t)[:, :n]


# ---------------------------------------------------------------------------
# fused ADC top-k: scan + candidate collection in one corpus pass
# ---------------------------------------------------------------------------

#: candidate bins per query for the fused top-k (one residue class per lane)
C_BINS = 256


def _adc_candidates_kernel(
    codes_ref, lut_t_ref, d1_ref, i1_ref, d2_ref, i2_ref, d3_ref, i3_ref,
    *, m: int, ks: int, mxu_dtype, tile: int, n_live: int,
):
    """ADC tile + in-kernel binned top-k (the kernels/scan_fused scheme —
    two per-class minima per tile merged into three cross-tile tiers — with
    the one-hot MXU contraction replacing the dense score matmul). The
    [B, N] ADC distance matrix never exists in HBM: a full-corpus ADC top-k
    at 1M x 256q was 632 ms as scan-then-sort (1 GB materialized + two-key
    sort); fused it is one pass over 8 MB of codes."""
    i = pl.program_id(0)
    b = lut_t_ref.shape[1]

    @pl.when(i == 0)
    def _():
        for dref, iref in ((d1_ref, i1_ref), (d2_ref, i2_ref), (d3_ref, i3_ref)):
            dref[:] = jnp.full(dref.shape, jnp.inf, jnp.float32)
            iref[:] = jnp.zeros(iref.shape, jnp.int32)

    codes = codes_ref[:].astype(jnp.int32)  # [T, m]
    ks_iota = jax.lax.broadcasted_iota(jnp.int32, (tile, m, ks), dimension=2)
    onehot = (codes[:, :, None] == ks_iota).astype(mxu_dtype).reshape(tile, m * ks)
    dist = jax.lax.dot_general(
        lut_t_ref[:], onehot,
        dimension_numbers=(((0,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [B, T]
    base = i * tile
    gid = jax.lax.broadcasted_iota(jnp.int32, (b, tile), 1) + base
    dist = jnp.where(gid < n_live, dist, jnp.inf)  # padded rows sort last

    lane = jax.lax.broadcasted_iota(jnp.int32, (b, C_BINS), 1)
    tm1 = dist[:, :C_BINS]
    ti1 = lane + base
    tm2 = jnp.full((b, C_BINS), jnp.inf, jnp.float32)
    ti2 = jnp.zeros((b, C_BINS), jnp.int32)
    for j in range(1, tile // C_BINS):
        blk = dist[:, j * C_BINS : (j + 1) * C_BINS]
        ids = lane + (base + j * C_BINS)
        b1 = blk < tm1
        b2 = blk < tm2
        tm2 = jnp.where(b1, tm1, jnp.where(b2, blk, tm2))
        ti2 = jnp.where(b1, ti1, jnp.where(b2, ids, ti2))
        tm1 = jnp.where(b1, blk, tm1)
        ti1 = jnp.where(b1, ids, ti1)
    m1, id1 = d1_ref[:], i1_ref[:]
    m2, id2 = d2_ref[:], i2_ref[:]
    m3, id3 = d3_ref[:], i3_ref[:]
    for v, w in ((tm1, ti1), (tm2, ti2)):
        c1 = v < m1
        c2 = v < m2
        c3 = v < m3
        m3, id3 = (
            jnp.where(c2, m2, jnp.where(c3, v, m3)),
            jnp.where(c2, id2, jnp.where(c3, w, id3)),
        )
        m2, id2 = (
            jnp.where(c1, m1, jnp.where(c2, v, m2)),
            jnp.where(c1, id1, jnp.where(c2, w, id2)),
        )
        m1, id1 = jnp.where(c1, v, m1), jnp.where(c1, w, id1)
    d1_ref[:], i1_ref[:] = m1, id1
    d2_ref[:], i2_ref[:] = m2, id2
    d3_ref[:], i3_ref[:] = m3, id3


@partial(jax.jit, static_argnames=("k", "tile", "interpret"))
def adc_topk_fused(codes: Array, lut: Array, k: int, *, tile: int = DEFAULT_TILE,
                   interpret: bool = False):
    """Full-corpus ADC top-k → (dist [B, k], row ids [B, k]), strict
    (score, id) contract on the surviving candidates.

    Near-exact on the ADC distances: a true ADC-top-k entry is lost only
    when FOUR of them land in one residue class (~1e-5/query at k=10,
    C=256) — and ADC distances are themselves quantized approximations the
    caller reranks anyway (reference IVFPostADC), so no verification pass.
    """
    from vectorindex_tpu.ops.topk import topk

    n, m = codes.shape
    bq, m2, ks = lut.shape
    assert m2 == m
    tile = auto_tile(m, ks, tile)
    assert tile % C_BINS == 0, f"tile {tile} must be a multiple of {C_BINS}"
    pad = (-n) % tile
    if pad:
        codes = jnp.concatenate([codes, jnp.zeros((pad, m), codes.dtype)])
    bpad = (-bq) % 8
    if bpad:
        lut = jnp.concatenate([lut, jnp.zeros((bpad, m, ks), lut.dtype)])
    b = lut.shape[0]
    mxu_dtype = jnp.float32 if interpret else jnp.bfloat16
    lut_t = lut.reshape(b, m * ks).T.astype(mxu_dtype)  # [m·ks, B]

    out_spec = pl.BlockSpec(
        (b, C_BINS), lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    outs = pl.pallas_call(
        partial(
            _adc_candidates_kernel, m=m, ks=ks, mxu_dtype=mxu_dtype,
            tile=tile, n_live=n,
        ),
        out_shape=tuple(
            jax.ShapeDtypeStruct((b, C_BINS), dt)
            for dt in (jnp.float32, jnp.int32) * 3
        ),
        grid=((n + pad) // tile,),
        in_specs=[
            pl.BlockSpec((tile, m), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m * ks, b), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(out_spec,) * 6,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(codes, lut_t)
    cd = jnp.concatenate(outs[0::2], axis=1)  # [B, 3C]
    ci = jnp.concatenate(outs[1::2], axis=1)
    sd, si = topk(cd, min(k, 2 * C_BINS), ids=ci, strict_ties=True)
    return sd[:bq], si[:bq]
