"""Dtype conversion and quantization helpers.

Parity targets (reference S2 dtype half, CS2RNG):
  - f32↔f16 / f32↔bf16 batch conversion     S2_RNGDtype.swift:386-487
    (the reference implements software round-to-nearest-even for cross-ARM
    determinism, s_rng_dtype_helpers.c:5-9; XLA's dtype casts are RTNE by
    spec, so `astype` is the native equivalent)
  - int8 symmetric/affine quantize/dequant   S2_RNGDtype.swift:522-587
  - u4 nibble pack/unpack                    S2_RNGDtype.swift:632-652
    (also CPQEncode's u4 bulk pack, pq_encode.c:452-468)
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def f32_to_bf16(x: Array) -> Array:
    """Round-to-nearest-even f32→bf16 (reference f32ToBF16Batch,
    S2_RNGDtype.swift:470)."""
    return x.astype(jnp.bfloat16)


def bf16_to_f32(x: Array) -> Array:
    return x.astype(jnp.float32)


def f32_to_f16(x: Array) -> Array:
    """RTNE f32→f16 with overflow→inf semantics (reference f32ToF16Batch,
    S2_RNGDtype.swift:386)."""
    return x.astype(jnp.float16)


def f16_to_f32(x: Array) -> Array:
    return x.astype(jnp.float32)


# ---------------------------------------------------------------------------
# int8 quantization (reference quantizeSymmetric/Affine, S2_RNGDtype.swift:522-587)
# ---------------------------------------------------------------------------


def quantize_symmetric_i8(x: Array, axis=None) -> Tuple[Array, Array]:
    """Symmetric int8: q = round(x/scale), scale = max|x|/127 (per-axis if
    given). Returns (codes i8, scale f32). Saturating like the reference."""
    absmax = jnp.max(jnp.abs(x), axis=axis, keepdims=axis is not None)
    scale = jnp.maximum(absmax, 1e-30) / 127.0
    q = jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


def dequantize_symmetric_i8(q: Array, scale: Array) -> Array:
    return q.astype(jnp.float32) * scale


def quantize_affine_i8(x: Array, axis=None) -> Tuple[Array, Array, Array]:
    """Affine int8: q = round(x/scale) + zp mapping [min,max] → [-128,127].
    Returns (codes i8, scale f32, zero_point i32)."""
    lo = jnp.min(x, axis=axis, keepdims=axis is not None)
    hi = jnp.max(x, axis=axis, keepdims=axis is not None)
    rng = hi - lo
    # degenerate (constant) range: scale = |v|/127 reconstructs the constant
    # exactly instead of overflowing the zero point (lo/eps → int32 wrap)
    degen = rng <= 0
    scale = jnp.where(
        degen,
        jnp.maximum(jnp.abs(hi), 1e-12) / 127.0,
        jnp.maximum(rng, 1e-30) / 255.0,
    )
    zp = jnp.where(
        degen, 0, jnp.round(-128.0 - lo / scale)
    ).astype(jnp.int32)
    q = jnp.clip(jnp.round(x / scale) + zp, -128, 127).astype(jnp.int8)
    return q, scale.astype(jnp.float32), zp


def dequantize_affine_i8(q: Array, scale: Array, zp: Array) -> Array:
    return (q.astype(jnp.int32) - zp).astype(jnp.float32) * scale


# ---------------------------------------------------------------------------
# u4 nibble packing (reference nibble pack S2_RNGDtype.swift:632-652;
# CPQEncode u4 bulk pack pq_encode.c:452-468: even index → low nibble)
# ---------------------------------------------------------------------------


def pack_u4(codes: Array) -> Array:
    """Pack u4 codes (values 0..15, last axis even-length) into bytes.
    codes[..., 2i] → low nibble, codes[..., 2i+1] → high nibble (the
    reference's pairing contract, cpq_encode.h u4 pack)."""
    assert codes.shape[-1] % 2 == 0, "u4 pack requires even last axis"
    c = codes.astype(jnp.uint8)
    lo = c[..., 0::2]
    hi = c[..., 1::2]
    return (lo | (hi << 4)).astype(jnp.uint8)


def unpack_u4(packed: Array) -> Array:
    """Inverse of pack_u4: bytes → u4 codes with 2× last-axis length."""
    p = packed.astype(jnp.uint8)
    lo = p & 0xF
    hi = p >> 4
    return jnp.stack([lo, hi], axis=-1).reshape(*p.shape[:-1], p.shape[-1] * 2)
