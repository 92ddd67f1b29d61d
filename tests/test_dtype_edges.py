"""Dtype conversion edge cases.

Parity model: reference S2EdgeCaseTests.swift (rounding/saturation edges of
the CS2RNG dtype helpers: f16/bf16 conversion specials, int8 quantize
saturation, zero-range affine guards, nibble packing edges) applied to
ops/dtypes.py.
"""

import numpy as np
import pytest

from vectorindex_tpu.ops import dtypes as dt

jnp = pytest.importorskip("jax.numpy")


# ---------------------------------------------------------------------------
# float conversions
# ---------------------------------------------------------------------------


def test_bf16_specials_preserved():
    x = jnp.asarray([0.0, -0.0, np.inf, -np.inf], dtype=jnp.float32)
    y = np.asarray(dt.bf16_to_f32(dt.f32_to_bf16(x)))
    assert y[0] == 0.0 and y[1] == 0.0
    assert np.isposinf(y[2]) and np.isneginf(y[3])


def test_bf16_nan_stays_nan():
    y = np.asarray(dt.bf16_to_f32(dt.f32_to_bf16(jnp.asarray([np.nan]))))
    assert np.isnan(y[0])


def test_bf16_round_to_nearest_even():
    # 1 + 2^-8 sits exactly between two bf16 values (7-bit mantissa):
    # RTNE resolves to the even mantissa, i.e. exactly 1.0
    x = jnp.asarray([1.0 + 2.0**-8], dtype=jnp.float32)
    y = np.asarray(dt.bf16_to_f32(dt.f32_to_bf16(x)))
    assert y[0] == 1.0
    # just above the midpoint rounds up
    x2 = jnp.asarray([1.0 + 2.0**-8 + 2.0**-12], dtype=jnp.float32)
    y2 = np.asarray(dt.bf16_to_f32(dt.f32_to_bf16(x2)))
    assert y2[0] == 1.0 + 2.0**-7


def test_f16_overflow_saturates_to_inf():
    # reference S2 semantics: values beyond f16 max become inf, not garbage
    x = jnp.asarray([1e6, -1e6], dtype=jnp.float32)
    y = np.asarray(dt.f16_to_f32(dt.f32_to_f16(x)))
    assert np.isposinf(y[0]) and np.isneginf(y[1])


def test_f16_subnormal_range_roundtrip():
    x = jnp.asarray([6e-8, 1e-7], dtype=jnp.float32)  # f16 subnormal zone
    y = np.asarray(dt.f16_to_f32(dt.f32_to_f16(x)))
    assert np.all(np.abs(y - np.asarray(x)) <= 6e-8)


def test_bf16_preserves_exponent_range():
    # bf16 shares f32's exponent: 1e38 must survive (unlike f16)
    x = jnp.asarray([1e38, -1e38], dtype=jnp.float32)
    y = np.asarray(dt.bf16_to_f32(dt.f32_to_bf16(x)))
    assert np.isfinite(y).all()
    assert np.allclose(y, np.asarray(x), rtol=0.01)


# ---------------------------------------------------------------------------
# int8 quantization
# ---------------------------------------------------------------------------


def test_symmetric_saturation_at_127():
    x = jnp.asarray([[-3.0, 0.0, 3.0]])
    q, scale = dt.quantize_symmetric_i8(x)
    qn = np.asarray(q)
    assert qn.max() == 127 and qn.min() >= -127
    back = np.asarray(dt.dequantize_symmetric_i8(q, scale))
    assert np.allclose(back, np.asarray(x), atol=3.0 / 127 + 1e-6)


def test_symmetric_all_zero_input():
    x = jnp.zeros((2, 4))
    q, scale = dt.quantize_symmetric_i8(x)
    assert np.asarray(q).sum() == 0
    back = np.asarray(dt.dequantize_symmetric_i8(q, scale))
    assert np.isfinite(back).all() and (back == 0).all()


def test_affine_zero_range_guard():
    # constant input: scale must not divide by zero; dequant returns const
    x = jnp.full((1, 8), 2.5)
    q, scale, zp = dt.quantize_affine_i8(x)
    back = np.asarray(dt.dequantize_affine_i8(q, scale, zp))
    assert np.isfinite(back).all()
    assert np.allclose(back, 2.5, atol=1e-2)


def test_affine_asymmetric_range():
    x = jnp.asarray([[0.0, 10.0]])
    q, scale, zp = dt.quantize_affine_i8(x)
    back = np.asarray(dt.dequantize_affine_i8(q, scale, zp))
    assert np.allclose(back, np.asarray(x), atol=10.0 / 255 + 1e-6)


def test_symmetric_per_axis_scales_independent():
    x = jnp.asarray([[1.0, -1.0], [100.0, -100.0]])
    q, scale = dt.quantize_symmetric_i8(x, axis=1)
    back = np.asarray(dt.dequantize_symmetric_i8(q, scale))
    assert np.allclose(back, np.asarray(x), rtol=0.02)


# ---------------------------------------------------------------------------
# u4 nibble packing
# ---------------------------------------------------------------------------


def test_u4_all_boundary_values():
    codes = jnp.asarray(
        np.array([[0, 15, 15, 0], [7, 8, 1, 14]], dtype=np.uint8)
    )
    packed = dt.pack_u4(codes)
    assert packed.shape == (2, 2)
    got = np.asarray(dt.unpack_u4(packed))
    assert (got == np.asarray(codes)).all()


def test_u4_large_roundtrip_random():
    rng = np.random.default_rng(3)
    codes = jnp.asarray(rng.integers(0, 16, (257, 6)).astype(np.uint8))
    got = np.asarray(dt.unpack_u4(dt.pack_u4(codes)))
    assert (got == np.asarray(codes)).all()


def test_u4_pack_requires_even_m():
    codes = jnp.asarray(np.zeros((4, 3), dtype=np.uint8))
    with pytest.raises(Exception):
        np.asarray(dt.pack_u4(codes))
