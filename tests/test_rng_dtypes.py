"""RNG determinism + dtype helpers (reference test tier 3:
RNGDeterminismTests.swift:9-68 — reproducibility, stream independence,
uniformity; S2RNGDtypeTests / S2EdgeCaseTests — rounding/saturation)."""

import jax.numpy as jnp
import numpy as np

from vectorindex_tpu.ops import dtypes, rng


def test_same_seed_same_stream_reproducible():
    a = rng.uniform(rng.make_key(42, 0), (100,))
    b = rng.uniform(rng.make_key(42, 0), (100,))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_stream_independence():
    a = rng.uniform(rng.make_key(42, 0), (100,))
    b = rng.uniform(rng.make_key(42, 1), (100,))
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_split_stream_derivation():
    k = rng.make_key(7)
    a = rng.uniform(rng.split_stream(k, 0), (10,))
    b = rng.uniform(rng.split_stream(k, 1), (10,))
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_randperm_is_permutation():
    p = np.asarray(rng.randperm(rng.make_key(3), 257))
    assert sorted(p.tolist()) == list(range(257))


def test_sample_without_replacement_distinct():
    s = np.asarray(rng.sample_without_replacement(rng.make_key(4), 100, 30))
    assert len(set(s.tolist())) == 30
    assert s.min() >= 0 and s.max() < 100


def test_weighted_pick_respects_zero_weights():
    w = jnp.asarray([0.0, 1.0, 0.0, 2.0])
    picks = np.asarray(rng.weighted_pick(rng.make_key(5), w, (500,)))
    assert set(picks.tolist()) <= {1, 3}
    # heavier weight picked more often
    assert (picks == 3).sum() > (picks == 1).sum()


def test_uniformity_chi_square():
    # coarse chi-square uniformity like RNGDeterminismTests
    u = np.asarray(rng.uniform(rng.make_key(6), (10000,)))
    hist, _ = np.histogram(u, bins=10, range=(0, 1))
    expected = 1000.0
    chi2 = ((hist - expected) ** 2 / expected).sum()
    assert chi2 < 30.0  # df=9, p≈0.0004 cutoff


def test_gaussian_moments():
    g = np.asarray(rng.gaussian(rng.make_key(7), (20000,)))
    assert abs(g.mean()) < 0.05
    assert abs(g.std() - 1.0) < 0.05


# -- dtypes --


def test_bf16_roundtrip_rtne():
    x = jnp.asarray([1.0, 1.0 + 2**-9, -3.14159, 65504.0], dtype=jnp.float32)
    y = dtypes.bf16_to_f32(dtypes.f32_to_bf16(x))
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), rtol=1e-2)


def test_f16_saturation_to_inf():
    x = jnp.asarray([1e6], dtype=jnp.float32)
    y = np.asarray(dtypes.f32_to_f16(x))
    assert np.isinf(y[0])


def test_quantize_symmetric_roundtrip():
    x = jnp.asarray(np.random.default_rng(0).standard_normal(256).astype(np.float32))
    q, scale = dtypes.quantize_symmetric_i8(x)
    y = dtypes.dequantize_symmetric_i8(q, scale)
    assert np.max(np.abs(np.asarray(y) - np.asarray(x))) <= float(scale) * 0.51


def test_quantize_affine_roundtrip():
    x = jnp.asarray(np.random.default_rng(1).uniform(5, 9, 128).astype(np.float32))
    q, scale, zp = dtypes.quantize_affine_i8(x)
    y = dtypes.dequantize_affine_i8(q, scale, zp)
    assert np.max(np.abs(np.asarray(y) - np.asarray(x))) <= float(scale) * 0.51


def test_u4_pack_unpack_roundtrip():
    codes = jnp.asarray(
        np.random.default_rng(2).integers(0, 16, (7, 16)).astype(np.uint8)
    )
    packed = dtypes.pack_u4(codes)
    assert packed.shape == (7, 8)
    out = dtypes.unpack_u4(packed)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(codes))


def test_u4_pack_nibble_order():
    # even index → low nibble (reference CPQEncode contract)
    codes = jnp.asarray([[0x3, 0xA]], dtype=jnp.uint8)
    packed = np.asarray(dtypes.pack_u4(codes))
    assert packed[0, 0] == 0xA3
