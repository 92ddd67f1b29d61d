"""Pallas kernels vs jnp reference in interpret mode (the rebuild's analog
of Swift-vs-C parity tests, SURVEY.md §4 tier 2)."""

import jax.numpy as jnp
import numpy as np
import pytest

from vectorindex_tpu.kernels.adc import adc_scan_pallas
from vectorindex_tpu.ops import pq as pq_ops


def test_adc_pallas_matches_gather_reference():
    rng = np.random.default_rng(0)
    n, m, ks, b = 1024, 8, 16, 4
    codes = jnp.asarray(rng.integers(0, ks, (n, m)).astype(np.uint8))
    lut = jnp.asarray(rng.standard_normal((b, m, ks)).astype(np.float32))
    got = np.asarray(adc_scan_pallas(codes, lut, tile=256, interpret=True))
    ref = np.asarray(pq_ops.adc_scan(codes, lut, strategy="gather", chunk=256))
    # bf16 LUT quantization in the kernel: loose tolerance
    np.testing.assert_allclose(got, ref, rtol=2e-2, atol=2e-2)


def test_adc_pallas_single_tile():
    rng = np.random.default_rng(1)
    n, m, ks, b = 128, 4, 16, 2
    codes = jnp.asarray(rng.integers(0, ks, (n, m)).astype(np.uint8))
    lut = jnp.asarray(rng.standard_normal((b, m, ks)).astype(np.float32))
    got = np.asarray(adc_scan_pallas(codes, lut, tile=128, interpret=True))
    assert got.shape == (b, n)
    ref = np.asarray(pq_ops.adc_scan(codes, lut, strategy="gather", chunk=128))
    np.testing.assert_allclose(got, ref, rtol=2e-2, atol=2e-2)


def test_adc_u4_pallas_matches_unpacked_reference():
    from vectorindex_tpu.kernels.adc import adc_scan_u4_pallas
    from vectorindex_tpu.ops.dtypes import pack_u4

    rng = np.random.default_rng(2)
    n, m, ks, b = 1024, 8, 16, 4
    codes = jnp.asarray(rng.integers(0, ks, (n, m)).astype(np.uint8))
    packed = pack_u4(codes)
    lut = jnp.asarray(rng.standard_normal((b, m, ks)).astype(np.float32))
    got = np.asarray(adc_scan_u4_pallas(packed, lut, tile=256, interpret=True))
    ref = np.asarray(pq_ops.adc_scan(codes, lut, strategy="gather", chunk=256))
    np.testing.assert_allclose(got, ref, rtol=2e-2, atol=2e-2)


def test_adc_topk_fused_matches_scan_then_sort():
    """Fused ADC top-k (interpret mode) == scan-then-strict-topk oracle."""
    import numpy as np
    from vectorindex_tpu.kernels.adc import adc_topk_fused
    from vectorindex_tpu.ops import pq as pq_ops
    from vectorindex_tpu.ops.topk import topk

    rng = np.random.default_rng(5)
    n, m, ks, b, k = 3000, 4, 16, 12, 10
    codes = jnp.asarray(rng.integers(0, ks, (n, m)), dtype=jnp.uint8)
    lut = jnp.asarray(rng.standard_normal((b, m, ks)).astype(np.float32) ** 2)
    ref_d = pq_ops.adc_scan(codes, lut, strategy="gather")
    rd, ri = topk(ref_d, k, strict_ties=True)
    fd, fi = adc_topk_fused(codes, lut, k, interpret=True)
    # fused may drop an entry only on a 4-in-one-bin collision; with random
    # data at n=3000 the sets must match exactly
    np.testing.assert_allclose(np.asarray(fd), np.asarray(rd), rtol=1e-5)
    assert (np.asarray(fi) == np.asarray(ri)).all()


def test_adc_topk_fused_dead_row_masking():
    import numpy as np
    from vectorindex_tpu.kernels.adc import adc_topk_fused

    rng = np.random.default_rng(6)
    n, m, ks, b = 100, 4, 16, 4  # n far below one tile: padding must be dead
    codes = jnp.asarray(rng.integers(0, ks, (n, m)), dtype=jnp.uint8)
    lut = jnp.asarray(np.abs(rng.standard_normal((b, m, ks))).astype(np.float32))
    fd, fi = adc_topk_fused(codes, lut, 10, interpret=True)
    assert (np.asarray(fi) < n).all()
    assert np.isfinite(np.asarray(fd)).all()
