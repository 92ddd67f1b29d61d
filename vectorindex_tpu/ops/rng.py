"""Deterministic RNG streams.

Parity targets (reference S2, kernel spec "S2 RNG & dtype"):
  - xoroshiro128++ / Philox4x32 streams   Kernels/S2_RNGDtype.swift:32,159
  - rng_split (worker/task derivation)     S2_RNGDtype.swift:242
  - randperm / sample-without-replacement  S2_RNGDtype.swift:256,275
  - weighted pick                          S2_RNGDtype.swift:309
  - gaussian (Box-Muller in the reference) S2_RNGDtype.swift:344

TPU-native design: JAX's threefry counter-based PRNG already gives the
property the reference built Philox for — deterministic, splittable,
order-independent streams (SURVEY.md §2.4: "Philox already counter-based —
direct mapping"). Streams are keyed by (seed, stream) exactly like the
reference's (seed, streamID) pairs; `fold_in` replaces `rng_split`.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from vectorindex_tpu.utils.config import RNGConfig

Array = jax.Array


def make_key(seed: int, stream: int = 0) -> Array:
    """Derive a PRNG key from (seed, streamID) — reference semantics where
    every kernel takes rngSeed + streamID (e.g. KMeansSeedConfig,
    KMeansSeeding.swift:40). 64-bit seeds (e.g. the reference HNSW default
    0xDEADBEEFCAFEBABE) are folded in as two 32-bit halves."""
    seed = int(seed)
    lo = seed & 0x7FFFFFFF
    hi = (seed >> 31) & 0xFFFFFFFF
    key = jax.random.key(lo)
    if hi:
        key = jax.random.fold_in(key, hi & 0x7FFFFFFF)
        if hi >> 31:
            key = jax.random.fold_in(key, 1)
    return jax.random.fold_in(key, stream)


def key_from(cfg: RNGConfig) -> Array:
    return make_key(cfg.seed, cfg.stream)


def split_stream(key: Array, task_id: int | Array) -> Array:
    """Derive an independent child stream (reference rngSplit,
    S2_RNGDtype.swift:242 / CS2RNG s_rng_dtype_helpers.h:84)."""
    return jax.random.fold_in(key, task_id)


def randperm(key: Array, n: int) -> Array:
    """Uniform random permutation of [0, n) (reference randpermInPlace,
    S2_RNGDtype.swift:256)."""
    return jax.random.permutation(key, n)


def sample_without_replacement(key: Array, n: int, k: int) -> Array:
    """k distinct uniform draws from [0, n) (reference
    sampleWithoutReplacement, S2_RNGDtype.swift:275)."""
    return jax.random.permutation(key, n)[:k]


def weighted_pick(key: Array, weights: Array, shape: Tuple[int, ...] = ()) -> Array:
    """Sample indices proportionally to non-negative weights (reference
    weightedPick, S2_RNGDtype.swift:309). Zero-weight entries are never
    picked; used by k-means++ D² sampling."""
    logits = jnp.where(weights > 0, jnp.log(jnp.maximum(weights, 1e-38)), -jnp.inf)
    return jax.random.categorical(key, logits, shape=shape)


def gaussian(key: Array, shape: Tuple[int, ...], dtype=jnp.float32) -> Array:
    """Standard normal draws (reference gaussianBoxMuller,
    S2_RNGDtype.swift:344 — we use JAX's native normal; determinism per
    (seed, stream) is the contract, not bit-parity with Box-Muller)."""
    return jax.random.normal(key, shape, dtype=dtype)


def uniform(key: Array, shape: Tuple[int, ...], dtype=jnp.float32) -> Array:
    return jax.random.uniform(key, shape, dtype=dtype)
