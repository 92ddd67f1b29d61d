"""Deterministic benchmark data generation.

Parity target: reference DataGen (VectorIndexBenchmarks/main.swift:390-404)
— seeded LCG producing unit-normalized vectors, so runs are reproducible
without fixture files (SURVEY.md §4 'all data generated in-test with seeded
LCGs')."""

from __future__ import annotations

import numpy as np


def generate(n: int, d: int, seed: int = 42, normalized: bool = True) -> np.ndarray:
    """Seeded vector corpus [n, d] f32, unit-norm by default."""
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((n, d)).astype(np.float32)
    if normalized:
        x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-30)
    return x


def queries_from(x: np.ndarray, q: int, noise: float = 0.05, seed: int = 7) -> np.ndarray:
    """Queries near corpus points (controllable difficulty)."""
    rng = np.random.default_rng(seed)
    idx = rng.integers(0, x.shape[0], q)
    out = x[idx] + noise * rng.standard_normal((q, x.shape[1])).astype(np.float32)
    return out.astype(np.float32)


def generate_clustered(
    n: int,
    d: int,
    n_clusters: int = 1024,
    spread: float = 0.15,
    seed: int = 42,
    normalized: bool = True,
) -> np.ndarray:
    """Clustered corpus (SIFT-like local structure): IVF/graph recall on
    uniform random vectors is degenerate — real embedding corpora cluster,
    and meaningful recall/QPS tradeoffs need that structure."""
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_clusters, d)).astype(np.float32)
    assign = rng.integers(0, n_clusters, n)
    x = centers[assign] + spread * rng.standard_normal((n, d)).astype(np.float32)
    if normalized:
        x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-30)
    return x.astype(np.float32)
