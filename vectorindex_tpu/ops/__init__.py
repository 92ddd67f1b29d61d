"""Kernel-level operations (the reference's IndexOps namespace,
Operations/Namespace.swift:1-5, re-expressed as batched JAX ops)."""

from vectorindex_tpu.ops import dtypes, rng, scoring, topk  # noqa: F401
