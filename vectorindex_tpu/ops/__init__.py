"""Kernel-level operations (the reference's IndexOps namespace,
Operations/Namespace.swift:1-5, re-expressed as batched JAX ops)."""

from vectorindex_tpu.ops import (  # noqa: F401
    dedup,
    dtypes,
    filtering,
    graph,
    idmap,
    ivf,
    ivf_pq,
    kmeans,
    layout,
    mips,
    pq,
    prefetch,
    range_query,
    reservoir,
    rng,
    scan,
    scoring,
    topk,
)
