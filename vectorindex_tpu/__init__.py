"""vectorindex_tpu — a TPU-native ANN index-and-query engine in JAX/XLA/Pallas.

A from-scratch rebuild of the capabilities of gifton/VectorIndex (a CPU-first
Swift+C ANN library; see /root/reference) designed TPU-first:

- scoring is tiled MXU matmuls with a dot-trick epilogue (reference:
  Sources/VectorIndex/Operations/Scoring/*.swift), not SIMD scan loops;
- selection is on-chip top-k with a deterministic (score, id) tie-break and
  cross-shard merge over ICI (reference: Operations/Selection/TopK.swift,
  TopKMerge.swift);
- queries are *batched* through the whole pipeline (the reference fans out one
  task per query; we vmap/batch instead — SURVEY.md §2.4);
- PQ/ADC, IVF probing, and graph traversal are dense batched device programs.

Top-level namespaces:
  ops/         kernel-level operations (scoring, topk, kmeans, pq, ivf, graph …)
  kernels/     Pallas TPU kernels for the hot paths
  models/      index families (Flat, IVF-Flat, IVF-PQ, HNSW-style graph)
  parallel/    device-mesh sharding + ICI top-k merge
  persistence/ VINDEX-style binary container + JSON snapshots
  utils/       errors, config, telemetry
"""

__version__ = "0.1.0"

import jax as _jax

# Partitionable threefry: sharding-invariant RNG streams (and the config the
# test harness runs under — one setting everywhere keeps (seed, stream)
# draws identical across CPU tests and TPU production).
_jax.config.update("jax_threefry_partitionable", True)

from vectorindex_tpu.utils.errors import IndexError, IndexErrorKind  # noqa: F401
