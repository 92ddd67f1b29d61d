#!/usr/bin/env python
"""Seed hostpq_n30000000_..._qn0.25_v3 from the existing v3 artifact:
same corpus, same trained quantizer, same codes — only the ground truth
changes (noisier held-out queries, q_noise=0.25; VERDICT r4 weak #5).
Recomputing just the truth costs ~4 min instead of a ~30 min full build."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import bench as benchmod
from vectorindex_tpu.bench.cache import cached
from vectorindex_tpu.bench.synth import exact_truth_chunked

N, D = 30_000_000, 96
t0 = time.time()
x = benchmod._cached_corpus(N, D, nlist=4096, seed=31)
v3, _ = cached("hostpq_n30000000_d96_k8192_pq16_s31_v3", None)
qs = benchmod._noisy_queries(x, 256, seed=9, noise=0.25)
truth = exact_truth_chunked(qs, x, 10)
print(f"[{time.time()-t0:.0f}s] truth done", flush=True)

def build():
    return {
        "centers": np.asarray(v3["centers"]),
        "assign": np.asarray(v3["assign"]),
        "book_centroids": np.asarray(v3["book_centroids"]),
        "codes": np.asarray(v3["codes"]),
        "tcorr": np.asarray(v3["tcorr"]),
        "truth": truth,
        "build_s": np.float64(v3["build_s"]),  # the index state IS v3's
    }

art, was = cached("hostpq_n30000000_d96_k8192_pq16_s31_qn0.25_v3", build)
print(f"[{time.time()-t0:.0f}s] seeded (cached={was})", flush=True)
