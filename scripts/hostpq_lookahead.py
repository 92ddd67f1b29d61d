#!/usr/bin/env python
"""Sweep the host-tier serving stream's lookahead on the 10M crossover
index: the measured stream runs ~28 ms/batch against a 55 ms link-fetch
stage, so transfers already overlap — does a deeper window buy more?"""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax.numpy as jnp
import numpy as np

import bench as benchmod
from vectorindex_tpu.bench.cache import cached
from vectorindex_tpu.bench.synth import pack_ivf
from vectorindex_tpu.models.serve import HostRerankSession
from vectorindex_tpu.ops import pq as pq_ops
from vectorindex_tpu.ops.rerank import CSRReader
from vectorindex_tpu.utils.config import Metric

N, D, NLIST, K = 10_000_000, 96, 4096, 10
x = benchmod._cached_corpus(N, D, nlist=4096, seed=31)
art, _ = cached("ivfpq_crossover_n10000000_d96_k4096_pq16_v3", None)
arrays, _, cap = pack_ivf(
    x, np.asarray(art["assign"]).astype(np.int32), NLIST, with_vecs=False
)
bc = jnp.asarray(art["book_centroids"])
books = pq_ops.PQCodebooks(centroids=bc, sqnorms=jnp.sum(jnp.square(bc), -1))
reader = CSRReader(x, np.asarray(arrays.row_ids))
float(np.asarray(x[:, 0], dtype=np.float64).sum())  # prefault
b, nb = 64, 16
qs = benchmod._noisy_queries(x, nb * b, seed=12)
batches = [qs[i * b : (i + 1) * b] for i in range(nb)]
for la in (3, 6, 10):
    sess = HostRerankSession(
        centroids=jnp.asarray(np.asarray(art["centers"])), arrays=arrays,
        codes=jnp.asarray(art["codes"]), tcorr=jnp.asarray(art["tcorr"]),
        books=books, reader=reader, nprobe=8, probe_cap=cap,
        rerank_c=1024, metric=Metric.L2, lookahead=la,
    )
    for _ in sess.stream(batches[:4], K):  # warm
        pass
    t0 = time.perf_counter()
    n_out = 0
    for sd, si in sess.stream(batches, K):
        n_out += si.shape[0]
    dt = time.perf_counter() - t0
    assert n_out == nb * b
    print(f"lookahead={la}: {dt/nb*1e3:.2f} ms/batch  {nb*b/dt:.1f} qps",
          flush=True)
print("DONE", flush=True)
