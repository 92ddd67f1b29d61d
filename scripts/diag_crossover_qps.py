#!/usr/bin/env python
"""Decompose the spilled-crossover QPS: candidate stage vs rerank stage,
and sliced (xp[:N]) vs unsliced (xp) rerank source — the slice hypothesis:
`rerank_vecs=xp[:N]` inside the jit materializes a 2.5 GB copy per call."""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

import bench as benchmod
from vectorindex_tpu.bench.cache import cached
from vectorindex_tpu.bench.synth import pack_ivf
from vectorindex_tpu.bench.timing import time_loop
from vectorindex_tpu.kernels.adc_probe import (
    ivf_search_pq_pallas,
    pq_probe_candidates,
)
from vectorindex_tpu.kernels.scan_fused import pad_corpus
from vectorindex_tpu.ops import pq as pq_ops
from vectorindex_tpu.utils.config import Metric

N, D, NLIST, K = 10_000_000, 96, 4096, 10
t0 = time.time()
x = benchmod._cached_corpus(N, D, nlist=4096, seed=31)
art, _ = cached("ivfpq_crossover_n10000000_d96_k4096_pq32x4_sp0.2_v1", None)
art_b, _ = cached("corpus_bf16_n10000000_d96_s31_v1", None)
arrays, _, cap = pack_ivf(
    x, art["assign_sp"].astype(np.int32), NLIST,
    src=art["src"].astype(np.int32), with_vecs=False,
)
bc = jnp.asarray(art["book_centroids"])
books = pq_ops.PQCodebooks(centroids=bc, sqnorms=jnp.sum(jnp.square(bc), -1))
codes = jnp.asarray(art["codes"])
tcorr = jnp.asarray(art["tcorr"])
cent = jnp.asarray(np.asarray(art["centers"]))
xb = np.asarray(art_b["xb"]).view(jnp.bfloat16.dtype)
xp, sp, vp = pad_corpus(jnp.asarray(xb), jnp.asarray(art_b["sqn"]), None)
jax.block_until_ready(xp)
print(f"[{time.time()-t0:.0f}s] ready, cap={cap}", flush=True)

b, m = 8, 100
qpool = jnp.asarray(benchmod._noisy_queries(x, (m + 1) * b, seed=10))

for nprobe, rc in ((8, 2048),):
    # 1) candidate stage only
    def cand(q, cent, arrays, codes, tcorr):
        cd, rows, iids = pq_probe_candidates(
            q, cent, arrays, codes, tcorr, books, nprobe=nprobe,
            probe_cap=cap, c=rc, metric=Metric.L2, packed_u4=True,
            dedup=True,
        )
        return (jnp.sum(jnp.where(jnp.isfinite(cd), cd, 0.0)),
                jnp.sum(rows), jnp.sum(iids))

    t, _ = time_loop(cand, qpool, b, m, args=(cent, arrays, codes, tcorr))
    print(f"[{time.time()-t0:.0f}s] cand-only nprobe={nprobe} c={rc}: "
          f"{t*1e3:.3f} ms ({b/t:.1f} qps)", flush=True)

    # 2) full search, UNSLICED rerank source
    def full_uns(q, cent, arrays, codes, tcorr, xp_a, sp_a):
        sd, si = ivf_search_pq_pallas(
            q, cent, arrays, codes, tcorr, books,
            rerank_vecs=xp_a, rerank_sqnorms=sp_a,
            nprobe=nprobe, probe_cap=cap, k=K, metric=Metric.L2,
            rerank_c=rc, dedup=True, packed_u4=True,
        )
        return jnp.sum(jnp.where(jnp.isfinite(sd), sd, 0.0)), jnp.sum(si)

    t, _ = time_loop(full_uns, qpool, b, m,
                     args=(cent, arrays, codes, tcorr, xp, sp))
    print(f"[{time.time()-t0:.0f}s] full UNSLICED nprobe={nprobe} c={rc}: "
          f"{t*1e3:.3f} ms ({b/t:.1f} qps)", flush=True)

    # 3) full search, SLICED source (the experiment's shape)
    def full_sl(q, cent, arrays, codes, tcorr, xp_a, sp_a):
        sd, si = ivf_search_pq_pallas(
            q, cent, arrays, codes, tcorr, books,
            rerank_vecs=xp_a[:N], rerank_sqnorms=sp_a[:N],
            nprobe=nprobe, probe_cap=cap, k=K, metric=Metric.L2,
            rerank_c=rc, dedup=True, packed_u4=True,
        )
        return jnp.sum(jnp.where(jnp.isfinite(sd), sd, 0.0)), jnp.sum(si)

    t, _ = time_loop(full_sl, qpool, b, m,
                     args=(cent, arrays, codes, tcorr, xp, sp))
    print(f"[{time.time()-t0:.0f}s] full SLICED   nprobe={nprobe} c={rc}: "
          f"{t*1e3:.3f} ms ({b/t:.1f} qps)", flush=True)

# recall at (8, 4096) — the truncation tail check (eval only, no timing)
truth = np.asarray(art["truth"])
qs_eval = benchmod._noisy_queries(x, 256, seed=9)
qe = jnp.asarray(qs_eval)
from vectorindex_tpu.bench.synth import recall_at_k

for nprobe, rc in ((8, 4096), (16, 4096), (8, 8192)):
    found = []
    for s in range(0, 256, b):
        _, si = ivf_search_pq_pallas(
            qe[s : s + b], cent, arrays, codes, tcorr, books,
            rerank_vecs=xp, rerank_sqnorms=sp,
            nprobe=nprobe, probe_cap=cap, k=K, metric=Metric.L2,
            rerank_c=rc, dedup=True, packed_u4=True,
        )
        found.append(np.asarray(si))
    rec = recall_at_k(np.concatenate(found), truth)
    print(f"[{time.time()-t0:.0f}s] recall nprobe={nprobe} rc={rc}: "
          f"{rec:.4f}", flush=True)
print("DONE", flush=True)
