#!/usr/bin/env python
"""Confirm the consistent-bf16 rerank fix + the (nprobe=1, rc) operating
points on the real chip: sqnorms computed over the bf16-ROUNDED rows make
the rerank an exact ||q - x_hat||^2 (host-measured sat recall 0.988 vs
0.9418 with mixed-precision sqnorms)."""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

import bench as benchmod
from vectorindex_tpu.bench.cache import cached
from vectorindex_tpu.bench.synth import pack_ivf, recall_at_k
from vectorindex_tpu.bench.timing import time_loop
from vectorindex_tpu.kernels.adc_probe import ivf_search_pq_pallas
from vectorindex_tpu.kernels.scan_fused import pad_corpus, scan_topk_fused
from vectorindex_tpu.ops import pq as pq_ops
from vectorindex_tpu.utils.config import Metric

N, D, NLIST, K = 10_000_000, 96, 4096, 10
t0 = time.time()
x = benchmod._cached_corpus(N, D, nlist=4096, seed=31)
art, _ = cached("ivfpq_crossover_n10000000_d96_k4096_pq32x4_sp0.2_v1", None)
art_b, _ = cached("corpus_bf16_n10000000_d96_s31_v1", None)
xb = np.asarray(art_b["xb"]).view(jnp.bfloat16.dtype)


def build_sqc():
    sq = np.zeros((N,), np.float32)
    for s in range(0, N, 1_000_000):
        c = xb[s : s + 1_000_000].astype(np.float32)
        sq[s : s + 1_000_000] = np.einsum("nd,nd->n", c, c)
    return {"sqn": sq}


art_c, _ = cached("corpus_bf16sqc_n10000000_d96_s31_v1", build_sqc)
sq_c = np.asarray(art_c["sqn"])
print(f"[{time.time()-t0:.0f}s] consistent sqnorms ready", flush=True)

arrays, _, cap = pack_ivf(
    x, art["assign_sp"].astype(np.int32), NLIST,
    src=art["src"].astype(np.int32), with_vecs=False,
)
bc = jnp.asarray(art["book_centroids"])
books = pq_ops.PQCodebooks(centroids=bc, sqnorms=jnp.sum(jnp.square(bc), -1))
codes = jnp.asarray(art["codes"])
tcorr = jnp.asarray(art["tcorr"])
cent = jnp.asarray(np.asarray(art["centers"]))
xp, sp, vp = pad_corpus(jnp.asarray(xb), jnp.asarray(sq_c), None)
jax.block_until_ready(xp)
print(f"[{time.time()-t0:.0f}s] device ready", flush=True)

truth = np.asarray(art["truth"])
qs_eval = benchmod._noisy_queries(x, 256, seed=9)
qe = jnp.asarray(qs_eval)
b, m = 8, 200
qpool = jnp.asarray(benchmod._noisy_queries(x, (m + 1) * b, seed=10))

for nprobe, rc in ((1, 1024), (1, 2048), (8, 2048)):
    kw = dict(nprobe=nprobe, probe_cap=cap, k=K, metric=Metric.L2,
              rerank_c=rc, dedup=True, packed_u4=True)

    def f(q, cent, arrays, codes, tcorr, xp_a, sp_a):
        sd, si = ivf_search_pq_pallas(
            q, cent, arrays, codes, tcorr, books,
            rerank_vecs=xp_a, rerank_sqnorms=sp_a, **kw
        )
        return jnp.sum(jnp.where(jnp.isfinite(sd), sd, 0.0)), jnp.sum(si)

    t, _ = time_loop(f, qpool, b, m,
                     args=(cent, arrays, codes, tcorr, xp, sp))
    found = []
    for s in range(0, 256, b):
        _, si = ivf_search_pq_pallas(
            qe[s : s + b], cent, arrays, codes, tcorr, books,
            rerank_vecs=xp, rerank_sqnorms=sp, **kw
        )
        found.append(np.asarray(si))
    rec = recall_at_k(np.concatenate(found), truth)
    print(f"[{time.time()-t0:.0f}s] nprobe={nprobe} rc={rc}: "
          f"qps={b/t:.1f} ms={t*1e3:.3f} recall@10={rec:.4f}", flush=True)


def flat(q, xp, sp, vp):
    sd, si, _ = scan_topk_fused(q, xp, sp, vp, metric=Metric.L2, k=K)
    return jnp.sum(sd), jnp.sum(si)


t_flat, _ = time_loop(flat, qpool, b, 40, args=(xp, sp, vp))
print(f"[{time.time()-t0:.0f}s] flat fused b=8: qps={b/t_flat:.1f}", flush=True)
print("DONE", flush=True)
