#!/usr/bin/env python
"""Build + evaluate the spilled pq32x4 10M crossover index (round-5 ask #4).

Builds (and leaves in .benchcache/) the artifacts the redesigned
crossover10m bench config needs:
  - ivfpq_crossover_n10000000_d96_k4096_pq32x4_sp0.2_v1: spill
    multi-assignment state (src/assign/codes/tcorr/books) reusing the
    pq16_v3 artifact's trained quantizer + ground truth
  - corpus_bf16_n10000000_d96_s31_v1: bf16 corpus + f32 sqnorms in
    ORIGINAL row order — the shared device buffer that backs BOTH the
    exact rerank (id-keyed gather) and the flat-scan crossover leg

Then sweeps (nprobe, rerank_c) to find the operating point that breaks
the 0.92 routing plateau (target recall@10 >= 0.95 at >= 3x the flat
fused QPS).
"""
import gc
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from vectorindex_tpu.bench.cache import cached
from vectorindex_tpu.bench.synth import pack_ivf, pq_csr_state, recall_at_k
from vectorindex_tpu.bench.timing import time_loop
from vectorindex_tpu.kernels.adc_probe import ivf_search_pq_pallas
from vectorindex_tpu.kernels.scan_fused import pad_corpus, scan_topk_fused
from vectorindex_tpu.ops import pq as pq_ops
from vectorindex_tpu.ops.ivf import spill_assign
from vectorindex_tpu.utils.config import Metric

sys.path.insert(0, "/root/repo")
import bench as benchmod  # noqa: E402

N, D, NLIST, K = 10_000_000, 96, 4096, 10
EPS = 0.2

t_all = time.time()
x = benchmod._cached_corpus(N, D, nlist=4096, seed=31)
print(f"[{time.time()-t_all:.0f}s] corpus ready", flush=True)

art16, _ = cached("ivfpq_crossover_n10000000_d96_k4096_pq16_v3", lambda: None)
centers = art16["centers"]
truth = np.asarray(art16["truth"])
print(f"[{time.time()-t_all:.0f}s] pq16 artifact loaded", flush=True)


def build_spill():
    src, a_sp, frac = spill_assign(x, centers, eps=EPS)
    arrays_sp, order_sp, _cap = pack_ivf(
        x, a_sp, NLIST, src=src, with_vecs=False
    )
    books_sp, codes_sp, tcorr_sp = pq_csr_state(
        x, a_sp, centers, arrays_sp, order_sp, m=32, ks=256, u4=True,
        iters=12,
    )
    return {
        "src": src,
        "assign_sp": a_sp,
        "centers": centers,
        "book_centroids": np.asarray(books_sp.centroids),
        "codes": np.asarray(codes_sp),
        "tcorr": np.asarray(tcorr_sp),
        "frac": np.float64(frac),
        "truth": truth,
    }


art_sp, sp_cached = cached(
    "ivfpq_crossover_n10000000_d96_k4096_pq32x4_sp0.2_v1", build_spill
)
print(
    f"[{time.time()-t_all:.0f}s] spill artifact "
    f"(cached={sp_cached}, frac={float(art_sp['frac']):.3f}, "
    f"build_s={float(art_sp['build_s']):.0f})",
    flush=True,
)


def build_bf16():
    xb = np.empty(x.shape, dtype=jnp.bfloat16.dtype)
    sqn = np.zeros((x.shape[0],), dtype=np.float32)
    for s in range(0, x.shape[0], 1_000_000):
        chunk = np.asarray(x[s : s + 1_000_000], dtype=np.float32)
        sqn[s : s + 1_000_000] = np.einsum("nd,nd->n", chunk, chunk)
        xb[s : s + 1_000_000] = chunk.astype(jnp.bfloat16.dtype)
    return {"xb": xb.view(np.uint16), "sqn": sqn}


art_b, b_cached = cached("corpus_bf16_n10000000_d96_s31_v1", build_bf16)
xb_host = np.asarray(art_b["xb"]).view(jnp.bfloat16.dtype)
sqn_host = np.asarray(art_b["sqn"])
print(f"[{time.time()-t_all:.0f}s] bf16 corpus (cached={b_cached})", flush=True)

# device state
arrays, _, cap = pack_ivf(
    x, art_sp["assign_sp"].astype(np.int32), NLIST,
    src=art_sp["src"].astype(np.int32), with_vecs=False,
)
print(f"[{time.time()-t_all:.0f}s] packed (cap={cap})", flush=True)
bc = jnp.asarray(art_sp["book_centroids"])
books = pq_ops.PQCodebooks(
    centroids=bc, sqnorms=jnp.sum(jnp.square(bc), axis=-1)
)
codes = jnp.asarray(art_sp["codes"])
tcorr = jnp.asarray(art_sp["tcorr"])
cent = jnp.asarray(centers)
xp, sp_, vp = pad_corpus(jnp.asarray(xb_host), jnp.asarray(sqn_host), None)
jax.block_until_ready(xp)
print(f"[{time.time()-t_all:.0f}s] device upload done", flush=True)

qs_eval = benchmod._noisy_queries(x, 256, seed=9)
b = 8
m = 100
qpool = jnp.asarray(benchmod._noisy_queries(x, (m + 1) * b, seed=10))
qe = jnp.asarray(qs_eval)

for nprobe, rc in ((1, 1024), (8, 1024), (8, 2048), (16, 2048)):
    kw = dict(
        nprobe=nprobe, probe_cap=cap, k=K, metric=Metric.L2,
        rerank_c=rc, dedup=True, packed_u4=True,
    )

    # xp/sp_ pass through time_loop args — closure capture would embed
    # 2.6 GB of HLO constants and stall the tunnel compile
    def f(q, cent, arrays, codes, tcorr, xp_a, sp_a):
        sd, si = ivf_search_pq_pallas(
            q, cent, arrays, codes, tcorr, books,
            rerank_vecs=xp_a[:N], rerank_sqnorms=sp_a[:N], **kw
        )
        return jnp.sum(jnp.where(jnp.isfinite(sd), sd, 0.0)), jnp.sum(si)

    t, _ = time_loop(f, qpool, b, m, args=(cent, arrays, codes, tcorr, xp, sp_))
    found = []
    for s in range(0, 256, b):
        _, si = ivf_search_pq_pallas(
            qe[s : s + b], cent, arrays, codes, tcorr, books,
            rerank_vecs=xp[:N], rerank_sqnorms=sp_[:N], **kw
        )
        found.append(np.asarray(si))
    rec = recall_at_k(np.concatenate(found), truth)
    print(
        f"[{time.time()-t_all:.0f}s] spill nprobe={nprobe} rerank_c={rc}: "
        f"qps={b/t:.1f} ms={t*1e3:.3f} recall@10={rec:.4f}",
        flush=True,
    )

# flat leg off the SAME buffer
def flat(q, xp, sp_, vp):
    sd, si, _ = scan_topk_fused(q, xp, sp_, vp, metric=Metric.L2, k=K)
    return jnp.sum(sd), jnp.sum(si)

t_flat, _ = time_loop(flat, qpool, b, 40, args=(xp, sp_, vp))
print(
    f"[{time.time()-t_all:.0f}s] flat fused b=8: qps={b/t_flat:.1f} "
    f"ms={t_flat*1e3:.3f}",
    flush=True,
)
print("DONE", flush=True)
