import numpy as np, time
from vectorindex_tpu.models import IVFPQIndex, IVFPQConfig
rng = np.random.default_rng(0)
n, d = 50_000, 64
centers = rng.standard_normal((64, d)).astype(np.float32) * 2
x = (centers[rng.integers(0, 64, n)] + 0.3*rng.standard_normal((n, d))).astype(np.float32)
idx = IVFPQIndex(d, config=IVFPQConfig(nlist=64, nprobe=8, m=8, ks=256, rerank=True, rerank_c=64))
idx.insert_batch(list(range(n)), x)
t0=time.perf_counter(); idx.optimize(); print(f"optimize: {time.perf_counter()-t0:.0f}s", flush=True)
q = x[:64] + 0.01*rng.standard_normal((64, d)).astype(np.float32)
t0=time.perf_counter(); res = idx.batch_search(q, 10); print(f"search1 (compile): {time.perf_counter()-t0:.0f}s", flush=True)
t0=time.perf_counter(); res = idx.batch_search(q, 10); print(f"search2: {(time.perf_counter()-t0)*1e3:.0f}ms", flush=True)
truth = np.argsort(((q[:,None,:]-x[None])**2).sum(-1), 1)[:, :10]
hits = sum(len({r.id for r in row} & set(truth[b].tolist())) for b, row in enumerate(res))
print(f"recall@10 nprobe8/64 + rerank: {hits/640:.3f}", flush=True)
print("stats:", idx.statistics().details, flush=True)
