import numpy as np, time
from vectorindex_tpu.models import HNSWIndex, HNSWConfig
rng = np.random.default_rng(0)
n, d = 50_000, 64
x = rng.standard_normal((n, d)).astype(np.float32)
idx = HNSWIndex(d, config=HNSWConfig(m=16, ef_construction=64, ef_search=64, build_chunk=512))
t0=time.perf_counter(); idx.insert_batch(list(range(n)), x); print(f"insert(buffer): {time.perf_counter()-t0:.1f}s", flush=True)
t0=time.perf_counter(); idx._ensure_built(); print(f"build: {time.perf_counter()-t0:.1f}s", flush=True)
q = x[:256] + 0.01*rng.standard_normal((256, d)).astype(np.float32)
t0=time.perf_counter(); res = idx.batch_search(q, 10); print(f"search1(compile): {time.perf_counter()-t0:.1f}s", flush=True)
t0=time.perf_counter(); res = idx.batch_search(q, 10); dt=time.perf_counter()-t0
truth = np.argsort(((q[:,None,:]-x[None])**2).sum(-1), 1)[:, :10]
hits = sum(len({r.id for r in row} & set(truth[b].tolist())) for b, row in enumerate(res))
print(f"recall@10: {hits/2560:.3f}, 256 queries in {dt*1e3:.0f}ms -> {256/dt:.0f} QPS", flush=True)
print("stats:", idx.statistics().details, flush=True)
