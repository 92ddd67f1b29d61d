import numpy as np, time, jax
from vectorindex_tpu.models import IVFIndex, IVFConfig
from vectorindex_tpu.bench.datagen import generate, queries_from

n, d = 1_000_000, 128
x = generate(n, d, seed=42)
q = queries_from(x, 256, noise=0.05, seed=7)
print("data ready", flush=True)

idx = IVFIndex(d, config=IVFConfig(nlist=1024, nprobe=8), )
t0=time.perf_counter(); idx.insert_batch(list(range(n)), x); print(f"insert: {time.perf_counter()-t0:.0f}s", flush=True)
t0=time.perf_counter(); idx.optimize(); print(f"optimize (kmeans 1024 over 1M): {time.perf_counter()-t0:.0f}s", flush=True)
st = idx.statistics().details
print("stats:", st, flush=True)

truth = None
import numpy as _np
# brute-force truth via jax in chunks (f32)
import jax.numpy as jnp
xj = jnp.asarray(x); qj = jnp.asarray(q)
d2 = jnp.sum(qj**2,1)[:,None] + jnp.sum(xj**2,1)[None,:] - 2.0*jax.lax.dot_general(qj, xj, (((1,),(1,)),((),())), preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
_, ti = jax.lax.top_k(-d2, 10)
truth = _np.asarray(ti)
print("truth ready", flush=True)

for nprobe in (1, 8, 32):
    idx.config = IVFConfig(nlist=1024, nprobe=nprobe)
    t0=time.perf_counter(); res = idx.batch_search(q, 10); t_first=time.perf_counter()-t0
    t0=time.perf_counter(); res = idx.batch_search(q, 10); dt=time.perf_counter()-t0
    hits = sum(len({r.id for r in row} & set(truth[b].tolist())) for b, row in enumerate(res))
    print(f"nprobe={nprobe}: recall@10 {hits/2560:.3f}, warm 256q in {dt*1e3:.0f}ms -> {256/dt:.0f} QPS (first {t_first:.0f}s)", flush=True)
