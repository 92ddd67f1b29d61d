import time, jax, jax.numpy as jnp, numpy as np
from vectorindex_tpu.ops import pq as pq_ops

N, M, KS, B = 1_000_000, 16, 256, 128
key = jax.random.key(0)
codes = jax.random.randint(key, (N, M), 0, KS, dtype=jnp.int32).astype(jnp.uint8)
lut = jax.random.normal(jax.random.fold_in(key, 1), (B, M, KS), dtype=jnp.float32)

def timeit(name, fn, *args):
    def run_m(m):
        @jax.jit
        def f(lut):
            def body(i, acc):
                l2 = lut + (i.astype(jnp.float32) * 1e-9)
                out = fn(codes, l2)
                return acc + jnp.sum(out)
            return jax.lax.fori_loop(0, m, body, 0.0)
        return f
    f1, fm = run_m(1), run_m(4)
    jax.device_get(f1(lut)); jax.device_get(fm(lut))
    t0=time.perf_counter(); jax.device_get(f1(lut)); t1=time.perf_counter()-t0
    t0=time.perf_counter(); jax.device_get(fm(lut)); tm=time.perf_counter()-t0
    per=(tm-t1)/3
    rows_s = N*B/per
    print(f"{name}: {per*1e3:.1f} ms -> {rows_s/1e9:.2f}G row-queries/s, codes {N*M/per/1e9:.1f} GB/s", flush=True)

timeit("onehot", lambda c, l: pq_ops.adc_scan(c, l, strategy="onehot", chunk=8192))
timeit("gather", lambda c, l: pq_ops.adc_scan(c, l, strategy="gather", chunk=8192))
