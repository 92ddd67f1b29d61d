import time, jax, jax.numpy as jnp, numpy as np
from vectorindex_tpu.kernels.adc import adc_scan_pallas
from vectorindex_tpu.ops import pq as pq_ops

N, M, KS, B = 1_000_000, 16, 256, 128
key = jax.random.key(0)
codes = jax.random.randint(key, (N, M), 0, KS, dtype=jnp.int32).astype(jnp.uint8)
lut = jax.random.normal(jax.random.fold_in(key, 1), (B, M, KS), dtype=jnp.float32)

# correctness spot-check vs gather on a slice
small_codes = codes[:4096]
ref = pq_ops.adc_scan(small_codes, lut, strategy="gather", chunk=4096)
got = adc_scan_pallas(small_codes, lut, tile=512)
err = jnp.max(jnp.abs(ref - got)) / (jnp.max(jnp.abs(ref)) + 1e-9)
print("rel err vs gather:", float(err), flush=True)

def timeit(name, fn):
    def run_m(m):
        @jax.jit
        def f(lut):
            def body(i, acc):
                l2 = lut + (i.astype(jnp.float32) * 1e-9)
                return acc + jnp.sum(fn(codes, l2))
            return jax.lax.fori_loop(0, m, body, 0.0)
        return f
    f1, fm = run_m(1), run_m(4)
    jax.device_get(f1(lut)); jax.device_get(fm(lut))
    t0=time.perf_counter(); jax.device_get(f1(lut)); t1=time.perf_counter()-t0
    t0=time.perf_counter(); jax.device_get(fm(lut)); tm=time.perf_counter()-t0
    per=(tm-t1)/3
    print(f"{name}: {per*1e3:.1f} ms -> {N*B/per/1e9:.2f}G row-queries/s", flush=True)

for tile in (512, 1024, 2048):
    timeit(f"pallas tile={tile}", lambda c, l, t=tile: adc_scan_pallas(c, l, tile=t))
