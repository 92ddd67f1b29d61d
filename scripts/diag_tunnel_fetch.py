"""Diagnose device->host transfer behavior under the axon tunnel.

The host-rerank stream pays ~116 ms/batch beyond the 11 ms device stage.
Candidates: (a) per-transfer relay RTT (fixed latency per device_get),
(b) transfers serialize even from multiple threads, (c) host gather/rerank.
Measures: single [64,1024] i32 fetch, 8 concurrent fetches from 4 threads,
one grouped [512,1024] fetch, and the host gather+rerank stages standalone.
"""

import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B, C, D = 64, 1024, 96


def t(fn, reps=5):
    fn()
    best = min(
        (lambda t0: (fn(), time.perf_counter() - t0)[1])(time.perf_counter())
        for _ in range(reps)
    )
    return best * 1e3


def main():
    key = jax.random.key(0)
    # distinct arrays so no caching; realistic candidate-id payload
    mats = [
        jax.block_until_ready(
            jax.random.randint(jax.random.fold_in(key, i), (B, C), 0, 1 << 20)
        )
        for i in range(16)
    ]
    big = jax.block_until_ready(
        jax.random.randint(jax.random.fold_in(key, 99), (8 * B, C), 0, 1 << 20)
    )

    print(f"single [{B},{C}] i32 fetch: {t(lambda: np.asarray(mats[0])):.1f} ms")

    def conc(nthreads, njobs):
        pool = ThreadPoolExecutor(nthreads)
        t0 = time.perf_counter()
        list(pool.map(lambda m: np.asarray(m), mats[:njobs]))
        dt = (time.perf_counter() - t0) * 1e3
        pool.shutdown()
        return dt

    conc(4, 8)  # warm
    print(f"8 fetches, 4 threads: {conc(4, 8):.1f} ms total")
    print(f"8 fetches, 1 thread:  {conc(1, 8):.1f} ms total")
    print(f"grouped [8x{B},{C}] single fetch: {t(lambda: np.asarray(big)):.1f} ms")

    # host stages standalone: gather 64k rows of d=96 f32 from a 10M-row
    # host array + numpy rerank
    x = np.random.default_rng(0).standard_normal((10_000_000, D), dtype=np.float32)
    rows = np.random.default_rng(1).integers(0, x.shape[0], B * C)
    q = np.random.default_rng(2).standard_normal((B, D), dtype=np.float32)

    def gather():
        return x[rows]

    g = gather()
    print(f"host gather {B * C} rows x {D} f32: {t(gather):.1f} ms")

    from vectorindex_tpu.ops.rerank import rerank_gathered_host

    iids = rows.reshape(B, C).astype(np.int32)
    xg = g.reshape(B, C, D)

    def rr():
        return rerank_gathered_host(q, xg, iids, k=10)

    from vectorindex_tpu.utils.config import Metric  # noqa: F401

    print(f"host rerank [B={B},C={C}]: {t(rr):.1f} ms")


if __name__ == "__main__":
    main()
