"""Microbench the fused flat-scan kernel's two passes on the real chip.

Measures pass 1 (candidates) alone and the full verified scan (both
passes + epilogue) with the M-scaling dependent-loop method
(bench/timing.py) — plain dispatch loops report fiction under the axon
tunnel. Historical: this script A/B'd a software-pipelined pass-1 variant
(MXU scores tile i into parity scratch while the VPU folds tile i-1);
it measured 3.6x SLOWER (2.209 vs 0.610 ms pass-1) — the scratch
round-trip dwarfs any unit overlap — so the variant was deleted
(see kernels/scan_fused._reduce_tile docstring).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from vectorindex_tpu.bench.timing import time_loop
from vectorindex_tpu.kernels import scan_fused as sf
from vectorindex_tpu.utils.config import Metric

B, N, D = 256, 1_000_000, 128
K = 10
M = 400


def main():
    key = jax.random.key(1234)
    x = jax.random.normal(key, (N, D), dtype=jnp.bfloat16)
    sqn = jnp.sum(jnp.square(x.astype(jnp.float32)), axis=-1)
    qpool = jax.random.normal(
        jax.random.fold_in(key, 1), ((M + 1) * B, D), dtype=jnp.bfloat16
    )
    xp, sp, vp = sf.pad_corpus(x, sqn, None)
    bias = jnp.where(vp, sp, sf.INVALID_DIST)[None, :]

    def cand(q, xp, bias):
        d1, i1, d2, i2, d3, i3 = sf._bin_candidates(
            q.astype(jnp.float32), xp, bias, None,
            metric=Metric.L2, interpret=False,
        )
        fin = jnp.where(jnp.isfinite(d1), d1, 0.0)
        return jnp.sum(fin), jnp.sum(i1)

    t, _ = time_loop(cand, qpool, B, M, args=(xp, bias))
    print(f"pass1 (candidates): {t * 1e3:.3f} ms/batch", flush=True)

    def full(q, xp, sp, vp):
        sd, si, exact = sf.scan_topk_fused(
            q.astype(jnp.float32), xp, sp, vp, metric=Metric.L2, k=K,
        )
        fin = jnp.where(jnp.isfinite(sd), sd, 0.0)
        return jnp.sum(fin), jnp.sum(si), jnp.sum((~exact).astype(jnp.int32))

    t, r = time_loop(full, qpool, B, M, args=(xp, sp, vp))
    miss = float(r[2]) / ((M + 1) * B)
    print(
        f"full (2 passes + epilogue): {t * 1e3:.3f} ms/batch"
        f"  qps={B / t:.0f}  miss_frac={miss:.2e}",
        flush=True,
    )


if __name__ == "__main__":
    main()
