"""Device timing helpers for the axon-tunnel TPU platform.

block_until_ready / device_get can report ~0s for async work under the
tunnel, and identical loop bodies get hoisted/DCE'd by XLA — so the only
reliable method is M-scaling: time one jit call that runs M *dependent*
iterations over distinct query slices and fully reduces every output, then
difference M=1 vs M=1+R timings (see .claude/skills/verify/SKILL.md).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp


def time_loop(search_outputs_fn, qpool, b: int, m: int, repeats: int = 3,
              args=(), return_samples: bool = False):
    """(seconds_per_batch, outputs): difference M=1 vs M=1+m dependent
    in-jit iterations over distinct [b, d] slices of qpool, reducing all of
    search_outputs_fn's outputs (a tuple of scalars: float first, then
    int32s).

    The estimator is the MEDIAN of the per-repeat differences: tunnel noise
    perturbs the M=1 and M=1+m calls independently, so a difference can err
    in EITHER direction — min-of-N is biased toward inflated QPS (it once
    produced a >2.6x-over-peak flat headline, VERDICT r3 weak #1), while
    the median is unbiased under symmetric noise. Callers that need a
    physical-sanity floor pass return_samples=True and apply their own
    roofline check over the raw samples.

    Pass corpus-sized device buffers through `args` (forwarded as
    search_outputs_fn(q, *args)) rather than closing over them: closure-
    captured arrays lower as HLO constants, and a 256 MB constant blows the
    remote-compile request past the axon tunnel's body limit (HTTP 413)."""

    # the iteration count is a TRACED scalar: one compile serves both the
    # M=1 and M=1+m calls (fori_loop lowers to while_loop, which also
    # guarantees XLA can't unroll/DCE the dependent chain). Halving the
    # compile count matters — every compile crosses the axon tunnel
    # (VERDICT r2: bench.py must fit the driver budget).
    @jax.jit
    def f(mm, qpool, *args):
        def body(i, acc):
            q = jax.lax.dynamic_slice_in_dim(qpool, i * b, b)
            o = search_outputs_fn(q, *args)
            return tuple(a + x for a, x in zip(acc, o))

        probe = search_outputs_fn(
            jax.lax.dynamic_slice_in_dim(qpool, 0, b), *args
        )
        init = tuple(jnp.zeros((), p.dtype) for p in probe)
        return jax.lax.fori_loop(0, mm, body, init)

    one = jnp.asarray(1, jnp.int32)
    many = jnp.asarray(m + 1, jnp.int32)
    jax.device_get(f(one, qpool, *args))
    jax.device_get(f(many, qpool, *args))
    samples = []
    r = None
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.device_get(f(one, qpool, *args))
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        r = jax.device_get(f(many, qpool, *args))
        tm = time.perf_counter() - t0
        samples.append((tm - t1) / m)
    est = _median(samples)
    if return_samples:
        return est, r, samples
    return est, r


def _median(xs):
    s = sorted(xs)
    n = len(s)
    return s[n // 2] if n % 2 else 0.5 * (s[n // 2 - 1] + s[n // 2])


def time_host(fn, repeats: int = 3):
    """Best-of-N wall-clock for host-side paths (e.g. index.batch_search
    including result assembly). fn must consume its own outputs."""
    fn()  # warm (compiles)
    best = None
    for _ in range(repeats):
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        if best is None or dt < best:
            best = dt
    return best
