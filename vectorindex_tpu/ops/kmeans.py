"""K-means: k-means++ / k-means‖ seeding, mini-batch and Lloyd training,
streaming chunk API.

Parity targets:
  - #11 k-means++ seeding   Kernels/KMeansSeeding.swift:167 (kmeansPlusPlusSeed;
    sequential D² sampling, E[φ] ≤ 8(ln k + 2)φ_OPT; k-means‖ stub :35)
  - #12 mini-batch k-means  Kernels/KMeansMiniBatchKernel.swift:424
    (kmeans_minibatch_f32: epoch loop, sparse accumulators "touched·d instead
    of kc·d" :500-509, inertia tol early-stop, EWMA online mode :472-494,
    empty-cluster repair), streaming API kmeans_state_init/update_chunk/
    finalize :771-886

TPU-native design:
  - assignment is one MXU matmul (dot-trick) + argmin — the reference's
    `_vi_km12_l2sq_aos` SIMD loop (:214) disappears into `distance_block`.
  - the sparse-accumulator trick becomes a dense one-hot matmul segment-sum:
    Cᵀ·X on the MXU is faster than any gather/scatter at these shapes
    (SURVEY.md §7 step 4).
  - the sequential D² dependency in k-means++ is kept exactly for parity
    (lax.scan over k), with k-means‖ oversampling as the scale path the
    reference only stubbed (KMeansSeeding.swift:35).
  - everything is jittable with static (k, iters); determinism is keyed by
    (seed, stream) like KMeansSeedConfig.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from vectorindex_tpu.ops import rng as vrng
from vectorindex_tpu.ops import scoring

Array = jax.Array


# ---------------------------------------------------------------------------
# assignment / inertia helpers
# ---------------------------------------------------------------------------


def assign_clusters(x: Array, centroids: Array) -> Tuple[Array, Array]:
    """Nearest centroid per row → (assignments [n], sq distances [n])."""
    d2 = scoring.l2sqr_block(x, centroids)
    assign = jnp.argmin(d2, axis=1).astype(jnp.int32)
    return assign, jnp.min(d2, axis=1)


def assign_clusters_chunked(
    x: Array, centroids: Array, chunk: int = 131072
) -> Tuple[Array, Array]:
    """assign_clusters with the [n, k] distance matrix never materialized:
    a lax.scan over row-chunks keeps the live intermediate at [chunk, k].

    At bench scale the full matrix is the build-time sink — e.g. seeding
    pools of ~10k candidates against a 1M-row corpus would materialize
    ~40 GB of f32 distances and push XLA into HBM spill; chunking keeps
    the MXU busy at a bounded footprint.
    """
    n, d = x.shape
    if n <= chunk:
        return assign_clusters(x, centroids)
    csq = scoring.squared_norms(centroids)
    pad = (-n) % chunk
    xp = jnp.concatenate([x, jnp.zeros((pad, d), x.dtype)]) if pad else x
    xc = xp.reshape(-1, chunk, d)

    def body(_, xs):
        d2 = scoring.l2sqr_block(xs, centroids, x_sqnorms=csq)
        return None, (jnp.argmin(d2, axis=1).astype(jnp.int32), jnp.min(d2, axis=1))

    _, (assign, d2min) = jax.lax.scan(body, None, xc)
    return assign.reshape(-1)[:n], d2min.reshape(-1)[:n]


def _segment_mean(x: Array, assign: Array, k: int) -> Tuple[Array, Array]:
    """Per-cluster (sums [k,d], counts [k]) via one-hot MXU matmul."""
    onehot = jax.nn.one_hot(assign, k, dtype=x.dtype)  # [n, k]
    sums = jax.lax.dot_general(
        onehot,
        x,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    counts = jnp.sum(onehot, axis=0).astype(jnp.float32)
    return sums, counts


def inertia(x: Array, centroids: Array) -> Array:
    _, d2 = assign_clusters(x, centroids)
    return jnp.sum(d2)


# ---------------------------------------------------------------------------
# seeding (#11)
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("k",))
def kmeans_pp_seed(key: Array, x: Array, k: int) -> Array:
    """Exact sequential k-means++ D² seeding (reference kmeansPlusPlusSeed,
    KMeansSeeding.swift:167). O(k·n·d); subsample x first for large n
    (reference KMeansSeedConfig.sampleSize)."""
    n, d = x.shape
    k0, key = jax.random.split(key)
    first = jax.random.randint(k0, (), 0, n)
    sqn = scoring.squared_norms(x)

    def d2_to(c):
        # ‖x‖² + ‖c‖² − 2⟨x,c⟩, clamped
        dots = x @ c
        return jnp.maximum(sqn + jnp.sum(c * c) - 2.0 * dots, 0.0)

    init_d2 = d2_to(x[first])

    def step(carry, i):
        min_d2, key = carry
        key, sub = jax.random.split(key)
        idx = vrng.weighted_pick(sub, min_d2)
        c = x[idx]
        min_d2 = jnp.minimum(min_d2, d2_to(c))
        return (min_d2, key), idx

    (_, _), rest = jax.lax.scan(step, (init_d2, key), jnp.arange(k - 1))
    idxs = jnp.concatenate([first[None], rest])
    return x[idxs]


@partial(jax.jit, static_argnames=("k", "rounds", "oversample"))
def kmeans_parallel_seed(
    key: Array, x: Array, k: int, rounds: int = 5, oversample: int = 2
) -> Array:
    """k-means‖ (Bahmani et al.): `rounds` rounds of D²-proportional
    oversampling (l = oversample·k per round), then weighted k-means++ over
    the ≈rounds·l candidate pool. The scale path for large k that the
    reference stubbed (KMeansSeeding.swift:35 `.kmeansParallel`).

    The corpus-wide D² reductions run chunked (live intermediate bounded at
    ~256 MB) with a bf16 Gram — D² sampling weights and pool-attraction
    counts are selection-grade quantities, so the bf16 relative error is
    immaterial while the MXU runs at full rate. The final weighted k-means++
    over the small pool stays f32."""
    n, d = x.shape
    l = oversample * k
    k0, key = jax.random.split(key)
    first = jax.random.randint(k0, (), 0, n)
    xh = x.astype(jnp.bfloat16)
    sqn = scoring.squared_norms(x)

    def _chunked(cands, reduce_fn, init):
        """scan row-chunks of x against cands; reduce_fn(d2, slot) per chunk."""
        csq = scoring.squared_norms(cands)
        p = cands.shape[0]
        chunk = min(n, max(1024, (256 << 20) // max(p * 4, 1)))
        pad = (-n) % chunk
        if pad:
            xp = jnp.concatenate([xh, jnp.zeros((pad, d), xh.dtype)])
            sp = jnp.concatenate([sqn, jnp.zeros((pad,))])
        else:
            xp, sp = xh, sqn
        xc = xp.reshape(-1, chunk, d)
        sc = sp.reshape(-1, chunk)
        ch = cands.astype(jnp.bfloat16)

        def body(_, inp):
            xs, ss = inp
            d2 = scoring.l2sqr_block(xs, ch, x_sqnorms=csq, q_sqnorms=ss)
            return None, reduce_fn(d2)

        _, out = jax.lax.scan(body, None, (xc, sc))
        return out.reshape(-1)[:n]

    def min_d2_to(cands, min_d2):
        cmin = _chunked(cands, lambda d2: jnp.min(d2, axis=1), None)
        return jnp.minimum(min_d2, cmin)

    min_d2 = min_d2_to(x[first][None, :], jnp.full((n,), jnp.inf))

    def round_step(carry, _):
        min_d2, key = carry
        key, sub = jax.random.split(key)
        idxs = vrng.weighted_pick(sub, min_d2, (l,))
        cands = x[idxs]
        min_d2 = min_d2_to(cands, min_d2)
        return (min_d2, key), idxs

    (_, key), cand_idxs = jax.lax.scan(
        round_step, (min_d2, key), jnp.arange(rounds)
    )
    pool_idx = jnp.concatenate([first[None], cand_idxs.reshape(-1)])
    pool = x[pool_idx]  # [1 + rounds*l, d]
    # weights: how many points each candidate attracts
    attract = _chunked(
        pool, lambda d2: jnp.argmin(d2, axis=1).astype(jnp.int32), None
    )
    weights = jnp.zeros((pool.shape[0],)).at[attract].add(1.0)

    # weighted k-means++ over the small pool
    kf, key = jax.random.split(key)
    firstp = vrng.weighted_pick(kf, weights)
    pool_sqn = scoring.squared_norms(pool)

    def d2_to(c):
        return jnp.maximum(pool_sqn + jnp.sum(c * c) - 2.0 * (pool @ c), 0.0)

    def step(carry, _):
        min_d2, key = carry
        key, sub = jax.random.split(key)
        idx = vrng.weighted_pick(sub, min_d2 * weights)
        c = pool[idx]
        return (jnp.minimum(min_d2, d2_to(c)), key), idx

    (_, _), rest = jax.lax.scan(step, (d2_to(pool[firstp]), key), jnp.arange(k - 1))
    idxs = jnp.concatenate([firstp[None], rest])
    return pool[idxs]


# ---------------------------------------------------------------------------
# training (#12)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class KMeansConfig:
    """Reference KMeansMBConfig (KMeansMiniBatchKernel.swift:46)."""

    k: int
    iters: int = 20  # epochs (minibatch) or iterations (lloyd)
    batch_size: int = 4096  # minibatch only
    tol: float = 1e-4  # relative inertia improvement early-stop
    algo: str = "lloyd"  # "lloyd" | "minibatch"
    seed: int = 42
    stream: int = 0
    # seeding runs on a bounded sample of the corpus (reference
    # KMeansSeedConfig.sampleSize, KMeansSeeding.swift:40) — D² seeding
    # quality is statistical, so a 256k sample seeds a 10M corpus as well
    # as the full pass at a fraction of the cost
    seed_sample: int = 262144


class KMeansResult(NamedTuple):
    centroids: Array
    assignments: Array
    inertia: Array
    iterations: Array  # actual iterations run (early stop)


def _repair_empty(key: Array, centroids: Array, counts: Array, x: Array) -> Array:
    """Empty-cluster repair: reseed empties to random data points (reference
    emptyPolicy reseed, PQTrain.swift:20-43 / KMeansMB repair counters)."""
    n = x.shape[0]
    k = centroids.shape[0]
    idxs = jax.random.randint(key, (k,), 0, n)
    return jnp.where((counts > 0)[:, None], centroids, x[idxs])


@partial(jax.jit, static_argnames=("k", "iters", "tol"))
def kmeans_lloyd(
    key: Array, x: Array, init: Array, *, k: int, iters: int, tol: float = 1e-4
) -> KMeansResult:
    """Full-batch Lloyd with inertia early-stop (masked iterations keep the
    program static — XLA-friendly fixed trip count)."""

    def body(carry, i):
        cent, prev_inertia, done, key = carry
        assign, d2 = assign_clusters(x, cent)
        cur = jnp.sum(d2)
        sums, counts = _segment_mean(x, assign, k)
        new = jnp.where(counts[:, None] > 0, sums / jnp.maximum(counts, 1.0)[:, None], cent)
        key, sub = jax.random.split(key)
        new = _repair_empty(sub, new, counts, x)
        improved = (prev_inertia - cur) > tol * jnp.abs(prev_inertia)
        done_now = done | (~improved & (i > 0))
        cent = jnp.where(done_now, cent, new)
        return (cent, jnp.where(done, prev_inertia, cur), done_now, key), done_now

    (cent, final_inertia, _, _), dones = jax.lax.scan(
        body, (init, jnp.inf, False, key), jnp.arange(iters)
    )
    assign, d2 = assign_clusters_chunked(x, cent)
    return KMeansResult(cent, assign, jnp.sum(d2), jnp.sum(~dones))


@partial(jax.jit, static_argnames=("k", "iters", "batch_size"))
def kmeans_minibatch(
    key: Array, x: Array, init: Array, *, k: int, iters: int, batch_size: int
) -> KMeansResult:
    """Sculley-style mini-batch k-means: per-batch assignment + running
    per-cluster counts with 1/count learning rates (reference
    lloydMiniBatch algo, KMeansMiniBatchKernel.swift:424)."""
    n = x.shape[0]
    bs = min(batch_size, n)

    def body(carry, i):
        cent, counts, key = carry
        key, sub = jax.random.split(key)
        idx = jax.random.randint(sub, (bs,), 0, n)
        xb = x[idx]
        assign, _ = assign_clusters(xb, cent)
        sums, bcounts = _segment_mean(xb, assign, k)
        counts = counts + bcounts
        lr = jnp.where(counts > 0, 1.0 / jnp.maximum(counts, 1.0), 0.0)
        target = jnp.where(
            bcounts[:, None] > 0, sums / jnp.maximum(bcounts, 1.0)[:, None], cent
        )
        cent = cent + (lr * bcounts)[:, None] * (target - cent)
        return (cent, counts, key), None

    (cent, _, _), _ = jax.lax.scan(
        body, (init, jnp.zeros((k,)), key), jnp.arange(iters)
    )
    assign, d2 = assign_clusters_chunked(x, cent)
    return KMeansResult(cent, assign, jnp.sum(d2), jnp.asarray(iters))


def kmeans(
    x: Array,
    cfg: KMeansConfig,
    init: Optional[Array] = None,
    key: Optional[Array] = None,
) -> KMeansResult:
    """Seed (k-means++ for small k, k-means‖ for large) + train. The
    top-level convenience mirroring IVFIndex.optimize()'s seed→train flow
    (IVFIndex.swift:265-284)."""
    if key is None:
        key = vrng.make_key(cfg.seed, cfg.stream)
    kseed, ktrain = jax.random.split(key)
    if init is None:
        n = x.shape[0]
        xs = x
        if cfg.seed_sample and n > cfg.seed_sample:
            ksub, kseed = jax.random.split(kseed)
            # without-replacement sample; one permutation-free gather
            idx = jax.random.choice(ksub, n, (cfg.seed_sample,), replace=False)
            xs = x[idx]
        if cfg.k <= 256:
            init = kmeans_pp_seed(kseed, xs, cfg.k)
        else:
            init = kmeans_parallel_seed(kseed, xs, cfg.k)
    if cfg.algo == "minibatch":
        return kmeans_minibatch(
            ktrain, x, init, k=cfg.k, iters=cfg.iters, batch_size=cfg.batch_size
        )
    return kmeans_lloyd(ktrain, x, init, k=cfg.k, iters=cfg.iters, tol=cfg.tol)


# ---------------------------------------------------------------------------
# streaming API (reference kmeans_state_init/update_chunk/finalize,
# KMeansMiniBatchKernel.swift:771-886)
# ---------------------------------------------------------------------------


class KMeansStreamState(NamedTuple):
    centroids: Array
    counts: Array  # running per-cluster counts


def kmeans_stream_init(init_centroids: Array) -> KMeansStreamState:
    k = init_centroids.shape[0]
    return KMeansStreamState(init_centroids, jnp.zeros((k,)))


@jax.jit
def kmeans_stream_update(state: KMeansStreamState, chunk: Array) -> KMeansStreamState:
    """Consume one chunk (dataset larger than memory — reference
    kmeans_state_update_chunk :785). Mini-batch 1/count update rule."""
    k = state.centroids.shape[0]
    assign, _ = assign_clusters(chunk, state.centroids)
    sums, bcounts = _segment_mean(chunk, assign, k)
    counts = state.counts + bcounts
    lr = jnp.where(counts > 0, bcounts / jnp.maximum(counts, 1.0), 0.0)
    target = jnp.where(
        bcounts[:, None] > 0,
        sums / jnp.maximum(bcounts, 1.0)[:, None],
        state.centroids,
    )
    cent = state.centroids + lr[:, None] * (target - state.centroids)
    return KMeansStreamState(cent, counts)


def kmeans_stream_finalize(state: KMeansStreamState) -> Array:
    return state.centroids
