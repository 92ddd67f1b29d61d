"""Stage-level wall-time profile of HNSW batched construction.

Mirrors bench_churn's HNSW leg: load the cached 100k container, warm the
construction programs with one chunk, then time N chunks with per-stage
accounting (device stages block_until_ready so async dispatch can't hide
where time goes).
"""

import os
import sys
import time
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import vectorindex_tpu.ops.graph as gops
from vectorindex_tpu.bench.cache import cache_dir
from vectorindex_tpu.bench.synth import lowdim_corpus
from vectorindex_tpu.models import hnsw as hm

ACC = defaultdict(float)
CNT = defaultdict(int)


def _force(out):
    """True sync: under the axon tunnel block_until_ready returns before the
    work is done — fetch a dependent scalar per array leaf instead (tiny
    transfer, real completion wait)."""
    for leaf in jax.tree.leaves(out):
        if isinstance(leaf, jax.Array) and not isinstance(leaf, jax.core.Tracer):
            np.asarray(leaf.ravel()[:1])


def timed(name, fn, block=True):
    orig = fn

    def wrap(*a, **kw):
        t0 = time.perf_counter()
        out = orig(*a, **kw)
        if block:
            _force(out)
        ACC[name] += time.perf_counter() - t0
        CNT[name] += 1
        return out

    return wrap


gops.greedy_descent = timed("greedy_descent", gops.greedy_descent)
gops.beam_search = timed("beam_search", gops.beam_search)
gops.select_neighbors_diverse = timed(
    "select_diverse", gops.select_neighbors_diverse
)
gops.prune_neighbors = timed("prune_neighbors", gops.prune_neighbors)
hm.gops = gops

hm.HNSWIndex._append_reverse_edges = timed(
    "append_reverse", hm.HNSWIndex._append_reverse_edges, block=False
)
hm.HNSWIndex._insert_upper_batch = timed(
    "insert_upper", hm.HNSWIndex._insert_upper_batch, block=False
)
hm.HNSWIndex._sync_layer_device = timed(
    "sync_layer", hm.HNSWIndex._sync_layer_device
)
hm.HNSWIndex._sync_vec_device = timed("sync_vec", hm.HNSWIndex._sync_vec_device)
hm.HNSWIndex._select_neighbors = timed(
    "select_neighbors_total", hm.HNSWIndex._select_neighbors, block=False
)
hm.HNSWIndex._repair_orphans = timed(
    "repair_orphans", hm.HNSWIndex._repair_orphans, block=False
)
orig_chunk = hm.HNSWIndex._build_chunk
hm.HNSWIndex._build_chunk = timed("BUILD_CHUNK_total", orig_chunk, block=False)

n, d = 100_000, 128
cpath = os.path.join(cache_dir(), "hnsw_n100000_d128_m16_v2.vidx")
x, W = lowdim_corpus(n, d, dz=16, seed=41)
rng = np.random.default_rng(77)
z = rng.standard_normal((16384, 16)).astype(np.float32)
z[:, :2] += 2.5
xnew = z @ W + 0.05 * rng.standard_normal((16384, d)).astype(np.float32)
xnew /= np.maximum(np.linalg.norm(xnew, axis=1, keepdims=True), 1e-30)
xnew = xnew.astype(np.float32)

t0 = time.perf_counter()
idx = hm.HNSWIndex.load_container(cpath)
print(f"load: {time.perf_counter()-t0:.1f}s count={idx.count}", flush=True)

warm = idx.config.build_chunk
t0 = time.perf_counter()
idx.insert_batch([f"w{i}" for i in range(warm)], xnew[:warm] + np.float32(1e-3))
idx.statistics()
print(f"warmup ({warm} rows): {time.perf_counter()-t0:.1f}s", flush=True)

ACC.clear()
CNT.clear()
n_timed = 4096
t0 = time.perf_counter()
idx.insert_batch([str(n + i) for i in range(n_timed)], xnew[warm : warm + n_timed])
idx.statistics()
total = time.perf_counter() - t0
print(f"\ntimed: {n_timed} inserts in {total:.2f}s = {n_timed/total:.1f}/s")
print(f"{'stage':<24}{'total_s':>9}{'calls':>7}{'ms/call':>9}{'%':>6}")
for k in sorted(ACC, key=ACC.get, reverse=True):
    print(
        f"{k:<24}{ACC[k]:>9.2f}{CNT[k]:>7}{1e3*ACC[k]/max(CNT[k],1):>9.1f}"
        f"{100*ACC[k]/total:>6.1f}"
    )
