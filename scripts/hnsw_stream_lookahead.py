#!/usr/bin/env python
"""Sweep batch_search_stream lookahead on the bench HNSW graph: the
measured stream (26 ms/batch at lookahead=3) sits well above the 8.7 ms
device stage — if per-batch dispatch/D2H relay RTT is what serializes,
deeper lookahead should close toward max(device, assembly)."""
import sys
import time

sys.path.insert(0, "/root/repo")
import dataclasses
import os

import numpy as np

from vectorindex_tpu.bench.cache import cache_dir
from vectorindex_tpu.bench.synth import lowdim_corpus, lowdim_queries
from vectorindex_tpu.models.hnsw import HNSWIndex

n, d, b, k = 100_000, 128, 256, 10
x, W = lowdim_corpus(n, d, dz=16, seed=41)
cpath = os.path.join(cache_dir(), "hnsw_n100000_d128_m16_v2.vidx")
idx = HNSWIndex.load_container(cpath)
idx.config = dataclasses.replace(idx.config, ef_search=64)
nb = 12
qs = lowdim_queries(W, nb * b, seed=13)
batches = [qs[i * b : (i + 1) * b] for i in range(nb)]
for la in (1, 3, 6, 10):
    # warm
    rows = 0
    for out in idx.batch_search_stream(batches[:4], k, lookahead=la):
        rows += len(out)
    t0 = time.perf_counter()
    rows = 0
    for out in idx.batch_search_stream(batches, k, lookahead=la):
        rows += len(out)
    dt = time.perf_counter() - t0
    assert rows == nb * b
    print(f"lookahead={la}: {dt/nb*1e3:.2f} ms/batch  "
          f"{nb*b/dt:.1f} qps", flush=True)
print("DONE", flush=True)
