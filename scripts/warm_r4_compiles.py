"""Warm the round-4 driver run: pre-compile new XLA programs + re-measure.

Run once on the real TPU after the cache rebuild. Two jobs:
1. bench_ivf() with driver-default args — compiles the NEW widened
   filtered-point program (nprobe=96) so the driver's warm run hits the
   server compile cache instead of paying ~120 s.
2. bench_hostpq() warm — first real-TPU measurement of the native fused
   host rerank + async-D2H pipelined stream (hostops.cpp landed after the
   rebuild's hostpq leg ran).

Appends the emitted lines to docs/BENCH_R4_FINAL.jsonl via stdout capture
by the caller (script just prints them like bench.py does).
"""

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    if which in ("both", "hostpq"):
        out = bench.bench_hostpq()
        bench.emit(out)
    if which in ("both", "ivf"):
        out = bench.bench_ivf(40)
        bench.emit(out)


if __name__ == "__main__":
    main()
