"""Benchmark harness (reference L6: Sources/VectorIndexBenchmarks +
L2SqrMicrobench). Run as `python -m vectorindex_tpu.bench --help`."""
