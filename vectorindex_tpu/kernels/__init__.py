"""Pallas TPU kernels for the hot ops (interpret-mode parity-tested on CPU,
compiled on TPU — the Swift-vs-C dual-implementation pattern of the
reference, SURVEY.md §4 tier 2)."""
