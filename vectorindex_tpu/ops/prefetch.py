"""Prefetch hints — API-stability no-ops.

Parity target (reference kernel #49): Operations/Support/Prefetch.swift —
vi_prefetch_read/write (:24-63) are advisory no-ops in portable Swift, kept
so call sites stay stable (PQLUT.swift:36-42 calls them unconditionally).

TPU equivalent: explicit prefetch is the compiler/DMA pipeline's job —
Pallas double-buffering and XLA's automatic prefetching replace per-address
hints. These functions exist so option structs carrying `prefetch_distance`
knobs (reference recurring knob, SURVEY.md §5.6) keep a defined target, and
as the documented place where a future Pallas prefetch pragma would land.
"""

from __future__ import annotations


def prefetch_read(_array, _index: int = 0, _distance: int = 0) -> None:
    """Advisory read prefetch — no-op (reference vi_prefetch_read)."""


def prefetch_write(_array, _index: int = 0, _distance: int = 0) -> None:
    """Advisory write prefetch — no-op (reference vi_prefetch_write)."""
