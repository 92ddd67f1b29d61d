"""Debug-mode checks — the rebuild's race-detection/sanitizer analog.

Parity target (SURVEY.md §5.2): the reference gets data-race safety from
Swift 6 StrictConcurrency at compile time plus debug-only assertions
(alignment checks PQLUT.swift:26-33, internal-ID drift IVFIndex.swift:168).
On the JAX side the functional model gives device-race-freedom for free;
what remains useful is *numeric* sanitization (NaN/Inf escaping a kernel)
and invariant checks on host control-plane state. This module provides:

  - enable()/disable(): flips jax debug_nans/debug_infs (the checkify-style
    trap for non-finite values escaping any jitted op);
  - check_finite(name, arr): host-side guard for debug builds;
  - check_index_invariants(index): control-plane invariant sweep (id map ↔
    slots ↔ store consistency — the internal-ID drift check).
"""

from __future__ import annotations

import jax
import numpy as np

from vectorindex_tpu.utils.errors import ErrorBuilder, IndexErrorKind

_enabled = False


def enable() -> None:
    """Trap NaN/Inf produced by any jitted computation (expensive — debug
    builds only, like the reference's DEBUG-gated assertions)."""
    global _enabled
    jax.config.update("jax_debug_nans", True)
    jax.config.update("jax_debug_infs", True)
    _enabled = True


def disable() -> None:
    global _enabled
    jax.config.update("jax_debug_nans", False)
    jax.config.update("jax_debug_infs", False)
    _enabled = False


def is_enabled() -> bool:
    return _enabled


def check_finite(name: str, arr) -> None:
    if not _enabled:
        return
    a = np.asarray(arr)
    if not np.all(np.isfinite(a)):
        raise (
            ErrorBuilder(IndexErrorKind.INTERNAL_INVARIANT)
            .message(f"non-finite values in {name}")
            .detail("nan", int(np.isnan(a).sum()))
            .detail("inf", int(np.isinf(a).sum()))
            .build()
        )


def check_index_invariants(index) -> None:
    """Control-plane invariant sweep (reference internal-ID drift check,
    IVFIndex.swift:168-171). Raises INTERNAL_INVARIANT on violation."""
    problems: list[str] = []
    idmap = getattr(index, "_idmap", None)
    if idmap is None:
        return
    # every external id maps to a live slot and back
    for ext, slot in idmap.items():
        if idmap.external_for(slot) != ext:
            problems.append(f"idmap asymmetry at {ext!r}->{slot}")
    # family-specific checks
    slot_list = getattr(index, "_slot_list", None)
    if slot_list is not None and getattr(index, "trained", False):
        assigned = set(slot_list.keys())
        mapped = {slot for _, slot in idmap.items()}
        drift = mapped - assigned
        if drift:
            problems.append(f"{len(drift)} mapped slots missing list assignment")
    valid = getattr(index, "_valid", None)
    if valid is not None:
        for ext, slot in idmap.items():
            if not valid[slot]:
                problems.append(f"live id {ext!r} points at tombstoned slot {slot}")
                break
    if problems:
        raise (
            ErrorBuilder(IndexErrorKind.INTERNAL_INVARIANT)
            .message("; ".join(problems[:5]))
            .detail("count", len(problems))
            .build()
        )
