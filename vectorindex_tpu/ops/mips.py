"""MIPS→L2 transform: maximum-inner-product search via L2 indices.

Parity target (reference kernel #10): Operations/Transform/MIPSTransform.swift —
  - augmentation x′ = [x; √(R²−‖x‖²)], q′ = [q; 0] (:155, :187) so that
    argmax⟨q,x⟩ == argmin‖q′−x′‖
  - modes explicit / virtual / hybrid (:19-23):
      explicit — materialize augmented vectors (padded dim)
      virtual  — keep raw vectors, convert L2 scores back analytically (:204)
      hybrid   — scoreBlock that fuses the virtual correction (:226)
  - R² parameter with staleness tracking (:31-62): if a new vector exceeds
    R², the explicit augmentation is stale and the engine must flip to
    virtual until re-materialization
  - padded dimension rounds up (reference roundUp(d+1,16); we round to the
    TPU lane width 128 — the XLA-native alignment)
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

from vectorindex_tpu.ops import scoring

Array = jax.Array

LANE = 128


def padded_dim(d: int, multiple: int = LANE) -> int:
    """Augmented dimension d+1 rounded up to the TPU lane width (reference
    paddedDimension, LayoutTransforms.swift:86 rounds to 16 for NEON)."""
    return ((d + 1 + multiple - 1) // multiple) * multiple


@dataclass
class R2Parameter:
    """Max squared norm with staleness (reference R2Parameter,
    MIPSTransform.swift:31-62)."""

    r2: float = 0.0
    stale: bool = False

    def update(self, sqnorm_max: float) -> None:
        if sqnorm_max > self.r2:
            self.r2 = float(sqnorm_max)
            self.stale = True  # existing augmentation under-estimates R²

    def materialized(self) -> None:
        self.stale = False


@partial(jax.jit, static_argnames=("out_dim",))
def mips_materialize_augmentation(x: Array, r2: float, out_dim: int) -> Array:
    """x′ = [x; √(R²−‖x‖²); 0…] (reference mipsMaterializeAugmentation,
    MIPSTransform.swift:155). out_dim ≥ d+1 (use padded_dim)."""
    n, d = x.shape
    sq = scoring.squared_norms(x)
    aug = jnp.sqrt(jnp.maximum(jnp.float32(r2) - sq, 0.0))
    out = jnp.zeros((n, out_dim), dtype=x.dtype)
    out = out.at[:, :d].set(x)
    out = out.at[:, d].set(aug.astype(x.dtype))
    return out


@partial(jax.jit, static_argnames=("out_dim",))
def mips_augment_query(q: Array, out_dim: int) -> Array:
    """q′ = [q; 0; 0…] (reference mipsAugmentQuery, MIPSTransform.swift:187)."""
    b, d = q.shape
    out = jnp.zeros((b, out_dim), dtype=q.dtype)
    return out.at[:, :d].set(q)


@jax.jit
def mips_virtual_to_l2_scores(
    ip_scores: Array, q_sqnorms: Array, r2: float
) -> Array:
    """Virtual mode: convert raw IP scores to the L2² distances the explicit
    augmentation would produce (reference mipsVirtualToL2Scores,
    MIPSTransform.swift:204): ‖q′−x′‖² = ‖q‖² + R² − 2⟨q,x⟩."""
    return jnp.maximum(
        q_sqnorms[:, None] + jnp.float32(r2) - 2.0 * ip_scores, 0.0
    )


@jax.jit
def mips_hybrid_score_block(q: Array, x: Array, r2: float) -> Array:
    """Hybrid mode: one fused block producing augmented-L2 distances from
    raw vectors (reference mipsHybridScoreBlock, MIPSTransform.swift:226) —
    the Gram matmul is the only heavy op; the R² epilogue fuses in."""
    ip = scoring.inner_product_block(q, x)
    qsq = scoring.squared_norms(q)
    return mips_virtual_to_l2_scores(ip, qsq, r2)
