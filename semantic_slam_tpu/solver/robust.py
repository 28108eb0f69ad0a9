"""Robust kernels for landmark observation edges.

The reference ATTACHES an uninitialized ``g2o::RobustKernelDCS*`` to every
SE3-point edge (``graph_slam.cpp:155-161`` — undefined behavior, quirk 1 in
docs/PARITY.md). SURVEY.md directs the rebuild to implement a real
DCS/Huber kernel instead; this module does, as information reweighting
inside the (vmapped) linearization:

  * Huber:  w = min(1, delta / sqrt(chi2))        (linear tail)
  * DCS:    w = min(1, (2*phi / (phi + chi2))^2)  (Dynamic Covariance
            Scaling, Agarwal et al. 2013 — what RobustKernelDCS computes)

with chi2 = r^T Omega r per edge. Reweighting multiplies the edge
information used for BOTH the gradient and the Hessian blocks (the standard
IRLS/Triggs approximation g2o uses too).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

ROBUST_NONE = "none"
ROBUST_HUBER = "huber"
ROBUST_DCS = "dcs"


def robust_weight(chi2: jax.Array, kind: str, delta: float) -> jax.Array:
    """Per-edge information scale factor in [0, 1]. chi2: [E]."""
    if kind == ROBUST_NONE:
        return jnp.ones_like(chi2)
    if kind == ROBUST_HUBER:
        e = jnp.sqrt(jnp.maximum(chi2, 1e-30))
        return jnp.minimum(1.0, delta / e)
    if kind == ROBUST_DCS:
        phi = delta * delta
        s = 2.0 * phi / (phi + jnp.maximum(chi2, 0.0))
        return jnp.minimum(1.0, s * s)
    raise ValueError(f"unknown robust kernel {kind!r}")


def robust_rho(chi2: jax.Array, kind: str, delta: float) -> jax.Array:
    """Robustified per-edge objective (monotone in chi2, for the LM
    accept/reject test). Huber is exact; DCS uses the monotone saturating
    Geman-McClure form 2*phi*chi2/(phi+chi2) (the IRLS weight above follows
    g2o's RobustKernelDCS; the rho/weight pair is consistent to first
    order — documented approximation)."""
    if kind == ROBUST_NONE:
        return chi2
    if kind == ROBUST_HUBER:
        d2 = delta * delta
        e = jnp.sqrt(jnp.maximum(chi2, 1e-30))
        return jnp.where(chi2 <= d2, chi2, 2.0 * delta * e - d2)
    if kind == ROBUST_DCS:
        phi = delta * delta
        return 2.0 * phi * chi2 / (phi + jnp.maximum(chi2, 1e-30))
    raise ValueError(f"unknown robust kernel {kind!r}")
