"""Boundary-condition padding.

Reproduces the semantics of the reference's per-sample ``boundary_sample``
(`simulation.cu:29-85`) as a single vectorized pad of the whole field -- the
idiomatic XLA formulation (one fused gather instead of per-thread branching):

  * PERIODIC:   wrap-around indexing            -> jnp.pad(mode="wrap")
  * NEUMANN:    clamp to the nearest interior    -> jnp.pad(mode="edge")
                cell (zero normal derivative)
  * DIRICHLET:  mirror through the boundary value: ``2*d - clamped``
                (`simulation.cu:54-72`); with d = dirichlet value (0 by
                default, or the exact manufactured solution when enabled).

Corner cells of the pad ring clamp both coordinates, exactly like CLAMP in
the reference, so a plain edge-pad followed by the mirror transform matches
sample-for-sample.
"""
from __future__ import annotations

import jax.numpy as jnp

from .params import BoundaryType


def pad2(A: jnp.ndarray, bc: BoundaryType, dirichlet_value=0.0) -> jnp.ndarray:
    """Pad a (ny, nx) field by one ghost cell on every side -> (ny+2, nx+2).

    ``dirichlet_value`` may be a scalar or an array broadcastable to the
    padded shape (used by the exact-solution Dirichlet mode, reference
    `simulation.cu:60-66`).
    """
    if bc == BoundaryType.PERIODIC:
        return jnp.pad(A, 1, mode="wrap")
    if bc == BoundaryType.NEUMANN:
        return jnp.pad(A, 1, mode="edge")
    if bc == BoundaryType.DIRICHLET:
        P = jnp.pad(A, 1, mode="edge")
        ring = jnp.ones(P.shape, dtype=bool)
        ring = ring.at[1:-1, 1:-1].set(False)
        return jnp.where(ring, 2 * jnp.asarray(dirichlet_value, A.dtype) - P, P)
    raise ValueError(f"unknown boundary type {bc}")


def pad_axis(A: jnp.ndarray, bc: BoundaryType, axis: int, dirichlet_value=0.0) -> jnp.ndarray:
    """Pad a single axis by one ghost cell on both ends."""
    widths = [(0, 0)] * A.ndim
    widths[axis] = (1, 1)
    if bc == BoundaryType.PERIODIC:
        return jnp.pad(A, widths, mode="wrap")
    if bc == BoundaryType.NEUMANN:
        return jnp.pad(A, widths, mode="edge")
    if bc == BoundaryType.DIRICHLET:
        P = jnp.pad(A, widths, mode="edge")
        d = jnp.asarray(dirichlet_value, A.dtype)
        lo = [slice(None)] * A.ndim
        hi = [slice(None)] * A.ndim
        lo[axis] = slice(0, 1)
        hi[axis] = slice(P.shape[axis] - 1, P.shape[axis])
        P = P.at[tuple(lo)].set(2 * d - P[tuple(lo)])
        P = P.at[tuple(hi)].set(2 * d - P[tuple(hi)])
        return P
    raise ValueError(f"unknown boundary type {bc}")
