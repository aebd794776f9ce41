"""Semi-implicit stepper: gamma-blended implicit scheme with matrix-free CG.

Mirrors `simulation.cu:732-926`:
  1. prepare: fused stencil computing the per-cell anisotropy factor map and
     the phase RHS b_F (`simulation.cu:798-871`);
  2. CG-solve the implicit phase system A_F * next_F = b_F, warm-started
     from F (`simulation.cu:881-890`);
  3. build b_U = U_base + L*(next_F - F) + dt*(1-gamma)*U_base
     (`simulation.cu:893-899`; note the reference's last term scales T
     itself, not lap(T) -- replicated verbatim; gamma == 1 in every shipped
     config so the term vanishes there);
  4. CG-solve the constant-coefficient implicit heat system
     A_U * next_U = b_U, warm-started from U (`simulation.cu:901-908`).
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from ..core.params import SimParams
from ..models.allen_cahn import semi_implicit_prepare
from ..ops.stencil import (AnisotropyMatrix, CrossMatrix, anisotropy_matvec,
                           cross_matvec)
from ..parallel.topology import Topology
from .cg import CGResult, cg_solve


def semi_implicit_step_based(F, U, U_base, p: SimParams, topo: Topology):
    """One semi-implicit step.  Returns (next_F, next_U, res_F, res_U)."""
    Fp = topo.pad(F, p.Phi_boundary)
    Up = topo.pad(U, p.T_boundary)
    b_F, s = semi_implicit_prepare(Fp, Up, p)

    # Fused CG kernels (matvec + <p,Ap> in one read) on the pallas backend.
    # NOTE: the deeper cg_solve_fused variant (direction update folded into
    # the matvec) measured *slower* on the current device (2.49 vs 2.02
    # ms/step at 2048^2: the duplicated r/p halo transfers and larger loop
    # carry outweigh the saved axpy pass), so the pAp-fusion form is wired.
    from ..ops.rhs import _resolve_backend
    from ..ops.pallas_cg import (aniso_matvec_pAp, aniso_matvec_pAp_sharded,
                                 cross_matvec_pAp, cross_matvec_pAp_sharded)

    backend = _resolve_backend(p, topo, 3, ny_local=F.shape[0])
    if p.differentiable:
        backend = "xla"  # adjoint solves need the differentiable path

    A_F = AnisotropyMatrix.implicit_phase(p)
    if backend == "pallas":
        mv_F = lambda v: aniso_matvec_pAp(A_F, s, v)
    elif backend == "pallas_sharded":
        mv_F = lambda v: aniso_matvec_pAp_sharded(A_F, s, v, topo.axis_y)
    else:
        mv_F = None
    solver_fn = cg_solve
    if p.differentiable:
        from .cg import cg_solve_diff as solver_fn
    next_F, res_F = solver_fn(
        lambda v: anisotropy_matvec(A_F, s, v, topo),
        b_F, x0=F, tolerance=p.Phi_tolerance,
        max_iters=p.Phi_max_iters, epsilon=1.0e-12, topo=topo,
        **({} if p.differentiable else {"matvec_pAp": mv_F}))

    b_U = U_base + p.L * (next_F - F) + p.dt * (1 - p.gamma) * U_base

    A_U = CrossMatrix.implicit_heat(p)
    if backend == "pallas":
        mv_U = lambda v: cross_matvec_pAp(A_U, v)
    elif backend == "pallas_sharded":
        mv_U = lambda v: cross_matvec_pAp_sharded(A_U, v, topo.axis_y)
    else:
        mv_U = None
    next_U, res_U = solver_fn(
        lambda v: cross_matvec(A_U, v, topo),
        b_U, x0=U, tolerance=p.T_tolerance,
        max_iters=p.T_max_iters, epsilon=1.0e-12, topo=topo,
        **({} if p.differentiable else {"matvec_pAp": mv_U}))
    return next_F, next_U, res_F, res_U


def back_substitution_error(next_F, next_U, F, U, U_base, p: SimParams,
                            topo: Topology):
    """Debug check: Lmax of A*x - b for both systems (`simulation.cu:910-923`)."""
    Fp = topo.pad(F, p.Phi_boundary)
    Up = topo.pad(U, p.T_boundary)
    b_F, s = semi_implicit_prepare(Fp, Up, p)
    b_U = U_base + p.L * (next_F - F) + p.dt * (1 - p.gamma) * U_base
    A_F = AnisotropyMatrix.implicit_phase(p)
    A_U = CrossMatrix.implicit_heat(p)
    err_F = topo.max(jnp.abs(anisotropy_matvec(A_F, s, next_F, topo) - b_F))
    err_U = topo.max(jnp.abs(cross_matvec(A_U, next_U, topo) - b_U))
    return err_F, err_U
