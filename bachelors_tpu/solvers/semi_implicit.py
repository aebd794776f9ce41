"""Semi-implicit stepper: gamma-blended implicit scheme with matrix-free CG.

Mirrors `simulation.cu:732-926`, reformulated in DELTA form (see
``models.allen_cahn.semi_implicit_prepare``):
  1. prepare: fused stencil computing the per-cell anisotropy factor map and
     the warm-start residual r0_F = b_F - A_F @ Phi analytically
     (`simulation.cu:798-871`);
  2. CG-solve A_F e_F = r0_F from a zero guess; next_F = Phi + e_F --
     algebraically identical to the reference's warm-started solve
     (`simulation.cu:881-890`) but with all CG iterates at the O(dt) delta
     scale, so the float32 fast path genuinely converges below the
     reference's 5e-9 tolerance instead of flooring at ~1e-7 and burning
     the full iteration caps;
  3. the heat residual is likewise exact in the deltas:
     r0_U = b_U - A_U @ T = (U_base - T) + L*e_F + dt*(1-gamma)*U_base
            + dt*lap(T)
     (`simulation.cu:893-899`; note the reference's last b_U term scales T
     itself, not lap(T) -- replicated verbatim; gamma == 1 in every shipped
     config so the term vanishes there.  L*(next_F - F) is passed as L*e_F,
     never recomputed by subtraction);
  4. CG-solve A_U e_U = r0_U; next_U = T + e_U (`simulation.cu:901-908`).

The anisotropic phase system gets Jacobi (diagonal) preconditioning when
its diagonal 1 + (2dt/dx^2 + 2dt/dy^2)*s actually varies per cell (S != 0
or corrector-guess mode); at the isotropic benchmark settings the diagonal
is constant and plain CG (with the fused pallas kernels) is used -- a
constant Jacobi scale would change nothing.
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from ..core.params import SimParams
from ..models.allen_cahn import semi_implicit_prepare
from ..ops.stencil import (AnisotropyMatrix, CrossMatrix, anisotropy_matvec,
                           cross_matvec)
from ..parallel.topology import Topology
from .cg import CGResult, cg_solve, cg_solve_fused

# CG iteration variant gate (single-chip pallas path, no preconditioner):
#   "pAp"   -- fused matvec+<p,Ap> (dead-buffer-aliased output), fused
#              in-place x/r update, fused in-place axpby for p = r + beta p
#   "fused" -- the direction update folded INTO the matvec
#              (ops.pallas_cg.*_advance_p_matvec), 2 kernels/iter
# Measured single-process A/B on the tunnel TPU (round 3, RESULTS.md):
# "fused" LOSES at every size -- 2048^2 0.52 vs 1.82, 4096^2 11.6 vs 12.5,
# 8192^2 54.9 vs 62.7 ms/step -- the blended kernel's duplicated r/p halo
# reads and bigger loop carry outweigh the saved pass even HBM-bound, so
# the re-evaluation the round-2 verdict asked for keeps "pAp" everywhere.
# (The verdict's 30% hypothesis assumed the axpy pass was pure overhead;
# in practice the >=4096^2 step is pinned at the same HBM floor either
# way -- removing passes measured 0% there, see the A/B table.)
SI_FUSED_CG_MIN_CELLS = None  # no size engages the 2-pass variant
_FORCE_CG_VARIANT = None  # bench/test hook: None | "pAp" | "fused"

# df64 semi-implicit: one round of pair-precision iterative refinement per
# system (see _semi_implicit_step_dd).  Guarantees the TRUE residual meets
# the 5e-9 contract even during transients where the f32-only solve floors
# at ulp_f32(|r0|); costs one residual kernel + a short second CG per
# system (measured +60% step cost at 2048^2, still 1.3x the A100 --
# RESULTS.md).  Turning it off keeps the recursive-residual contract only.
SI_DD_REFINE = True


def _cg_variant(n_cells: int) -> str:
    if _FORCE_CG_VARIANT is not None:
        return _FORCE_CG_VARIANT
    if SI_FUSED_CG_MIN_CELLS is not None and n_cells >= SI_FUSED_CG_MIN_CELLS:
        return "fused"
    return "pAp"


def _lap_from_padded(vp, p: SimParams):
    return ((vp[1:-1, 2:] - 2 * vp[1:-1, 1:-1] + vp[1:-1, :-2]) / (p.dx * p.dx)
            + (vp[2:, 1:-1] - 2 * vp[1:-1, 1:-1] + vp[:-2, 1:-1]) / (p.dy * p.dy))


def _wants_jacobi(p: SimParams) -> bool:
    """Jacobi preconditioning pays only when the A_F diagonal actually
    varies appreciably.

    The diagonal is 1 + Cm1*s with s in [gamma(1-|S|)/alpha,
    gamma(1+|S|)/alpha] (anisotropy) and additionally divided by
    corr = 1 + k2*dt*L in corrector-guess mode (which can halve s near the
    interface, a genuinely large spread).  For pure anisotropy the spread
    is ~2|S|*Cm1*gamma/alpha -- a few percent at benchmark settings, where
    measured: Jacobi saved ZERO iterations while its unfused matvec path
    cost 23% more wall time than plain CG with the fused aniso kernel
    (0.95 vs 0.73 ms/step at 2048^2, S=0.25).  So: precondition for
    corrector-guess, and for anisotropy only past a 10% spread."""
    if p.differentiable:
        return False
    if p.do_corrector_guess:
        return True
    if p.S == 0.0:
        return False
    Cm1 = 2 * p.dt / (p.dx * p.dx) + 2 * p.dt / (p.dy * p.dy)
    smid = p.gamma / p.alpha
    spread = 2 * abs(p.S) * Cm1 * smid / (1 + Cm1 * smid * (1 - abs(p.S)))
    return spread > 0.10


def semi_implicit_step_based(F, U, U_base, p: SimParams, topo: Topology):
    """One semi-implicit step.  Returns (next_F, next_U, res_F, res_U)."""
    if F.dtype == jnp.float64:
        from ..ops.pallas_dd import wants_dd_si

        if wants_dd_si(p, topo, F.shape[0], F.shape[1]):
            # df64 path: pair-precision prepare, f32 delta CG (the deltas
            # are O(dt)-scale; same scaled 5e-9 tolerance contract as the
            # reference's f64 CG), pair-precision add-back -- vs XLA's
            # per-op f64 emulation this is a ~10x step-cost cut
            return _semi_implicit_step_dd(F, U, U_base, p, topo)
    # Fused CG kernels (matvec + <p,Ap> in one read) on the pallas backend.
    # The deeper cg_solve_fused 2-pass variant measured SLOWER at every
    # size (see the gate comment above) and stays off; the wiring remains
    # behind SI_FUSED_CG_MIN_CELLS/_FORCE_CG_VARIANT so future hardware
    # can re-run the A/B (tests cover both variants in interpret mode).
    from ..ops.rhs import _resolve_backend
    from ..ops.pallas_cg import (aniso_advance_p_matvec, aniso_matvec_pAp,
                                 aniso_matvec_pAp_sharded,
                                 cross_advance_p_matvec, cross_matvec_pAp,
                                 cross_matvec_pAp_sharded)
    from ..ops.pallas_rhs import (si_prepare_pallas, si_prepare_pallas_sharded,
                                  si_s_varies)

    backend = _resolve_backend(p, topo, 3, ny_local=F.shape[0],
                           nx_local=F.shape[1], for_cg=True)
    if p.differentiable:
        backend = "xla"  # adjoint solves need the differentiable path

    # Prepare stage: one fused pass emitting r0_F, dt*lap(U) and (only when
    # it varies per cell) s.
    prep_backend = "xla" if p.differentiable else _resolve_backend(
        p, topo, 1, ny_local=F.shape[0], nx_local=F.shape[1])
    s_const = not si_s_varies(p)
    if prep_backend == "pallas":
        prep = si_prepare_pallas(F, U, p)
    elif prep_backend == "pallas_sharded":
        prep = si_prepare_pallas_sharded(F, U, p, topo.axis_y,
                                         axis_x=topo.axis_x)
    else:
        Fp = topo.pad(F, p.Phi_boundary)
        Up = topo.pad(U, p.T_boundary)
        r0_F, s_map = semi_implicit_prepare(Fp, Up, p)
        uterm = p.dt * _lap_from_padded(Up, p)
        prep = (r0_F, uterm) if s_const else (r0_F, uterm, s_map)
    if s_const:
        r0_F, uterm = prep
        # g == 1 everywhere (S == 0, no corrector guess): s is the scalar
        # gamma/alpha; the XLA prepare's map holds exactly this value, so
        # the broadcasted matvec below is bit-identical to the map form
        s = p.gamma / p.alpha
    else:
        r0_F, uterm, s = prep

    A_F = AnisotropyMatrix.implicit_phase(p)
    jacobi = _wants_jacobi(p)
    adv_F = None
    if jacobi or backend == "xla":
        mv_F = None
    elif s_const:
        # fold the constant s into the stencil coefficients: the matvec
        # reads one map less per CG iteration (~25% of its HBM traffic)
        A_Fc = CrossMatrix(C=1 + A_F.Cm1 * s, X=A_F.X * s, Y=A_F.Y * s,
                           boundary=p.Phi_boundary)
        if backend == "pallas":
            mv_F = lambda v, out=None: cross_matvec_pAp(A_Fc, v, out=out)
            adv_F = lambda r_, p_, b_, out=None: cross_advance_p_matvec(
                A_Fc, r_, p_, b_, out=out)
        else:  # pallas_sharded
            mv_F = lambda v, out=None: cross_matvec_pAp_sharded(
                A_Fc, v, topo.axis_y, axis_x=topo.axis_x, out=out)
    elif backend == "pallas":
        mv_F = lambda v, out=None: aniso_matvec_pAp(A_F, s, v, out=out)
        adv_F = lambda r_, p_, b_, out=None: aniso_advance_p_matvec(
            A_F, s, r_, p_, b_, out=out)
    else:  # pallas_sharded
        mv_F = lambda v, out=None: aniso_matvec_pAp_sharded(
            A_F, s, v, topo.axis_y, axis_x=topo.axis_x, out=out)
    solver_fn = cg_solve
    if p.differentiable:
        from .cg import cg_solve_diff as solver_fn
    use_fused = adv_F is not None and _cg_variant(F.size) == "fused"
    extra = {}
    if not p.differentiable:
        extra["matvec_pAp"] = mv_F
        if jacobi:
            extra["diag"] = 1 + A_F.Cm1 * s
    if use_fused:
        e_F, res_F = cg_solve_fused(
            lambda v: anisotropy_matvec(A_F, s, v, topo), mv_F, adv_F,
            r0_F, tolerance=p.Phi_tolerance,
            max_iters=p.Phi_max_iters, epsilon=1.0e-12, topo=topo)
    else:
        e_F, res_F = solver_fn(
            lambda v: anisotropy_matvec(A_F, s, v, topo),
            r0_F, tolerance=p.Phi_tolerance,
            max_iters=p.Phi_max_iters, epsilon=1.0e-12, topo=topo, **extra)
    next_F = F + e_F

    # heat residual in deltas; U_base - U is exactly zero (same array) on
    # the non-corrector path and XLA folds it away
    r0_U = ((U_base - U) + p.L * e_F + p.dt * (1 - p.gamma) * U_base
            + uterm)

    A_U = CrossMatrix.implicit_heat(p)
    if backend == "pallas":
        mv_U = lambda v, out=None: cross_matvec_pAp(A_U, v, out=out)
    elif backend == "pallas_sharded":
        mv_U = lambda v, out=None: cross_matvec_pAp_sharded(
            A_U, v, topo.axis_y, axis_x=topo.axis_x, out=out)
    else:
        mv_U = None
    if backend == "pallas" and not p.differentiable and _cg_variant(U.size) == "fused":
        e_U, res_U = cg_solve_fused(
            lambda v: cross_matvec(A_U, v, topo), mv_U,
            lambda r_, p_, b_, out=None: cross_advance_p_matvec(
                A_U, r_, p_, b_, out=out),
            r0_U, tolerance=p.T_tolerance,
            max_iters=p.T_max_iters, epsilon=1.0e-12, topo=topo)
    else:
        e_U, res_U = solver_fn(
            lambda v: cross_matvec(A_U, v, topo),
            r0_U, tolerance=p.T_tolerance,
            max_iters=p.T_max_iters, epsilon=1.0e-12, topo=topo,
            **({} if p.differentiable else {"matvec_pAp": mv_U}))
    next_U = U + e_U
    return next_F, next_U, res_F, res_U


def _semi_implicit_step_dd(F, U, U_base, p: SimParams, topo: Topology):
    """df64 semi-implicit step for float64 configs
    (`ops.pallas_dd.wants_dd_si`).

    Precision argument: the state is carried at pair precision (~2^-48).
    The prepare computes the delta-form residuals r0_F = dt*dt_F and
    uterm = dt*lap(U) IN pair arithmetic and rounds only the O(dt)-scale
    results to f32 (~2^-24 relative to the delta = ~1e-12 absolute at the
    benchmark scales, orders below the 5e-9 scaled CG tolerance).  CG
    then runs the same f32 fused kernels as the f32 path -- the
    convergence contract (RMS residual < 5e-9, the reference's
    `simulation.cu:608` semantics) is checked ON the f32 iterates, which
    the delta form keeps meaningful at this scale -- and the correction
    is added back in pair arithmetic (TwoSum only, FMA-safe at XLA level).

    Corrector loop / gamma != 1 (`simulation.cu:893-899,928-1008`): the
    extra heat-rhs terms (U_base - U) + dt*(1-gamma)*U_base are both
    O(delta)-scale and assembled exactly in XLA f64 (one elementwise
    expression per step -- negligible next to the CG solves even under
    f64 emulation), then split to an f32 pair for the f32 CG rhs and the
    pair-precision refinement residual.

    Sharded meshes -- y, x and 2D (`wants_dd_sharded`): the prepare rides
    the ghost-slab/ghost-column pair exchange, the CG matvecs their
    ghost-row/column sharded twins (local <p,Ap>, psummed by cg_solve),
    and the refinement residuals exchange ghost rows/columns of e -- same
    collective count per solve as the f32 sharded path.
    """
    from ..ops import df64 as dd
    from ..ops.pallas_cg import (aniso_matvec_pAp, aniso_matvec_pAp_sharded,
                                 cross_matvec_pAp, cross_matvec_pAp_sharded)
    from ..ops.pallas_dd import (FORCE_INTERPRET, aniso_residual_dd,
                                 aniso_residual_dd_sharded,
                                 cross_residual_dd,
                                 cross_residual_dd_sharded, heat_residual_dd,
                                 heat_residual_dd_sharded, pair_add_f32,
                                 pair_to_state, si_prepare_dd_pair,
                                 si_prepare_dd_pair_sharded, state_to_pair)

    axis_y = topo.axis_y if topo.is_sharded else None
    axis_x = topo.axis_x if topo.is_sharded else None
    sharded = axis_y is not None or axis_x is not None
    pair = state_to_pair(F, U)
    prep = (si_prepare_dd_pair_sharded(pair, p, axis_y, axis_x=axis_x)
            if sharded else si_prepare_dd_pair(pair, p))
    s_map = prep[2] if len(prep) > 2 else None
    r0F_pair, ut_pair = prep[0], prep[1]

    # corrector / gamma extra heat-rhs terms (zero and folded away on the
    # plain path: U_base IS U there and gamma == 1)
    extra64 = None
    if U_base is not U:
        extra64 = U_base - U
    if p.gamma != 1.0:
        g_term = p.dt * (1.0 - p.gamma) * U_base
        extra64 = g_term if extra64 is None else extra64 + g_term
    extra_pair = dd.from_f64(extra64) if extra64 is not None else None
    extra32 = (extra_pair[0] + extra_pair[1]) if extra_pair is not None else 0.0

    A_F = AnisotropyMatrix.implicit_phase(p)
    A_U = CrossMatrix.implicit_heat(p)
    # the f32 fused CG kernels serve the f64 path unchanged (they only see
    # f32 delta arrays); CPU interpret tests take the XLA matvec instead
    use_pallas_cg = not FORCE_INTERPRET
    if s_map is None:
        s = p.gamma / p.alpha  # constant: isotropic, no corrector guess
        A_Fc = CrossMatrix(C=1 + A_F.Cm1 * s, X=A_F.X * s, Y=A_F.Y * s,
                           boundary=p.Phi_boundary)
        if not use_pallas_cg:
            mv_F = None
        elif sharded:
            mv_F = lambda v, out=None: cross_matvec_pAp_sharded(
                A_Fc, v, axis_y, axis_x=axis_x, out=out)
        else:
            mv_F = lambda v, out=None: cross_matvec_pAp(A_Fc, v, out=out)
        refine_F = (
            (lambda e1: cross_residual_dd_sharded(r0F_pair, e1, A_Fc, axis_y,
                                                  axis_x=axis_x))
            if sharded
            else (lambda e1: cross_residual_dd(r0F_pair, e1, A_Fc)))
    else:
        # variable s (anisotropy / corrector-guess): the prepare's f32
        # map parameterizes both the CG matvec and the refinement
        # residual, so the solved system is self-consistent.  Plain CG
        # (no Jacobi): measured on the f32 path, preconditioning costs
        # more than it saves with the fused aniso matvec (_wants_jacobi).
        s = s_map
        if not use_pallas_cg:
            mv_F = None
        elif sharded:
            mv_F = lambda v, out=None: aniso_matvec_pAp_sharded(
                A_F, s_map, v, axis_y, axis_x=axis_x, out=out)
        else:
            mv_F = lambda v, out=None: aniso_matvec_pAp(A_F, s_map, v,
                                                        out=out)
        refine_F = (
            (lambda e1: aniso_residual_dd_sharded(r0F_pair, e1, A_F, s_map,
                                                  axis_y, axis_x=axis_x))
            if sharded
            else (lambda e1: aniso_residual_dd(r0F_pair, e1, A_F, s_map)))
    if not use_pallas_cg:
        mv_U = None
    elif sharded:
        mv_U = lambda v, out=None: cross_matvec_pAp_sharded(
            A_U, v, axis_y, axis_x=axis_x, out=out)
    else:
        mv_U = lambda v, out=None: cross_matvec_pAp(A_U, v, out=out)
    mvx_F = lambda v: anisotropy_matvec(A_F, s, v, topo)
    mvx_U = lambda v: cross_matvec(A_U, v, topo)

    def solve(mvx, mv, b, tol, iters):
        return cg_solve(mvx, b, tolerance=tol, max_iters=iters,
                        epsilon=1.0e-12, topo=topo, matvec_pAp=mv)

    # Mixed-precision iterative refinement (one round): solve on the f32
    # hi residual, re-evaluate the TRUE residual of the correction in
    # pair precision (cross_residual_dd), solve the tiny leftover system.
    # The f32 CG alone floors the true residual at ~ulp_f32(|r0|) --
    # above the 5e-9 contract during transients where |r0| is O(0.1);
    # after refinement the floor is ~ulp_f32(|r1|) ~ 6e-8 * 6e-8 * |r0|,
    # orders below tolerance at any state (measured in RESULTS.md).
    e1_F, res_F = solve(mvx_F, mv_F, r0F_pair[0],
                        p.Phi_tolerance, p.Phi_max_iters)
    if not SI_DD_REFINE:
        e_F = e1_F
        e_U, res_U = solve(mvx_U, mv_U,
                           p.L * e_F + (ut_pair[0] + ut_pair[1]) + extra32,
                           p.T_tolerance, p.T_max_iters)
        next_F, next_U = pair_to_state(pair_add_f32(pair, e_F, e_U))
        return next_F, next_U, res_F, res_U

    r1_F = refine_F(e1_F)
    e2_F, res_F2 = solve(mvx_F, mv_F, r1_F,
                         p.Phi_tolerance, p.Phi_max_iters)

    e1_U, res_U = solve(mvx_U, mv_U,
                        p.L * (e1_F + e2_F) + (ut_pair[0] + ut_pair[1])
                        + extra32,
                        p.T_tolerance, p.T_max_iters)
    if sharded:
        r1_U = heat_residual_dd_sharded(ut_pair, (e1_F, e2_F), e1_U, A_U,
                                        p.L, axis_y, extra_pair=extra_pair,
                                        axis_x=axis_x)
    else:
        r1_U = heat_residual_dd(ut_pair, (e1_F, e2_F), e1_U, A_U, p.L,
                                extra_pair=extra_pair)
    e2_U, res_U2 = solve(mvx_U, mv_U, r1_U, p.T_tolerance, p.T_max_iters)

    # add back x + e1 + e2 in pair precision (e2 would vanish inside a
    # single f32 e1+e2 sum)
    next_F, next_U = pair_to_state(
        pair_add_f32(pair_add_f32(pair, e1_F, e1_U), e2_F, e2_U))
    res_F = CGResult(error=res_F2.error, iters=res_F.iters + res_F2.iters,
                     converged=jnp.logical_and(res_F.converged,
                                               res_F2.converged))
    res_U = CGResult(error=res_U2.error, iters=res_U.iters + res_U2.iters,
                     converged=jnp.logical_and(res_U.converged,
                                               res_U2.converged))
    return next_F, next_U, res_F, res_U


def back_substitution_error(next_F, next_U, F, U, U_base, p: SimParams,
                            topo: Topology):
    """Debug check: Lmax of A*x - b for both systems (`simulation.cu:910-923`),
    evaluated in the same delta form the solver uses:
    A@(x - x0) - r0 == A@x - b exactly."""
    Fp = topo.pad(F, p.Phi_boundary)
    Up = topo.pad(U, p.T_boundary)
    r0_F, s = semi_implicit_prepare(Fp, Up, p)
    e_F = next_F - F
    r0_U = ((U_base - U) + p.L * e_F + p.dt * (1 - p.gamma) * U_base
            + p.dt * _lap_from_padded(Up, p))
    A_F = AnisotropyMatrix.implicit_phase(p)
    A_U = CrossMatrix.implicit_heat(p)
    err_F = topo.max(jnp.abs(anisotropy_matvec(A_F, s, e_F, topo) - r0_F))
    err_U = topo.max(jnp.abs(cross_matvec(A_U, next_U - U, topo) - r0_U))
    return err_F, err_U
