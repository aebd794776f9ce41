"""Fused Pallas RHS kernel: blend + boundary conditions + stencil + physics
in a single HBM pass.

The TPU analog of the reference's one-fused-kernel-per-RK-stage design
(``explicit_solver_solve_lin_combination`` + ``cuda_tiled_for_2D``,
`simulation.cu:145-243`, `cuda_for.cuh:219-339`).  Where the reference
stages tiles through CUDA shared memory with a gather lambda implementing
the BCs, this kernel:

  * grids over row-blocks of the (ny, nx) fields; Mosaic pipelines
    HBM->VMEM block transfers automatically (the tiled-for + launch
    configurator of the reference collapse into BlockSpecs);
  * passes every field three times -- the (TILE, nx) center block plus two
    (8, nx) halo row-groups (Mosaic's minimum sublane granularity) whose
    *index maps* encode the boundary condition (wrap for periodic, clamp for
    Neumann, clamp + in-kernel mirror for Dirichlet).  Total read
    amplification is only (1 + 16/TILE);
  * blends up to 4 states in VMEM (RK stage linear combinations never touch
    HBM);
  * handles the x-direction halo with in-VMEM shifts and edge-column fixups.

Weights are runtime scalars (tau-dependent in the adaptive solver) fed
through SMEM; physics coefficients are compile-time constants folded into
the kernel (like the reference's per-launch closures).
"""
from __future__ import annotations

import functools
import math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.params import BoundaryType, SimParams

# VMEM working-set budget for choosing the row-tile height (bytes).
_VMEM_BUDGET = 10 * 1024 * 1024
# the 2-step Euler kernel runs with an explicitly raised scoped-VMEM limit
_EULER2_BUDGET = 80 * 1024 * 1024


def _tile_y(ny: int, nx: int, n_states: int, itemsize: int,
            budget: int = 0) -> int:
    """Largest row-tile (multiple of 8, divides ny) whose pipelined working
    set fits the VMEM budget."""
    budget = budget or _VMEM_BUDGET
    for ty in (512, 256, 128, 64, 32, 16, 8):
        if ny % ty != 0:
            continue
        # 2*n_states input blocks (+halo rows) + 2 output blocks, double
        # buffered by the pipeline; shifted temporaries add ~4 block copies.
        working = (2 * n_states * (ty + 2) + 2 * ty) * nx * itemsize * 2
        working += 4 * ty * nx * itemsize
        if working <= budget:
            return ty
    return 0


def supports(p: SimParams, n_states: int = 4) -> bool:
    """Whether the fused kernel handles this config (else the XLA path)."""
    if p.dtype != "float32":
        return False
    if p.nx % 128 != 0 or p.ny % 8 != 0:
        return False
    if p.ny < 16:
        return False
    if p.S != 0.0 and not (float(p.m0).is_integer() and p.m0 >= 1):
        # anisotropy needs the integer-m0 Chebyshev recurrence (no atan2 on
        # the Mosaic VPU); non-integer m0 falls back to the XLA path
        return False
    return _tile_y(p.ny, p.nx, n_states, 4) >= 8


def _roll(A, shift, axis):
    """Circular shift with jnp.roll semantics, lowered to the VPU's
    lane/sublane rotate (far cheaper than concatenate-built shifts).
    pltpu.roll requires a non-negative shift; the explicit int32 keeps
    tpu.dynamic_rotate's shift operand i32 under x64 mode (the df64/f64
    path traces with jax_enable_x64, where a bare python int binds as
    i64 and fails Mosaic verification)."""
    return pltpu.roll(A, jnp.int32(shift % A.shape[axis]), axis)


def _col_mask(A, col):
    ids = jax.lax.broadcasted_iota(jnp.int32, A.shape, dimension=1)
    return ids == col


def _row_mask(A, row):
    ids = jax.lax.broadcasted_iota(jnp.int32, A.shape, dimension=0)
    return ids == row


def _shift_x(A, bc: BoundaryType, d_eff, g_w=None, g_e=None):
    """East/west neighbors of every cell in a (rows, nx) block.

    Rotate + fix the single wrapped edge column via an iota mask; for
    periodic BCs the rotation is already exact.  When ghost columns
    ``g_w``/``g_e`` (shape (rows, 1)) are given -- the x-sharded case --
    they replace the BC fixup: the neighbor-shard/global-BC values were
    produced outside the kernel (`_ghost_cols`).
    """
    nx = A.shape[1]
    east = _roll(A, -1, 1)
    west = _roll(A, 1, 1)
    if g_w is not None:
        east = jnp.where(_col_mask(A, nx - 1), g_e, east)
        west = jnp.where(_col_mask(A, 0), g_w, west)
    elif bc == BoundaryType.NEUMANN:
        east = jnp.where(_col_mask(A, nx - 1), A, east)
        west = jnp.where(_col_mask(A, 0), A, west)
    elif bc == BoundaryType.DIRICHLET:
        east = jnp.where(_col_mask(A, nx - 1), 2 * d_eff - A, east)
        west = jnp.where(_col_mask(A, 0), 2 * d_eff - A, west)
    return east, west


def _pick_halo_rows(center, north_grp, south_grp, bc: BoundaryType, d_eff):
    """Select the true (1, nx) halo rows out of the (8, nx) halo groups.

    Row positions within the groups (see ``_specs`` index maps):
      * periodic: north = group row 0, south = group row 7 (wrap maps);
      * clamp (Neumann/Dirichlet): north = row 0 except at the last program
        where the clamped map lands on the final block (row 7); south = row
        7 except at program 0 (row 0).  Dirichlet then mirrors at the two
        global edges: ghost = 2*d - edge_row.
    """
    if bc == BoundaryType.PERIODIC:
        return north_grp[0:1], south_grp[7:8]
    i = pl.program_id(0)
    n = pl.num_programs(0)
    north_row = jnp.where(i == n - 1, north_grp[7:8], north_grp[0:1])
    south_row = jnp.where(i == 0, south_grp[0:1], south_grp[7:8])
    if bc == BoundaryType.DIRICHLET:
        south_row = jnp.where(i == 0, 2 * d_eff - center[:1], south_row)
        north_row = jnp.where(i == n - 1, 2 * d_eff - center[-1:], north_row)
    return north_row, south_row


def make_halo_row_maps(ny: int, ty: int, bc: BoundaryType):
    """Index maps for the (8, nx) halo row-groups, in 8-row-block units.

    north = the group starting at row (i+1)*ty, south = the group containing
    row i*ty - 1; wrapped for periodic, clamped otherwise (Neumann exact;
    Dirichlet mirrored in-kernel).  Shared by the RHS and CG kernels.
    """
    g = ty // 8
    n_groups = ny // 8
    if bc == BoundaryType.PERIODIC:
        def north(i):
            return (((i + 1) * g) % n_groups, 0)

        def south(i):
            return ((i * g - 1) % n_groups, 0)
    else:
        def north(i):
            return (jnp.minimum((i + 1) * g, n_groups - 1), 0)

        def south(i):
            return (jnp.maximum(i * g - 1, 0), 0)
    return north, south


def _pick_halo_rows_ghost(north_grp, south_grp, ghost_lo, ghost_hi):
    """Ghost-row variant for sharded execution: the y-BC/neighbor rows at
    the shard edges were produced outside the kernel (ppermute halo exchange
    + global-edge BC, already blended), so the edge programs splice them in;
    interior programs use the clamped halo groups as usual."""
    i = pl.program_id(0)
    n = pl.num_programs(0)
    north_row = jnp.where(i == n - 1, ghost_hi[0:1], north_grp[0:1])
    south_row = jnp.where(i == 0, ghost_lo[0:1], south_grp[7:8])
    return north_row, south_row


# Kernel output modes:
#   "rhs":         out = (dPhi_dt, dT_dt)
#   "euler":       out = blend + dt * rhs(blend)        (states[0] is x)
#   "rk4_combine": blend = x + dt*k3 (states [x, k3]); extra center inputs
#                  [k1_F, k1_U, k2_F, k2_U]; computes k4 = rhs(blend) and
#                  writes the full RK4 combination
#                  x + dt/6 (k1 + 2 k2 + 2 k3 + k4) -- k4 never touches HBM.
#   "rkm_final":   blend = x + tau/2 k1 - 3tau/2 k3 + 2tau k4 (states
#                  [x, k1, k3, k4]); computes k5 = rhs(blend), writes the
#                  5th-order update x + tau/6 (k1 + 4 k4 + k5) AND per-block
#                  partial maxima of the Merson error combination
#                  |0.2 k1 - 0.9 k3 + 0.8 k4 - 0.1 k5| for both fields --
#                  k5, the separate final-update pass, and the two
#                  error-norm sweeps all disappear from HBM traffic.
#   "si_prepare":  out = (r0_F, dt*lap(U)[, s]) -- the delta-form
#                  semi-implicit prepare (see ``_make_si_terms``); the s
#                  map is emitted only when it varies per cell.
_MODES = ("rhs", "euler", "rk4_combine", "rkm_final", "si_prepare")


def _g_theta_vpu(gx, gy, grad_norm, p: SimParams):
    """Anisotropy factor g(theta) = 1 - S*cos(m0*theta + theta0) without
    atan2 (absent from the Mosaic VPU): for integer m0 the term
    cos(m0*atan2(gy,gx) + theta0) is computed exactly via the
    angle-addition recurrence on (cos t, sin t) = (gx, gy)/|grad|:
      cos((k+1)t) = cos(kt) c - sin(kt) s, sin((k+1)t) = sin(kt) c + cos(kt) s
    (atan2(0,0) == 0 in the reference -> (c, s) = (1, 0) there).
    Returns None when S == 0 (g == 1; callers skip the multiplies)."""
    if p.S == 0.0:
        return None
    safe = grad_norm > 0
    inv_r = jnp.where(safe, 1.0 / jnp.where(safe, grad_norm, 1.0), 0.0)
    c = jnp.where(safe, gx * inv_r, 1.0)
    s = jnp.where(safe, gy * inv_r, 0.0)
    ck, sk = c, s
    for _ in range(int(p.m0) - 1):
        ck, sk = ck * c - sk * s, sk * c + ck * s
    cos_m = ck * math.cos(p.theta0) - sk * math.sin(p.theta0)
    return 1 - p.S * cos_m


def _make_physics(p: SimParams):
    """The PDE right-hand side on already-shifted neighbor arrays
    (`simulation.cu:208-240`); shared by every kernel mode and the fused
    2-step Euler."""
    dx, dy = p.dx, p.dy
    inv_2dx = 1.0 / (2 * dx)
    inv_2dy = 1.0 / (2 * dy)
    inv_dx2 = 1.0 / (dx * dx)
    inv_dy2 = 1.0 / (dy * dy)
    k0_factor = p.a / (p.xi * p.xi * p.alpha)
    k2_factor = p.b * p.beta / p.alpha
    k1_factor = 1.0 / p.alpha
    dt_L = p.dt * p.L
    # square cells (every shipped/benchmark config): the 5-point stencil
    # collapses to ONE raw neighbor sum times one constant, and lap_F's
    # constant additionally absorbs k1_factor = 1/alpha (g(theta)
    # multiplies AFTER, so the fold holds for S != 0 too) -- the f32 twin
    # of the round-4 df64 fold (`pallas_dd._make_physics_dd`); these
    # kernels are VPU-bound (RESULTS.md), so fewer ops/cell is the lever.
    # Mosaic does not contract mul+add, so every saved op is real.
    square = dx == dy

    def lap(C, N, S, E, W, scale: float):
        if square:
            return ((W + E) + (S + N) - 4 * C) * (inv_dx2 * scale)
        l = (W - 2 * C + E) * inv_dx2 + (S - 2 * C + N) * inv_dy2
        return l * scale if scale != 1.0 else l

    def phys(Fc, F_N, F_S, F_E, F_W, Uc, U_N, U_S, U_E, U_W, fu):
        # k1_lap_F = lap(F)/alpha with the 1/alpha folded into the stencil
        # constant on square cells; lap_U stays unscaled (dt_U needs it)
        k1_lap_F = lap(Fc, F_N, F_S, F_E, F_W, k1_factor if square else 1.0)
        lap_U = lap(Uc, U_N, U_S, U_E, U_W, 1.0)

        # gradient fold (square cells): |grad| = inv_2dx * |(dFx, dFy)|
        # with the scale deferred past the norm into k2's constant --
        # g(theta) only consumes the scale-invariant ratios dF/|dF|
        gx = F_E - F_W if square else (F_E - F_W) * inv_2dx
        gy = F_N - F_S if square else (F_N - F_S) * inv_2dy
        grad_norm = jnp.sqrt(gx * gx + gy * gy)
        k2 = grad_norm * ((inv_2dx if square else 1.0) * k2_factor)

        g_theta = _g_theta_vpu(gx, gy, grad_norm, p)
        if not square:
            k1_lap_F = k1_lap_F * k1_factor
        if g_theta is None:
            # isotropic fast path (the benchmark configs): g == 1
            k0 = Fc * (1 - Fc) * (Fc - 0.5) * k0_factor
        else:
            k0 = g_theta * Fc * (1 - Fc) * (Fc - 0.5) * k0_factor
            k1_lap_F = g_theta * k1_lap_F

        if p.do_corrector_guess:
            corr = 1 + k2 * dt_L
            dt_F = (k1_lap_F + k0 - k2 * (Uc - p.Tm + p.dt * lap_U)) / corr
        else:
            dt_F = k1_lap_F + k0 - k2 * (Uc - p.Tm)
        dt_U = lap_U + p.L * dt_F + fu
        return dt_F, dt_U

    return phys


def si_s_varies(p: SimParams) -> bool:
    """Whether the semi-implicit anisotropy coefficient map s varies per
    cell.  When False (the isotropic, no-corrector-guess benchmark family)
    s == gamma/alpha everywhere: the prepare kernel skips the s output and
    the CG matvec folds the constant into its stencil coefficients, saving
    one full map of HBM traffic per CG iteration."""
    return p.S != 0.0 or p.do_corrector_guess


def _make_si_terms(p: SimParams):
    """Delta-form semi-implicit prepare on already-shifted neighbors.

    The fused twin of ``models.allen_cahn.semi_implicit_prepare``
    (`simulation.cu:798-871`) plus the heat-residual Laplacian term
    uterm = dt*lap(U) (`simulation.cu:893-899`), which costs nothing here
    because U's neighbors are already in VMEM.  Returns (r0_F, uterm, s)
    with s None when it is a compile-time constant (``si_s_varies``)."""
    dx, dy = p.dx, p.dy
    inv_2dx, inv_2dy = 1.0 / (2 * dx), 1.0 / (2 * dy)
    inv_dx2, inv_dy2 = 1.0 / (dx * dx), 1.0 / (dy * dy)
    k0_factor = p.a / (p.xi * p.xi * p.alpha)
    k2_factor = p.b * p.beta / p.alpha
    k1_factor = 1.0 / p.alpha
    # square-cell stencil fold, same as `_make_physics`
    square = dx == dy

    def lap(C, N, S, E, W, scale: float):
        if square:
            return ((W + E) + (S + N) - 4 * C) * (inv_dx2 * scale)
        l = (W - 2 * C + E) * inv_dx2 + (S - 2 * C + N) * inv_dy2
        return l * scale if scale != 1.0 else l

    def terms(Fc, F_N, F_S, F_E, F_W, Uc, U_N, U_S, U_E, U_W):
        k1_lap = lap(Fc, F_N, F_S, F_E, F_W, k1_factor if square else 1.0)
        lap_U = lap(Uc, U_N, U_S, U_E, U_W, 1.0)
        # gradient fold on square cells, same as `_make_physics`
        gx = F_E - F_W if square else (F_E - F_W) * inv_2dx
        gy = F_N - F_S if square else (F_N - F_S) * inv_2dy
        grad_norm = jnp.sqrt(gx * gx + gy * gy)
        k2 = grad_norm * ((inv_2dx if square else 1.0) * k2_factor)
        g = _g_theta_vpu(gx, gy, grad_norm, p)
        if not square:
            k1_lap = k1_lap * k1_factor
        if g is None:
            k0 = Fc * (1 - Fc) * (Fc - 0.5) * k0_factor
        else:
            k0 = g * Fc * (1 - Fc) * (Fc - 0.5) * k0_factor
            k1_lap = g * k1_lap
        if p.do_corrector_guess:
            corr = 1 + k2 * (p.dt * p.L)
            r0 = p.dt / corr * (k1_lap + k0 - k2 * (Uc - p.Tm + p.dt * lap_U))
            sv = (p.gamma * k1_factor) * (g / corr if g is not None else 1.0 / corr)
        else:
            r0 = p.dt * (k1_lap + k0 - k2 * (Uc - p.Tm))
            sv = (p.gamma * k1_factor) * g if g is not None else None
        uterm = p.dt * lap_U
        return r0, uterm, sv

    return terms


def _make_kernel(p: SimParams, n_states: int, mode: str, n_extra: int,
                 ghost: bool = False, ghost_x: bool = False):
    f_bc = p.Phi_boundary
    u_bc = p.T_boundary
    phys = _make_physics(p)
    si = _make_si_terms(p) if mode == "si_prepare" else None

    def kernel(*refs):
        # refs: scalars_ref, per-state (Fc, Fn, Fs, Uc, Un, Us),
        # [4 ghost-row arrays when ghost], [4 ghost-column arrays when
        # ghost_x], extra center-only inputs, then outputs
        # (out_F, out_U[, err_F, err_U])
        scal = refs[0]
        ins = refs[1:1 + 6 * n_states]
        i0 = 1 + 6 * n_states
        if ghost:
            gF_lo, gF_hi, gU_lo, gU_hi = refs[i0:i0 + 4]
            i0 += 4
        if ghost_x:
            gF_w, gF_e, gU_w, gU_e = refs[i0:i0 + 4]
            i0 += 4
        extra = refs[i0:i0 + n_extra]
        outs = refs[i0 + n_extra:]
        out_F, out_U = outs[0], outs[1]

        d_eff = scal[0, n_states]
        fu = scal[0, n_states + 1]
        tau = scal[0, n_states + 2]

        def blended(base, bc, g_lo, g_hi):
            # first weight is exactly 1.0 at every call site: skip the
            # multiply (3 full-block VPU passes saved in the 1-state case)
            c = ins[base][:]
            ng = ins[base + 1][:]
            sg = ins[base + 2][:]
            for k in range(1, n_states):
                w = scal[0, k]
                c = c + ins[base + 6 * k][:] * w
                ng = ng + ins[base + 6 * k + 1][:] * w
                sg = sg + ins[base + 6 * k + 2][:] * w
            if ghost:
                n, s = _pick_halo_rows_ghost(ng, sg, g_lo[:], g_hi[:])
            else:
                n, s = _pick_halo_rows(c, ng, sg, bc, d_eff)
            return c, n, s

        if ghost:
            Fc, Fn, Fs = blended(0, f_bc, gF_lo, gF_hi)
            Uc, Un, Us = blended(3, u_bc, gU_lo, gU_hi)
        else:
            Fc, Fn, Fs = blended(0, f_bc, None, None)
            Uc, Un, Us = blended(3, u_bc, None, None)

        # y-neighbors: sublane-rotate rows within the block, splice the halo
        # rows at the seams via row masks
        ty = Fc.shape[0]

        def shift_y(C, n_row, s_row):
            N = jnp.where(_row_mask(C, ty - 1), n_row, _roll(C, -1, 0))
            S = jnp.where(_row_mask(C, 0), s_row, _roll(C, 1, 0))
            return N, S

        F_N, F_S = shift_y(Fc, Fn, Fs)
        U_N, U_S = shift_y(Uc, Un, Us)
        # x-neighbors: in-VMEM shifts with BC edge columns, or spliced
        # ghost columns when the x dimension is sharded
        if ghost_x:
            F_E, F_W = _shift_x(Fc, f_bc, d_eff, gF_w[:, 0:1], gF_e[:, 0:1])
            U_E, U_W = _shift_x(Uc, u_bc, d_eff, gU_w[:, 0:1], gU_e[:, 0:1])
        else:
            F_E, F_W = _shift_x(Fc, f_bc, d_eff)
            U_E, U_W = _shift_x(Uc, u_bc, d_eff)

        if mode == "si_prepare":
            r0, uterm, sv = si(Fc, F_N, F_S, F_E, F_W, Uc, U_N, U_S, U_E, U_W)
            out_F[:] = r0
            out_U[:] = uterm
            if sv is not None:
                outs[2][:] = sv
            return

        dt_F, dt_U = phys(Fc, F_N, F_S, F_E, F_W, Uc, U_N, U_S, U_E, U_W, fu)

        if mode == "rhs":
            out_F[:] = dt_F
            out_U[:] = dt_U
        elif mode == "euler":
            out_F[:] = Fc + p.dt * dt_F
            out_U[:] = Uc + p.dt * dt_U
        elif mode == "rk4_combine":
            # states = [x, k3]; extras = [k1_F, k1_U, k2_F, k2_U]
            x_F, x_U = ins[0][:], ins[3][:]
            k3_F, k3_U = ins[6][:], ins[9][:]
            k1_F, k1_U, k2_F, k2_U = (e[:] for e in extra)
            c = p.dt / 6
            out_F[:] = x_F + c * (k1_F + 2 * k2_F + 2 * k3_F + dt_F)
            out_U[:] = x_U + c * (k1_U + 2 * k2_U + 2 * k3_U + dt_U)
        elif mode == "rkm_final":
            # states = [x, k1, k3, k4]; rhs result (dt_F, dt_U) is k5
            x_F, x_U = ins[0][:], ins[3][:]
            k1_F, k1_U = ins[6][:], ins[9][:]
            k3_F, k3_U = ins[12][:], ins[15][:]
            k4_F, k4_U = ins[18][:], ins[21][:]
            c = tau / 6
            out_F[:] = x_F + c * (k1_F + 4 * k4_F + dt_F)
            out_U[:] = x_U + c * (k1_U + 4 * k4_U + dt_U)
            err_F, err_U = outs[2], outs[3]
            eF = jnp.max(jnp.abs(0.2 * k1_F - 0.9 * k3_F + 0.8 * k4_F - 0.1 * dt_F))
            eU = jnp.max(jnp.abs(0.2 * k1_U - 0.9 * k3_U + 0.8 * k4_U - 0.1 * dt_U))
            err_F[:] = jnp.full(err_F.shape, eF)
            err_U[:] = jnp.full(err_U.shape, eU)
        else:  # pragma: no cover
            raise ValueError(mode)

    return kernel


def _specs(p: SimParams, ty: int, n_states: int, n_extra: int = 0,
           with_err: bool = False, ghost: bool = False,
           ghost_x: bool = False, n_out: int = 2, n_scal: int = 0):
    """Block specs: center (ty, nx) blocks + (8, nx) halo row-groups.

    Halo index maps are in 8-row-block units (ty is a multiple of 8):
      * north halo = the row-group starting at row (i+1)*ty: group index
        i*g + g with g = ty/8, wrapped (periodic) or clamped (else); under
        clamping the last program lands on the final group, where the wanted
        row ny-1 sits at offset 7 (handled in ``_pick_halo_rows``).
      * south halo = the row-group containing row i*ty - 1: group index
        i*g - 1, wrapped or clamped; offset 7 normally, offset 0 at the
        clamped first program.
    """
    ny, nx = p.ny, p.nx

    def center(i):
        return (i, 0)

    f_north, f_south = make_halo_row_maps(ny, ty, p.Phi_boundary)
    u_north, u_south = make_halo_row_maps(ny, ty, p.T_boundary)

    in_specs = [pl.BlockSpec((1, n_scal or (n_states + 3)), lambda i: (0, 0),
                             memory_space=pltpu.SMEM)]
    for _ in range(n_states):
        in_specs += [
            pl.BlockSpec((ty, nx), center, memory_space=pltpu.VMEM),
            pl.BlockSpec((8, nx), f_north, memory_space=pltpu.VMEM),
            pl.BlockSpec((8, nx), f_south, memory_space=pltpu.VMEM),
            pl.BlockSpec((ty, nx), center, memory_space=pltpu.VMEM),
            pl.BlockSpec((8, nx), u_north, memory_space=pltpu.VMEM),
            pl.BlockSpec((8, nx), u_south, memory_space=pltpu.VMEM),
        ]
    if ghost:
        for _ in range(4):
            in_specs.append(pl.BlockSpec((8, nx), lambda i: (0, 0),
                                         memory_space=pltpu.VMEM))
    if ghost_x:
        # (ny_local, 128) ghost-column arrays, row-blocked with the center
        for _ in range(4):
            in_specs.append(pl.BlockSpec((ty, 128), center,
                                         memory_space=pltpu.VMEM))
    for _ in range(n_extra):
        in_specs.append(pl.BlockSpec((ty, nx), center, memory_space=pltpu.VMEM))
    out_specs = [pl.BlockSpec((ty, nx), center, memory_space=pltpu.VMEM)
                 for _ in range(n_out)]
    if with_err:
        # per-program partial maxima, written as broadcast (8, 128) blocks
        err_spec = pl.BlockSpec((8, 128), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
        out_specs += [err_spec, err_spec]
    return in_specs, out_specs


@functools.partial(jax.jit, static_argnames=("p", "n_states", "mode", "interpret",
                                             "ghost", "ghost_x", "ny_local",
                                             "nx_local"))
def _call(p: SimParams, n_states: int, mode: str, interpret: bool,
          scalars, *fields, ghost: bool = False, ghost_x: bool = False,
          ny_local: int = 0, nx_local: int = 0):
    n_extra = 4 if mode == "rk4_combine" else 0
    with_err = mode == "rkm_final"
    n_out = (3 if si_s_varies(p) else 2) if mode == "si_prepare" else 2
    ny = ny_local or p.ny
    nx = nx_local or p.nx
    ty = _tile_y(ny, nx, n_states + n_extra // 2, 4)
    grid = ny // ty
    # local-shape view of the params for spec construction
    pl_view = p if (ny == p.ny and nx == p.nx) else p.replace(ny=ny, nx=nx)
    in_specs, out_specs = _specs(pl_view, ty, n_states, n_extra, with_err,
                                 ghost, ghost_x, n_out=n_out)
    kernel = _make_kernel(p, n_states, mode, n_extra, ghost, ghost_x)
    shape = jax.ShapeDtypeStruct((ny, nx), jnp.float32)
    out_shape = [shape] * n_out
    if with_err:
        err_shape = jax.ShapeDtypeStruct((grid * 8, 128), jnp.float32)
        out_shape += [err_shape, err_shape]
    flops_per_cell = 40 + (60 if p.S != 0.0 else 0)
    out = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=flops_per_cell * p.N * (1 + (n_states - 1) * 2),
            bytes_accessed=(2 * n_states + 2 + n_extra) * p.N * 4,
            transcendentals=(2 * p.N if p.S != 0.0 else p.N),
        ),
    )(scalars, *fields)
    return tuple(out)


def blend_rhs_pallas(
    states: Sequence[Tuple[jnp.ndarray, jnp.ndarray]],
    weights: Sequence,
    p: SimParams,
    fu=0.0,
    dirichlet_value=0.0,
    is_euler: bool = False,
    interpret: bool = False,
):
    """Evaluate the RHS at ``sum_i w_i * (F_i, U_i)`` in one fused pass.

    Same contract as ``ops.rhs.eval_rhs`` (dirichlet_value here is the
    *effective* value for the blended field, i.e. already scaled by
    sum(weights) when nonzero -- see ops/rhs.py).
    """
    out = _stage_call(states, weights, p, "euler" if is_euler else "rhs",
                      fu=fu, dirichlet_value=dirichlet_value,
                      interpret=interpret)
    return out[0], out[1]


def _scalar_row(weights, n, dirichlet_value, fu, tau, extra=()):
    if isinstance(weights[0], (int, float)) and float(weights[0]) != 1.0:
        raise ValueError("first blend weight must be 1.0 (base state); every "
                         "integrator stage has this form")
    w = jnp.zeros((1, n + 3 + len(extra)), jnp.float32)
    for k, wk in enumerate(weights):
        w = w.at[0, k].set(jnp.asarray(wk, jnp.float32))
    w = w.at[0, n].set(jnp.asarray(dirichlet_value, jnp.float32))
    w = w.at[0, n + 1].set(jnp.asarray(fu, jnp.float32))
    w = w.at[0, n + 2].set(jnp.asarray(tau, jnp.float32))
    for j, v in enumerate(extra):
        w = w.at[0, n + 3 + j].set(jnp.asarray(v, jnp.float32))
    return w


def _stage_call(states, weights, p, mode, extra=(), fu=0.0,
                dirichlet_value=0.0, tau=0.0, interpret=False):
    n = len(states)
    if not 1 <= n <= 4:
        raise ValueError(f"1..4 blend states supported, got {n}")
    w = _scalar_row(weights, n, dirichlet_value, fu, tau)
    fields = []
    for F, U in states:
        fields += [F, F, F, U, U, U]  # center + 2 halo-group views of one array
    fields += list(extra)
    return _call(p, n, mode, interpret, w, *fields)


def rhs_pallas(Fb, Ub, p: SimParams, fu=0.0, dirichlet_value=0.0,
               is_euler: bool = False, interpret: bool = False):
    """Single-state entry used by ops.rhs once states are pre-blended."""
    return blend_rhs_pallas([(Fb, Ub)], [1.0], p, fu=fu,
                            dirichlet_value=dirichlet_value,
                            is_euler=is_euler, interpret=interpret)


def si_prepare_pallas(F, U, p: SimParams, dirichlet_value=0.0,
                      interpret: bool = False):
    """Fused semi-implicit prepare: ONE HBM pass over (F, U) emitting the
    delta-form phase residual r0_F, the heat Laplacian term dt*lap(U), and
    -- only when ``si_s_varies(p)`` -- the per-cell anisotropy coefficient
    map s (see ``_make_si_terms``).  Returns (r0_F, uterm[, s]).

    Replaces the XLA path's pad + prepare + separate lap(U) sweep
    (solvers/semi_implicit.py), ~3 full passes -> 1."""
    return _stage_call([(F, U)], [1.0], p, "si_prepare",
                       dirichlet_value=dirichlet_value, interpret=interpret)


def si_prepare_pallas_sharded(F, U, p: SimParams, axis_y, axis_x=None,
                              dirichlet_value=0.0, interpret: bool = False):
    """Sharded twin of ``si_prepare_pallas`` (ghost rows/columns over ICI,
    same machinery as the sharded RHS stages)."""
    return _stage_call_sharded([(F, U)], [1.0], p, axis_y, "si_prepare",
                               dirichlet_value=dirichlet_value,
                               interpret=interpret, axis_x=axis_x)


def _ghost_rows(states, weights, bc: BoundaryType, which: int, axis_name: str,
                d_eff):
    """Blended shard-edge ghost rows via one ppermute pair.

    which: 0 = Phi field, 1 = T field.  Blending edge rows before the
    exchange keeps the collective count independent of the RK stage width
    (rows of a blend == blend of rows).  Returns (ghost_lo, ghost_hi) of
    shape (8, nx) -- padded for Mosaic's sublane granularity; only row 0
    carries data.
    """
    from jax import lax

    first = states[0][which][0:1, :]
    last = states[0][which][-1:, :]
    for (pair, w) in zip(states[1:], weights[1:]):
        first = first + pair[which][0:1, :] * w
        last = last + pair[which][-1:, :] * w

    n = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)
    fwd = [(i, (i + 1) % n) for i in range(n)]
    bwd = [(i, (i - 1) % n) for i in range(n)]
    ghost_lo = lax.ppermute(last, axis_name, fwd)    # from predecessor
    ghost_hi = lax.ppermute(first, axis_name, bwd)   # from successor

    if bc != BoundaryType.PERIODIC:
        if bc == BoundaryType.NEUMANN:
            bc_lo, bc_hi = first, last
        else:  # DIRICHLET mirror (d_eff already weight-scaled, see ops/rhs)
            d = jnp.asarray(d_eff, first.dtype)
            bc_lo, bc_hi = 2 * d - first, 2 * d - last
        ghost_lo = jnp.where(idx == 0, bc_lo, ghost_lo)
        ghost_hi = jnp.where(idx == n - 1, bc_hi, ghost_hi)

    pad = ((0, 7), (0, 0))
    return jnp.pad(ghost_lo, pad), jnp.pad(ghost_hi, pad)


def _ghost_cols(states, weights, bc: BoundaryType, which: int, axis_name: str,
                d_eff):
    """Blended shard-edge ghost COLUMNS via one ppermute pair (the x-sharded
    twin of ``_ghost_rows``).  Returns (ghost_w, ghost_e) of shape
    (ny_local, 128) -- lane-padded; only column 0 carries data."""
    from jax import lax

    first = states[0][which][:, 0:1]
    last = states[0][which][:, -1:]
    for (pair, w) in zip(states[1:], weights[1:]):
        first = first + pair[which][:, 0:1] * w
        last = last + pair[which][:, -1:] * w

    n = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)
    fwd = [(i, (i + 1) % n) for i in range(n)]
    bwd = [(i, (i - 1) % n) for i in range(n)]
    ghost_w = lax.ppermute(last, axis_name, fwd)    # from west neighbor
    ghost_e = lax.ppermute(first, axis_name, bwd)   # from east neighbor

    if bc != BoundaryType.PERIODIC:
        if bc == BoundaryType.NEUMANN:
            bc_w, bc_e = first, last
        else:  # DIRICHLET mirror (d_eff already weight-scaled, see ops/rhs)
            d = jnp.asarray(d_eff, first.dtype)
            bc_w, bc_e = 2 * d - first, 2 * d - last
        ghost_w = jnp.where(idx == 0, bc_w, ghost_w)
        ghost_e = jnp.where(idx == n - 1, bc_e, ghost_e)

    pad = ((0, 0), (0, 127))
    return jnp.pad(ghost_w, pad), jnp.pad(ghost_e, pad)


def _stage_call_sharded(states, weights, p: SimParams, axis_y, mode: str,
                        extra=(), fu=0.0, dirichlet_value=0.0, tau=0.0,
                        interpret: bool = False, axis_x=None):
    """Any fused stage inside shard_map (grid sharded on rows, or rows x
    cols).

    The y-halo at shard seams rides ICI as two blended ghost rows per field
    (4 small ppermutes per stage); on 2D meshes the x-halo adds two blended
    ghost columns per field.  Everything else -- blending, BCs along
    unsharded dims, stencil, physics, mode-specific combinations -- stays in
    the single fused kernel per shard.  Extra center-only inputs
    (rk4_combine) need no halo.
    """
    n = len(states)
    w = _scalar_row(weights, n, dirichlet_value, fu, tau)
    fields = []
    for F, U in states:
        fields += [F, F, F, U, U, U]
    ghost = axis_y is not None
    if ghost:
        gF_lo, gF_hi = _ghost_rows(states, weights, p.Phi_boundary, 0, axis_y,
                                   dirichlet_value)
        gU_lo, gU_hi = _ghost_rows(states, weights, p.T_boundary, 1, axis_y,
                                   dirichlet_value)
        fields += [gF_lo, gF_hi, gU_lo, gU_hi]
    ghost_x = axis_x is not None
    if ghost_x:
        gF_w, gF_e = _ghost_cols(states, weights, p.Phi_boundary, 0, axis_x,
                                 dirichlet_value)
        gU_w, gU_e = _ghost_cols(states, weights, p.T_boundary, 1, axis_x,
                                 dirichlet_value)
        fields += [gF_w, gF_e, gU_w, gU_e]
    fields += list(extra)
    ny_local, nx_local = states[0][0].shape
    return _call(p, n, mode, interpret, w, *fields,
                 ghost=ghost, ghost_x=ghost_x,
                 ny_local=ny_local, nx_local=nx_local)


def blend_rhs_pallas_sharded(states, weights, p: SimParams, axis_y,
                             fu=0.0, dirichlet_value=0.0,
                             is_euler: bool = False, interpret: bool = False,
                             axis_x=None):
    """Fused RHS stage inside shard_map (see ``_stage_call_sharded``)."""
    out = _stage_call_sharded(states, weights, p, axis_y,
                              "euler" if is_euler else "rhs",
                              fu=fu, dirichlet_value=dirichlet_value,
                              interpret=interpret, axis_x=axis_x)
    return out[0], out[1]


def rk4_final_stage_pallas_sharded(x, k1, k2, k3, p: SimParams, axis_y,
                                   fu=0.0, dirichlet_value=0.0,
                                   interpret: bool = False, axis_x=None):
    """Sharded twin of ``rk4_final_stage_pallas``."""
    out = _stage_call_sharded([x, k3], [1.0, p.dt], p, axis_y, "rk4_combine",
                              extra=[k1[0], k1[1], k2[0], k2[1]],
                              fu=fu, dirichlet_value=dirichlet_value,
                              interpret=interpret, axis_x=axis_x)
    return out[0], out[1]


def rkm_final_stage_pallas_sharded(x, k1, k3, k4, tau, p: SimParams,
                                   axis_y, fu=0.0, dirichlet_value=0.0,
                                   interpret: bool = False, axis_x=None):
    """Sharded twin of ``rkm_final_stage_pallas``.

    Returns (next_F, next_U, emax_F, emax_U) with SHARD-LOCAL error maxima;
    the caller must pmax them over the mesh axes.
    """
    out = _stage_call_sharded([x, k1, k3, k4],
                              [1.0, tau / 2, -3 * tau / 2, 2 * tau],
                              p, axis_y, "rkm_final", fu=fu,
                              dirichlet_value=dirichlet_value, tau=tau,
                              interpret=interpret, axis_x=axis_x)
    next_F, next_U, err_F, err_U = out
    return next_F, next_U, jnp.max(err_F), jnp.max(err_U)


def supports_sharded(p: SimParams, ny_local: int, n_states: int = 4,
                     nx_local: int = 0) -> bool:
    """Ghost kernel feasibility for a local (ny_local, nx_local) shard."""
    nx_local = nx_local or p.nx
    if p.dtype != "float32" or nx_local % 128 != 0:
        return False
    if ny_local % 8 != 0 or ny_local < 16:
        return False
    if p.S != 0.0 and not (float(p.m0).is_integer() and p.m0 >= 1):
        return False
    return _tile_y(ny_local, nx_local, n_states, 4) >= 8


def _make_euler2_kernel(p: SimParams, interpret: bool = False, T: int = 2,
                        ghost: bool = False):
    """Fused T consecutive Euler steps per HBM pass (temporal blocking).

    The (8, nx) halo row-groups already carry enough depth for a radius-T
    dependency (T <= 7), so the same inputs as the single-step kernel
    suffice:

      1. build ext = [south_group; center; north_group] (ty+16 rows);
      2. clamp-BC ghost fix: at the first/last program overwrite the whole
         8-row ghost region with the BC image of the adjacent real row
         (clamp semantics: every ghost depth maps to the edge row,
         `simulation.cu:74-79`; Dirichlet mirrors through it);
      3. Euler-update ALL ext rows via plain rolls (rows whose neighbors
         are wrong lie one deeper than any row a later step reads);
      4. re-apply the ghost fix to each intermediate field (the ghost of
         the *updated* field, exactly what the next plain step would pad);
      5. after T sweeps write out rows 8..ty+7 (sublane-aligned slice).

    Per-update HBM traffic drops T-fold: T steps move 2 reads + 2 writes
    instead of 2T + 2T.  Identical to T single fused steps in exact
    arithmetic (same neighbor values, same formulas); in floats the two
    graphs may contract FMAs differently, so equivalence holds to
    f32-rounding tolerance (tests/test_pallas.py).
    """
    assert 2 <= T <= 7
    f_bc = p.Phi_boundary
    u_bc = p.T_boundary
    phys = _make_physics(p)

    def kernel(*refs):
        if ghost:
            (scal, Fc, Fn, Fs, Uc, Un, Us,
             gF_lo, gF_hi, gU_lo, gU_hi, out_F, out_U) = refs
            shard_first = scal[0, 4] > 0.5
            shard_last = scal[0, 5] > 0.5
        else:
            scal, Fc, Fn, Fs, Uc, Un, Us, out_F, out_U = refs
        d_eff = scal[0, 1]
        fu = scal[0, 2]
        extF = jnp.concatenate([Fs[:], Fc[:], Fn[:]], axis=0)
        extU = jnp.concatenate([Us[:], Uc[:], Un[:]], axis=0)
        tye = extF.shape[0]  # ty + 16

        if ghost:
            # T <= 7 steps keep reads within the valid (8 - step) slab depth
            extF = _splice_slabs(extF, gF_lo, gF_hi)
            extU = _splice_slabs(extU, gU_lo, gU_hi)

        def fix(ext, bc):
            # splice the true ghost rows at the global edges (the clamped
            # halo maps land on in-range rows there)
            if bc == BoundaryType.PERIODIC:
                return ext  # wrap maps (or ring-ppermuted slabs) are true
            i = pl.program_id(0)
            n = pl.num_programs(0)
            rows = jax.lax.broadcasted_iota(jnp.int32, ext.shape, dimension=0)
            lo = ext[8:9]
            hi = ext[tye - 9:tye - 8]
            if bc == BoundaryType.DIRICHLET:
                lo = 2 * d_eff - lo
                hi = 2 * d_eff - hi
            lo_mask = jnp.logical_and(rows < 8, i == 0)
            hi_mask = jnp.logical_and(rows >= tye - 8, i == n - 1)
            if ghost:
                lo_mask = jnp.logical_and(lo_mask, shard_first)
                hi_mask = jnp.logical_and(hi_mask, shard_last)
            ext = jnp.where(lo_mask, lo, ext)
            ext = jnp.where(hi_mask, hi, ext)
            return ext

        def euler_ext(eF, eU):
            F_N = _roll(eF, -1, 0)
            F_S = _roll(eF, 1, 0)
            U_N = _roll(eU, -1, 0)
            U_S = _roll(eU, 1, 0)
            F_E, F_W = _shift_x(eF, f_bc, d_eff)
            U_E, U_W = _shift_x(eU, u_bc, d_eff)
            dt_F, dt_U = phys(eF, F_N, F_S, F_E, F_W, eU, U_N, U_S, U_E, U_W, fu)
            return eF + p.dt * dt_F, eU + p.dt * dt_U

        sF, sU = extF, extU
        for step_idx in range(T):
            sF = fix(sF, f_bc)
            sU = fix(sU, u_bc)
            sF, sU = euler_ext(sF, sU)
            if interpret and step_idx < T - 1:
                # replicate the single-step kernel's HBM store: round the
                # intermediate to exactly float32 (the CPU interpreter may
                # carry excess precision; real TPU f32 VPU ops have none,
                # and Mosaic does not lower reduce_precision)
                sF = jax.lax.reduce_precision(sF, 8, 23)
                sU = jax.lax.reduce_precision(sU, 8, 23)
        ty = out_F.shape[0]
        out_F[:] = sF[8:8 + ty]
        out_U[:] = sU[8:8 + ty]

    return kernel


def _ghost_slabs(F, U, axis_name: str):
    """Exchange full 8-row edge SLABS of both fields over ICI (one ppermute
    pair per field per STEP -- the whole-integrator kernels recompute every
    stage from x in VMEM, so they need the neighbor's x at depth <= 8, not
    per-stage ghost rows).  Returns (gF_lo, gF_hi, gU_lo, gU_hi), each
    (8, nx): the predecessor's last 8 rows / successor's first 8 rows.
    Global-edge BC handling happens IN-KERNEL (the per-stage ghost refix),
    so no BC correction is applied here."""
    from jax import lax

    n = lax.axis_size(axis_name)
    fwd = [(i, (i + 1) % n) for i in range(n)]
    bwd = [(i, (i - 1) % n) for i in range(n)]
    out = []
    for A in (F, U):
        out.append(lax.ppermute(A[-8:, :], axis_name, fwd))   # from predecessor
        out.append(lax.ppermute(A[:8, :], axis_name, bwd))    # from successor
    gF_lo, gF_hi, gU_lo, gU_hi = out[0], out[1], out[2], out[3]
    return gF_lo, gF_hi, gU_lo, gU_hi


def _splice_slabs(ext, g_lo, g_hi):
    """Replace the 8-row ghost regions of an extended block with the
    neighbor shard's true slabs at the shard-edge programs (the
    clamped/wrapped halo maps land on same-shard rows there, which are
    wrong on a mesh).  Interior programs keep their true same-shard rows.
    Shared by the multi-step Euler and whole-integrator ghost kernels."""
    tye = ext.shape[0]
    i = pl.program_id(0)
    n = pl.num_programs(0)
    ext = jnp.where(i == 0,
                    jnp.concatenate([g_lo[:], ext[8:]], axis=0), ext)
    ext = jnp.where(i == n - 1,
                    jnp.concatenate([ext[:tye - 8], g_hi[:]], axis=0), ext)
    return ext


# A/B hook for the compensated Merson error combination (see comb() inside
# the fullstep kernel).  Measured round 3: no floor improvement, so False.
# NOTE: the kernel closure reads this at trace time -- flip it only with
# fresh jits (tests/bench clear _fullstep_call's cache).
COMPENSATED_ERR = False


def _make_fullstep_kernel(p: SimParams, scheme: str, interpret: bool = False,
                          ghost: bool = False):
    """One FULL integrator step (or adaptive attempt) per HBM pass.

    Generalizes the multi-step Euler kernel's extended-block machinery to
    stage chains: RK4 needs stage depth 4 and the Merson attempt depth 5,
    both within the 8-row halo groups.  Per pass only x is read and next_x
    written -- the k stages never touch HBM (the staged path moves ~4
    arrays per stage).

      scheme="rk4": classic 4-stage step, out = x + dt/6 (k1+2k2+2k3+k4)
                    (`simulation.cu:313-348`).
      scheme="rkm": one Merson attempt at the SMEM-supplied tau
                    (`simulation.cu:400-409`); outputs the 5th-order update
                    x + tau/6 (k1+4k4+k5) AND per-program partial maxima of
                    |0.2k1 - 0.9k3 + 0.8k4 - 0.1k5| over the CENTER rows
                    (halo rows belong to neighbor blocks).

    Ghost handling as in the Euler kernel: at edge programs the 8-row ghost
    region of every stage BLEND is reset to its 1-deep BC image (clamp /
    mirror with the blend's effective Dirichlet value d * sum(weights), the
    exact value the staged path pads with -- ops/rhs.py); interior programs
    read true neighbor rows from the clamped halo-group maps.  Identical to
    the staged kernels in exact arithmetic; f32-rounding-tolerance
    equivalence in floats (FMA contraction differs between graphs).
    """
    assert scheme in ("rk4", "rkm")
    f_bc = p.Phi_boundary
    u_bc = p.T_boundary
    phys = _make_physics(p)

    def kernel(*refs):
        if ghost:
            (scal, Fc, Fn, Fs, Uc, Un, Us,
             gF_lo, gF_hi, gU_lo, gU_hi) = refs[:11]
            outs = refs[11:]
        else:
            scal, Fc, Fn, Fs, Uc, Un, Us = refs[:7]
            outs = refs[7:]
        d = scal[0, 1]
        fu = scal[0, 2]
        tau = scal[0, 3]
        if ghost:
            # whether THIS shard sits at the global domain edges (scalars
            # fed by the caller from lax.axis_index)
            shard_first = scal[0, 4] > 0.5
            shard_last = scal[0, 5] > 0.5
        extF = jnp.concatenate([Fs[:], Fc[:], Fn[:]], axis=0)
        extU = jnp.concatenate([Us[:], Uc[:], Un[:]], axis=0)
        tye = extF.shape[0]

        if ghost:
            # Stage recomputation reproduces the neighbor's stage values to
            # shrinking depth: stage k reads depth k <= 5 < 8.  At GLOBAL
            # edges the per-stage ghost refix below overwrites these rows.
            extF = _splice_slabs(extF, gF_lo, gF_hi)
            extU = _splice_slabs(extU, gU_lo, gU_hi)

        def fix(ext, bc, dv):
            if bc == BoundaryType.PERIODIC:
                return ext  # (sharded: the ring-ppermuted slabs ARE the wrap)
            i = pl.program_id(0)
            n = pl.num_programs(0)
            rows = jax.lax.broadcasted_iota(jnp.int32, ext.shape, dimension=0)
            lo = ext[8:9]
            hi = ext[tye - 9:tye - 8]
            if bc == BoundaryType.DIRICHLET:
                lo = 2 * dv - lo
                hi = 2 * dv - hi
            lo_mask = jnp.logical_and(rows < 8, i == 0)
            hi_mask = jnp.logical_and(rows >= tye - 8, i == n - 1)
            if ghost:
                # BC images only at the global domain edges; interior shard
                # seams keep the spliced neighbor rows
                lo_mask = jnp.logical_and(lo_mask, shard_first)
                hi_mask = jnp.logical_and(hi_mask, shard_last)
            ext = jnp.where(lo_mask, lo, ext)
            ext = jnp.where(hi_mask, hi, ext)
            return ext

        def rnd(a):
            # replicate the staged path's HBM store rounding under the CPU
            # interpreter (real f32 VPUs have no excess precision; Mosaic
            # does not lower reduce_precision)
            return jax.lax.reduce_precision(a, 8, 23) if interpret else a

        def rhs_at(bF, bU, dv):
            F_N = _roll(bF, -1, 0)
            F_S = _roll(bF, 1, 0)
            U_N = _roll(bU, -1, 0)
            U_S = _roll(bU, 1, 0)
            F_E, F_W = _shift_x(bF, f_bc, dv)
            U_E, U_W = _shift_x(bU, u_bc, dv)
            return phys(bF, F_N, F_S, F_E, F_W, bU, U_N, U_S, U_E, U_W, fu)

        def stage(ks, ws):
            """k = f(x + sum_i w_i k_i) with ghost fix at the blend's
            effective Dirichlet value (weights [1, *ws])."""
            bF, bU = xF, xU
            wsum = 1.0
            for (kF_i, kU_i), w in zip(ks, ws):
                bF = bF + w * kF_i
                bU = bU + w * kU_i
                wsum = wsum + w
            dv = d * wsum
            bF = fix(bF, f_bc, dv)
            bU = fix(bU, u_bc, dv)
            kF, kU = rhs_at(bF, bU, dv)
            return rnd(kF), rnd(kU)

        xF = fix(extF, f_bc, d)
        xU = fix(extU, u_bc, d)
        k1 = stage([], [])
        ty = outs[0].shape[0]
        if scheme == "rk4":
            dt = p.dt
            k2 = stage([k1], [dt / 2])
            k3 = stage([k2], [dt / 2])
            k4 = stage([k3], [dt])
            c = dt / 6
            outs[0][:] = (xF + c * (k1[0] + 2 * k2[0] + 2 * k3[0] + k4[0]))[8:8 + ty]
            outs[1][:] = (xU + c * (k1[1] + 2 * k2[1] + 2 * k3[1] + k4[1]))[8:8 + ty]
        else:
            k2 = stage([k1], [tau / 3])
            k3 = stage([k1, k2], [tau / 6, tau / 6])
            k4 = stage([k1, k3], [tau / 8, 3 * tau / 8])
            k5 = stage([k1, k3, k4], [tau / 2, -3 * tau / 2, 2 * tau])
            c = tau / 6
            outs[0][:] = (xF + c * (k1[0] + 4 * k4[0] + k5[0]))[8:8 + ty]
            outs[1][:] = (xU + c * (k1[1] + 4 * k4[1] + k5[1]))[8:8 + ty]
            mid = slice(8, 8 + ty)

            def comb(c1, c3, c4, c5):
                """0.2c1 - 0.9c3 + 0.8c4 - 0.1c5 (the Merson error body).

                Compensated variant (COMPENSATED_ERR): scaling by 10 makes
                every coefficient integral -- 2c1, 8c3, 8c4, c5 are EXACT
                binary products and 9c3 splits exactly into 8c3 + c3 -- so
                a TwoSum cascade evaluates the combination to double-f32
                precision with ONE rounding at the final 0.1 scale,
                removing the evaluation's own cancellation noise.
                MEASURED (round 3, RESULTS.md): the f32 noise floor does
                NOT move (settle tau ~2.6e-7 vs ~2.3e-7 at 512^2/5e-9) --
                the floor is the STAGES' own rounding, ~1 ulp of max|k|,
                which the round-2 whole-attempt fusion already reached --
                so the default stays on the plain form and the compensated
                path is kept only as an A/B hook."""
                if not COMPENSATED_ERR:
                    return 0.2 * c1 - 0.9 * c3 + 0.8 * c4 - 0.1 * c5
                terms = (-8.0 * c3, -c3, 8.0 * c4, -c5)
                s = 2.0 * c1
                comp = jnp.zeros_like(s)
                for t in terms:
                    x = s + t
                    z = x - s
                    comp = comp + ((s - (x - z)) + (t - z))
                    s = x
                return 0.1 * (s + comp)

            eF = jnp.max(jnp.abs(comb(k1[0], k3[0], k4[0], k5[0]))[mid])
            eU = jnp.max(jnp.abs(comb(k1[1], k3[1], k4[1], k5[1]))[mid])
            outs[2][:] = jnp.full(outs[2].shape, eF)
            outs[3][:] = jnp.full(outs[3].shape, eU)

    return kernel


def supports_fullstep(p: SimParams) -> bool:
    """Whether the fused whole-integrator kernels handle this config."""
    return supports(p, n_states=3) and _fullstep_tile(p) >= 8


def _fullstep_tile(p: SimParams) -> int:
    return _fullstep_tile_local(p.ny, p.nx)


def _fullstep_tile_local(ny: int, nx: int) -> int:
    # the stage chain holds ~5 live field pairs on (ty+16)-row blocks
    return min(_tile_y(ny, nx, 6, 4, budget=_EULER2_BUDGET), 256)


@functools.partial(jax.jit, static_argnames=("p", "scheme", "interpret"))
def _fullstep_call(p: SimParams, scheme: str, interpret: bool,
                   F, U, tau, fu, dirichlet_value):
    ny, nx = p.ny, p.nx
    ty = _fullstep_tile(p)
    grid = ny // ty
    w = _scalar_row([1.0], 1, dirichlet_value, fu, tau)
    in_specs, out_specs = _specs(p, ty, 1, with_err=(scheme == "rkm"))
    kernel = _make_fullstep_kernel(p, scheme, interpret)
    shape = jax.ShapeDtypeStruct((ny, nx), jnp.float32)
    out_shape = [shape, shape]
    if scheme == "rkm":
        err_shape = jax.ShapeDtypeStruct((grid * 8, 128), jnp.float32)
        out_shape += [err_shape, err_shape]
    n_stages = 4 if scheme == "rk4" else 5
    flops_per_cell = n_stages * (40 + (60 if p.S != 0.0 else 0))
    out = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=flops_per_cell * p.N,
            bytes_accessed=4 * p.N * 4,
            transcendentals=n_stages * (2 if p.S != 0.0 else 1) * p.N,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(w, F, F, F, U, U, U)
    return tuple(out)


def rk4_full_pallas(F, U, p: SimParams, fu=0.0, dirichlet_value=0.0,
                    interpret: bool = False):
    """Entire RK4 step in one fused pass (see ``_make_fullstep_kernel``)."""
    out = _fullstep_call(p, "rk4", interpret, F, U, 0.0, fu, dirichlet_value)
    return out[0], out[1]


def rkm_attempt_pallas(F, U, tau, p: SimParams, fu=0.0, dirichlet_value=0.0,
                       interpret: bool = False):
    """Entire Merson attempt (k1..k5 + update + error maxima) in one fused
    pass.  Returns (next_F, next_U, emax_F, emax_U)."""
    out = _fullstep_call(p, "rkm", interpret, F, U, tau, fu, dirichlet_value)
    next_F, next_U, err_F, err_U = out
    return next_F, next_U, jnp.max(err_F), jnp.max(err_U)


def supports_fullstep_sharded(p: SimParams, ny_local: int,
                              nx_local: int = 0) -> bool:
    """Ghost-slab whole-integrator kernel feasibility on a y-sharded local
    shard (x must be unsharded: the stage chain would need 5-deep ghost
    COLUMNS, which the lane dimension does not accommodate)."""
    nx_local = nx_local or p.nx
    if not supports_sharded(p, ny_local, 3, nx_local=nx_local):
        return False
    return _fullstep_tile_local(ny_local, nx_local) >= 8


@functools.partial(jax.jit, static_argnames=("p", "scheme", "interpret",
                                             "ny_local", "nx_local"))
def _fullstep_call_sharded(p: SimParams, scheme: str, interpret: bool,
                           F, U, gF_lo, gF_hi, gU_lo, gU_hi,
                           tau, fu, dirichlet_value, first, last,
                           ny_local: int = 0, nx_local: int = 0):
    ny, nx = ny_local, nx_local
    ty = _fullstep_tile_local(ny, nx)
    grid = ny // ty
    w = _scalar_row([1.0], 1, dirichlet_value, fu, tau, extra=(first, last))
    pl_view = p if (ny == p.ny and nx == p.nx) else p.replace(ny=ny, nx=nx)
    in_specs, out_specs = _specs(pl_view, ty, 1, with_err=(scheme == "rkm"),
                                 ghost=True, n_scal=6)
    kernel = _make_fullstep_kernel(p, scheme, interpret, ghost=True)
    shape = jax.ShapeDtypeStruct((ny, nx), jnp.float32)
    out_shape = [shape, shape]
    if scheme == "rkm":
        err_shape = jax.ShapeDtypeStruct((grid * 8, 128), jnp.float32)
        out_shape += [err_shape, err_shape]
    n_stages = 4 if scheme == "rk4" else 5
    flops_per_cell = n_stages * (40 + (60 if p.S != 0.0 else 0))
    out = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=flops_per_cell * ny * nx,
            bytes_accessed=4 * ny * nx * 4,
            transcendentals=n_stages * (2 if p.S != 0.0 else 1) * ny * nx,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(w, F, F, F, U, U, U, gF_lo, gF_hi, gU_lo, gU_hi)
    return tuple(out)


def _edge_flags(axis_y: str):
    from jax import lax

    idx = lax.axis_index(axis_y)
    n = lax.axis_size(axis_y)
    return ((idx == 0).astype(jnp.float32),
            (idx == n - 1).astype(jnp.float32))


def rk4_full_pallas_sharded(F, U, p: SimParams, axis_y, fu=0.0,
                            dirichlet_value=0.0, interpret: bool = False):
    """Entire RK4 step in one fused pass per shard: ONE 8-row ghost-slab
    exchange per field per STEP (vs 4 ppermute pairs per staged step) and
    no k stage ever in HBM."""
    g = _ghost_slabs(F, U, axis_y)
    first, last = _edge_flags(axis_y)
    ny_local, nx_local = F.shape
    out = _fullstep_call_sharded(p, "rk4", interpret, F, U, *g, 0.0, fu,
                                 dirichlet_value, first, last,
                                 ny_local=ny_local, nx_local=nx_local)
    return out[0], out[1]


def rkm_attempt_pallas_sharded(F, U, tau, p: SimParams, axis_y, fu=0.0,
                               dirichlet_value=0.0, interpret: bool = False,
                               slabs=None, flags=None):
    """Entire Merson attempt per shard (k1..k5 + update + error maxima) with
    one ghost-slab exchange.  Returns (next_F, next_U, emax_F, emax_U) with
    SHARD-LOCAL maxima; the caller pmaxes them.

    ``slabs``/``flags``: precomputed ``_ghost_slabs``/``_edge_flags``
    results -- (F, U) are tau-invariant across adaptive retries, so the
    solver hoists the 4 ICI collectives out of the retry while_loop."""
    g = slabs if slabs is not None else _ghost_slabs(F, U, axis_y)
    first, last = flags if flags is not None else _edge_flags(axis_y)
    ny_local, nx_local = F.shape
    out = _fullstep_call_sharded(p, "rkm", interpret, F, U, *g, tau, fu,
                                 dirichlet_value, first, last,
                                 ny_local=ny_local, nx_local=nx_local)
    next_F, next_U, err_F, err_U = out
    return next_F, next_U, jnp.max(err_F), jnp.max(err_U)


def supports_euler2(p: SimParams) -> bool:
    """Whether the fused multi-step Euler kernel handles this config."""
    # the T-fold sweep over (ty+16)-row extended blocks sizes like ~3 states
    return supports(p, n_states=3)


@functools.partial(jax.jit, static_argnames=("p", "interpret", "T"))
def euler2_pallas(F, U, p: SimParams, fu=0.0, dirichlet_value=0.0,
                  interpret: bool = False, T: int = 2):
    """T fused Euler steps (default 2); ``fu`` must be step-invariant (the
    driver gates this path off for the time-dependent exact-solution
    forcing)."""
    ny, nx = p.ny, p.nx
    # larger row-tiles cut the halo-group read amplification (16/ty) and
    # per-program scheduling overhead; the raised vmem_limit_bytes below
    # lifts Mosaic's default 16 MB scoped-VMEM cap
    ty = min(_tile_y(ny, nx, 3, 4, budget=_EULER2_BUDGET), 256)
    grid = ny // ty
    w = _scalar_row([1.0], 1, dirichlet_value, fu, 0.0)
    in_specs, out_specs = _specs(p, ty, 1)
    kernel = _make_euler2_kernel(p, interpret, T)
    shape = jax.ShapeDtypeStruct((ny, nx), jnp.float32)
    flops_per_cell = T * (40 + (60 if p.S != 0.0 else 0))
    out = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[shape, shape],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=flops_per_cell * p.N,
            bytes_accessed=4 * p.N * 4,
            transcendentals=(T * 2 * p.N if p.S != 0.0 else T * p.N),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(w, F, F, F, U, U, U)
    return out[0], out[1]


def supports_euler2_sharded(p: SimParams, ny_local: int,
                            nx_local: int = 0) -> bool:
    """Ghost-slab multi-step Euler feasibility on a y-sharded shard."""
    nx_local = nx_local or p.nx
    return supports_sharded(p, ny_local, 3, nx_local=nx_local)


@functools.partial(jax.jit, static_argnames=("p", "interpret", "T",
                                             "ny_local", "nx_local"))
def _euler2_call_sharded(p: SimParams, interpret: bool, T: int,
                         F, U, gF_lo, gF_hi, gU_lo, gU_hi,
                         fu, dirichlet_value, first, last,
                         ny_local: int = 0, nx_local: int = 0):
    ny, nx = ny_local, nx_local
    ty = min(_tile_y(ny, nx, 3, 4, budget=_EULER2_BUDGET), 256)
    grid = ny // ty
    w = _scalar_row([1.0], 1, dirichlet_value, fu, 0.0, extra=(first, last))
    pl_view = p if (ny == p.ny and nx == p.nx) else p.replace(ny=ny, nx=nx)
    in_specs, out_specs = _specs(pl_view, ty, 1, ghost=True, n_scal=6)
    kernel = _make_euler2_kernel(p, interpret, T, ghost=True)
    shape = jax.ShapeDtypeStruct((ny, nx), jnp.float32)
    flops_per_cell = T * (40 + (60 if p.S != 0.0 else 0))
    out = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[shape, shape],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=flops_per_cell * ny * nx,
            bytes_accessed=4 * ny * nx * 4,
            transcendentals=(T * 2 * ny * nx if p.S != 0.0 else T * ny * nx),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(w, F, F, F, U, U, U, gF_lo, gF_hi, gU_lo, gU_hi)
    return out[0], out[1]


def euler2_pallas_sharded(F, U, p: SimParams, axis_y, fu=0.0,
                          dirichlet_value=0.0, interpret: bool = False,
                          T: int = 2):
    """T fused Euler steps per shard with ONE 8-row ghost-slab exchange
    (the sharded twin of ``euler2_pallas``; T <= 7)."""
    g = _ghost_slabs(F, U, axis_y)
    first, last = _edge_flags(axis_y)
    ny_local, nx_local = F.shape
    return _euler2_call_sharded(p, interpret, T, F, U, *g, fu,
                                dirichlet_value, first, last,
                                ny_local=ny_local, nx_local=nx_local)


def rk4_final_stage_pallas(x, k1, k2, k3, p: SimParams, fu=0.0,
                           dirichlet_value=0.0, interpret: bool = False):
    """Fused RK4 stage 4 + combination: computes k4 = f(x + dt*k3) and
    returns x + dt/6 (k1 + 2 k2 + 2 k3 + k4) without materializing k4.

    x, k1, k2, k3 are (F, U) pairs.
    """
    out = _stage_call([x, k3], [1.0, p.dt], p, "rk4_combine",
                      extra=[k1[0], k1[1], k2[0], k2[1]],
                      fu=fu, dirichlet_value=dirichlet_value,
                      interpret=interpret)
    return out[0], out[1]


def rkm_final_stage_pallas(x, k1, k3, k4, tau, p: SimParams, fu=0.0,
                           dirichlet_value=0.0, interpret: bool = False):
    """Fused Merson stage 5 + final update + error partials.

    Computes k5 = f(x + tau/2 k1 - 3tau/2 k3 + 2tau k4) and returns
    (next_F, next_U, emax_F, emax_U) where emax_* = max|0.2 k1 - 0.9 k3 +
    0.8 k4 - 0.1 k5| (the Merson error combination before the tau/3 factor,
    `simulation.cu:427-438`).  next_* = x + tau/6 (k1 + 4 k4 + k5).
    """
    out = _stage_call([x, k1, k3, k4],
                      [1.0, tau / 2, -3 * tau / 2, 2 * tau],
                      p, "rkm_final", fu=fu, dirichlet_value=dirichlet_value,
                      tau=tau, interpret=interpret)
    next_F, next_U, err_F, err_U = out
    return next_F, next_U, jnp.max(err_F), jnp.max(err_U)
