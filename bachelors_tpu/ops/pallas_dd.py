"""Fused df64 (double-f32) whole-integrator Pallas kernels.

The TPU has no f64 ALU; XLA emulates float64 per-op in software, leaving
every intermediate in HBM: the measured f64 ladder (sweep_r3_f64.json)
pays ~24x over f32 for Euler at 2048^2 and loses to the A100 it is
benchmarked against.  These kernels instead carry every field as a PAIR
of f32 planes (hi, lo) -- `ops/df64.py`, ~2^-48 relative precision, vs
f64's 2^-53 and far below the reference's 5e-9 tolerances -- and run the
WHOLE integrator step in one HBM pass, exactly like the f32
whole-integrator kernels (`pallas_rhs._make_fullstep_kernel`): the RK
stages never touch HBM, and the VPU does ~10-20 f32 ops per df64 op
instead of XLA's per-op emulation + per-op HBM round trips.

Precision contract: the reference's "f64" itself evaluates sqrt/cos in
f32 (`simulation.cu` uses sqrtf/cosf with Real=double), so the df64
path's refined sqrt (~2^-47) meets or beats the precision of every
number the reference's f64 solver actually computes.  The true-f64 XLA
path remains available (`[tpu] backend = xla`) and is the oracle these
kernels are tested against (tests/test_pallas_dd.py).

Scope: Euler (fused T<=8 temporal blocking), RK4 and the Merson attempt
as whole-step kernels; the semi-implicit delta-form prepare and the
mixed-precision refinement residual kernels (`solvers/semi_implicit`);
isotropic AND integer-m0 anisotropic physics (g(theta) via the
angle-addition recurrence -- in f32 under the reference's cosf
semantics, in full pair precision in strict mode); the corrector-guess
RHS (df64 Karp-Markstein division); the corrector loop and gamma != 1
(extra heat-rhs pair through `heat_residual_dd` + the exact Euler pair
rebase in `solvers.explicit.euler_step_based`); y-, x- and 2D-sharded
meshes via (hi, lo) ghost slabs / ghost columns for every solver family
incl. the semi-implicit prepare + the sharded residual kernels (2D
corner data rides a two-phase exchange, see `ghost_slabs_dd`).  The only
fallback to the XLA f64 path is the differentiable (adjoint) path.
Reference parity: the solvers dispatched here implement
`simulation.cu:283-1008` at Real=double.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.params import BoundaryType, SimParams
from . import df64 as dd
from .pallas_rhs import (_EULER2_BUDGET, _col_mask, _roll, _specs, _tile_y)

EULER_DD_BLOCK_STEPS = 4  # fused Euler sub-steps per HBM pass (depth <= 8)
# HBM-regime depth: above the on-chip cache window the pair state (4 f32
# planes) streams from HBM every pass, so deeper blocking keeps winning --
# measured single-process on device (ms/step, T=4 vs T=8): 512^2
# 0.0217/0.0259 (T=4 wins, cache-resident: blocking only adds halo
# recompute), 1024^2 0.0982/0.0915, 2048^2 0.4344/0.3988 (T=8 takes the
# last losing equal-precision row to 1.10x the A100's native-f64 0.4375).
EULER_DD_BLOCK_STEPS_HBM = 8
_EULER_DD_HBM_MIN_CELLS = 1 << 20  # crossover measured between 512^2/1024^2


def euler_dd_block_steps(cells: int) -> int:
    """Temporal-blocking depth for the fused df64 Euler kernel, by the
    (shard-local) cell count."""
    return (EULER_DD_BLOCK_STEPS_HBM if cells >= _EULER_DD_HBM_MIN_CELLS
            else EULER_DD_BLOCK_STEPS)

# test hooks: force a small row tile so interpret-mode tests can exercise
# multi-program grids (halo seams) on small arrays; force interpret mode so
# the SOLVER-level df64 path (wants_dd + while_loop integration) can run on
# CPU under pytest with backend='pallas'
TILE_OVERRIDE = None
FORCE_INTERPRET = False


def _tile_dd(ny: int, nx: int) -> int:
    if TILE_OVERRIDE:
        if ny % TILE_OVERRIDE != 0:
            raise ValueError(f"TILE_OVERRIDE={TILE_OVERRIDE} does not divide "
                             f"ny={ny} (test hook misuse)")
        return TILE_OVERRIDE
    # the rkm stage chain holds ~5 live df64 field pairs = 20 f32 planes
    # on (ty+16)-row extended blocks
    return min(_tile_y(ny, nx, 12, 4, budget=_EULER2_BUDGET), 256)


def supports_dd(p: SimParams) -> bool:
    """Whether the df64 fused kernels handle this config (else XLA f64)."""
    if p.dtype != "float64":
        return False
    if p.S != 0.0:
        # anisotropy needs the integer-m0 angle-addition recurrence (no
        # atan2 on the VPU): f32 under the reference's cosf semantics,
        # full pair precision in strict mode (_g_theta_dd)
        if not (float(p.m0).is_integer() and p.m0 >= 1):
            return False
    if p.nx % 128 != 0 or p.ny % 8 != 0 or p.ny < 16:
        return False
    return _tile_dd(p.ny, p.nx) >= 8


def wants_dd(p: SimParams, topo) -> bool:
    """Backend gate for the df64 path: engages under the same discipline
    as the f32 fused kernels (`ops.rhs._resolve_backend`) -- auto on real
    TPU, forced by backend='pallas', opted out by backend='xla' (which
    keeps true XLA f64 emulation, the oracle)."""
    from .rhs import _on_tpu_or_forced

    return (p.backend != "xla" and not topo.is_sharded
            and supports_dd(p) and _on_tpu_or_forced(p))


def wants_dd_si(p: SimParams, topo, ny_local: int = 0,
                nx_local: int = 0) -> bool:
    """Gate for the df64 semi-implicit path: the dd prepare + f32
    delta-CG with pair-precision iterative refinement + pair add-back
    (`solvers.semi_implicit`); variable-s families (anisotropy,
    corrector-guess) ride the per-cell s map the prepare emits; the
    corrector loop (`simulation.cu:928-1008`) and gamma != 1
    (`simulation.cu:893-899`) ride the extra heat-rhs pair
    (U_base - U) + dt*(1-gamma)*U_base, assembled exactly in XLA f64 and
    threaded through `heat_residual_dd`.  On sharded meshes (y, x or 2D)
    the prepare rides the ghost-slab/column machinery and the residual
    kernels exchange ghost rows/columns of e (`*_dd_sharded` twins; pass
    the local shard shape).  Only the differentiable path (adjoint XLA
    solves) falls back to XLA f64."""
    if p.differentiable:
        return False
    if wants_dd(p, topo):
        return True
    return ny_local > 0 and wants_dd_sharded(p, topo, ny_local, nx_local)


def _g_theta_dd(gx, gy, grad_norm, p: SimParams):
    """Pair-precision anisotropy factor g(theta) = 1 - S cos(m0 theta +
    theta0) for the strict-transcendentals mode: the integer-m0
    angle-addition recurrence of `pallas_rhs._g_theta_vpu`, run entirely
    in df64 on (cos t, sin t) = (gx, gy)/|grad| (the recurrence is pure
    mul/add, so pair arithmetic applies directly; no dd trig needed).
    Zero-gradient cells take (c, s) = (1, 0) like the reference's
    atan2(0, 0) == 0 convention."""
    import math as _math

    safe = grad_norm[0] > 0
    inv_r = dd.div((jnp.ones_like(grad_norm[0]), jnp.zeros_like(grad_norm[0])),
                   (jnp.where(safe, grad_norm[0], 1.0),
                    jnp.where(safe, grad_norm[1], 0.0)))
    c = dd.mul(gx, inv_r)
    s = dd.mul(gy, inv_r)
    c = (jnp.where(safe, c[0], 1.0), jnp.where(safe, c[1], 0.0))
    s = (jnp.where(safe, s[0], 0.0), jnp.where(safe, s[1], 0.0))
    ck, sk = c, s
    for _ in range(int(p.m0) - 1):
        ck, sk = (dd.sub(dd.mul(ck, c), dd.mul(sk, s)),
                  dd.add(dd.mul(sk, c), dd.mul(ck, s)))
    cos_m = dd.sub(dd.mul_const(ck, _math.cos(p.theta0)),
                   dd.mul_const(sk, _math.sin(p.theta0)))
    return dd.cadd(dd.mul_const(cos_m, -p.S), 1.0)


def _make_physics_dd(p: SimParams):
    """df64 twin of `pallas_rhs._make_physics`.

    Anisotropy (S != 0): with f32_transcendentals (the reference's own
    Real=double semantics -- cosf/sqrtf, `simulation.cu:14-17`) the
    factor g(theta) is evaluated in plain f32 from the hi-plane
    gradients via `pallas_rhs._g_theta_vpu`; in strict mode the same
    integer-m0 recurrence runs in full pair precision (`_g_theta_dd`).
    """
    dx, dy = p.dx, p.dy
    inv_2dx, inv_2dy = 1.0 / (2 * dx), 1.0 / (2 * dy)
    inv_dx2, inv_dy2 = 1.0 / (dx * dx), 1.0 / (dy * dy)
    k0_factor = p.a / (p.xi * p.xi * p.alpha)
    k2_factor = p.b * p.beta / p.alpha
    k1_factor = 1.0 / p.alpha
    # square cells (every shipped/benchmark config): the 5-point stencil
    # collapses to ONE raw neighbor sum times one constant, and lap_F's
    # constant additionally absorbs k1_factor = 1/alpha (g(theta)
    # multiplies AFTER, so the fold holds for S != 0 too) -- ~50 VPU
    # flops/cell-step saved per field vs the per-axis form (the Euler dd
    # kernel is VPU-roofline-bound, RESULTS.md)
    square = dx == dy

    def lap(C, N, S, E, W, scale: float):
        if square:
            raw = dd.add(dd.add(dd.add(W, E), dd.add(S, N)),
                         dd.mul_pow2(C, -4.0))
            return dd.mul_const(raw, inv_dx2 * scale)
        lxy = dd.add(
            dd.mul_const(dd.add(dd.add(W, E), dd.mul_pow2(C, -2.0)),
                         inv_dx2),
            dd.mul_const(dd.add(dd.add(S, N), dd.mul_pow2(C, -2.0)),
                         inv_dy2))
        return dd.mul_const(lxy, scale) if scale != 1.0 else lxy

    def phys(Fc, F_N, F_S, F_E, F_W, Uc, U_N, U_S, U_E, U_W, fu):
        # k1_lap = lap(F)/alpha with the 1/alpha folded into the stencil
        # constant on square cells; lap_U stays unscaled (dt_U needs it)
        k1_lap = lap(Fc, F_N, F_S, F_E, F_W, k1_factor if square else 1.0)
        lap_U = lap(Uc, U_N, U_S, U_E, U_W, 1.0)
        # NOTE: the f32 kernels' round-5 gradient fold (raw differences,
        # scale deferred into k2) is deliberately NOT applied here: it
        # measured +0.1% on the dd Euler step (the two saved pair
        # multiplies are noise next to the pair laplacians), so the
        # validated rounding path is kept as-is
        gx = dd.mul_const(dd.sub(F_E, F_W), inv_2dx)
        gy = dd.mul_const(dd.sub(F_N, F_S), inv_2dy)
        if p.f32_transcendentals:
            # reference semantics: |grad| in f32 even at Real=double
            # (`simulation.cu:14-17`; `models/allen_cahn.anisotropy_factor`).
            # k2_factor folds into the f32 norm (one more f32 rounding on a
            # value already rounded to f32 -- within the same semantics)
            r2 = gx[0] * gx[0] + gy[0] * gy[0]
            grad_norm = (jnp.sqrt(r2), jnp.zeros_like(r2))
            k2_32 = grad_norm[0] * jnp.float32(k2_factor)
            k2 = (k2_32, grad_norm[1])
            k2_mul = lambda x: dd.mul_f32(x, k2_32)  # lo(k2) == 0 exactly
        else:
            grad_norm = dd.sqrt0(dd.add(dd.sqr(gx), dd.sqr(gy)))
            k2 = dd.mul_const(grad_norm, k2_factor)
            k2_mul = lambda x: dd.mul(x, k2)
        k0 = dd.mul_const(
            dd.mul(dd.mul(Fc, dd.add_f32(dd.neg(Fc), 1.0)),
                   dd.cadd(Fc, -0.5)), k0_factor)
        if not square:
            k1_lap = dd.mul_const(k1_lap, k1_factor)
        if p.S != 0.0:
            if p.f32_transcendentals:
                from .pallas_rhs import _g_theta_vpu

                g32 = _g_theta_vpu(gx[0], gy[0], grad_norm[0], p)
                k0 = dd.mul_f32(k0, g32)
                k1_lap = dd.mul_f32(k1_lap, g32)
            else:
                g = _g_theta_dd(gx, gy, grad_norm, p)
                k0 = dd.mul(k0, g)
                k1_lap = dd.mul(k1_lap, g)
        if p.do_corrector_guess:
            # implicit-in-U guess (`simulation.cu:216-226`):
            #   dt_F = (k1 lap + k0 - k2 (U - Tm + dt lap_U)) / (1 + k2 dt L)
            num = dd.sub(dd.add(k1_lap, k0),
                         k2_mul(dd.add(dd.cadd(Uc, -p.Tm),
                                       dd.mul_const(lap_U, p.dt))))
            corr = dd.add_f32(dd.mul_const(k2, p.dt * p.L), 1.0)
            dt_F = dd.div(num, corr)
        else:
            dt_F = dd.sub(dd.add(k1_lap, k0), k2_mul(dd.cadd(Uc, -p.Tm)))
        dt_U = dd.add(dd.add(lap_U, dd.mul_const(dt_F, p.L)), fu)
        return dt_F, dt_U

    return phys


def _shift_x_dd(A, bc: BoundaryType, dv):
    """df64 east/west neighbors: `pallas_rhs._shift_x` per component, with
    the Dirichlet mirror image computed in df64."""
    hi, lo = A
    nx = hi.shape[1]
    east = (_roll(hi, -1, 1), _roll(lo, -1, 1))
    west = (_roll(hi, 1, 1), _roll(lo, 1, 1))
    if bc == BoundaryType.PERIODIC:
        return east, west
    if bc == BoundaryType.NEUMANN:
        img = A
    else:  # DIRICHLET: ghost = 2*dv - edge
        img = dd.sub(dd.mul_pow2(dv, 2.0), A)
    me, mw = _col_mask(hi, nx - 1), _col_mask(hi, 0)
    east = (jnp.where(me, img[0], east[0]), jnp.where(me, img[1], east[1]))
    west = (jnp.where(mw, img[0], west[0]), jnp.where(mw, img[1], west[1]))
    return east, west


def _make_fullstep_kernel_dd(p: SimParams, scheme: str, T: int = 1,
                             ghost: bool = False, ghost_x: bool = False):
    """df64 twin of `pallas_rhs._make_fullstep_kernel` + the fused
    multi-step Euler mode.

      scheme="euler": T forward-Euler steps per pass (depth T <= 8).
      scheme="rk4":   one classic RK4 step (stage depth 4).
      scheme="rkm":   one Merson attempt at the SMEM-supplied df64 tau;
                      also writes per-program partial maxima of the error
                      combination |0.2k1 - 0.9k3 + 0.8k4 - 0.1k5| (f32 --
                      the estimate is compared against tolerances orders
                      of magnitude above df64 noise).
      scheme="si":    semi-implicit DELTA-form prepare
                      (`models.allen_cahn.semi_implicit_prepare`,
                      isotropic no-guess family): emits r0_F = dt*dt_F and
                      uterm = dt*lap(U) as f32 PAIRS -- the hi planes feed
                      the f32 delta CG (the deltas are O(dt)-scale), the
                      lo planes feed the pair-precision refinement
                      residual (`cross_residual_dd`).

    Ref layout: scal (1, 6..10) SMEM [d_hi, d_lo, fu_hi, fu_lo, tau_hi,
    tau_lo (+ shard_first, shard_last when ghost) (+ shard_x_first,
    shard_x_last when ghost_x)]; 12 field blocks (hi planes then lo
    planes, each as center + 8-row halo groups); ghost mode adds 8
    neighbor-slab blocks; ghost_x mode adds 24 ghost-COLUMN blocks (8
    (ny, 128) arrays, each as center + 8-row halo groups -- the x-sharded
    twin of the slabs: the kernel concatenates them on both sides of the
    center block, so the stage chain reads the x-neighbor's 8 edge
    columns at depth <= 8 exactly like the y slabs; on 2D meshes the y
    slabs are width nx+256 and carry the diagonal neighbor's corner data,
    see ``ghost_slabs_dd``); outputs [Fh, Uh, Fl, Ul (+ errF, errU)]
    (si: [r0h, uth, r0l, utl]).
    """
    assert scheme in ("euler", "rk4", "rkm", "si")
    if not 1 <= T <= 8:
        # the 8-row halo groups feed exactly 8 valid stencil applications;
        # deeper temporal blocking would silently corrupt interior tile
        # seams rather than error
        raise ValueError(f"euler temporal-blocking depth T={T} outside the "
                         "halo budget 1..8")
    f_bc, u_bc = p.Phi_boundary, p.T_boundary
    phys = _make_physics_dd(p)

    def kernel(*refs):
        (scal, Fhc, Fhn, Fhs, Uhc, Uhn, Uhs,
         Flc, Fln, Fls, Ulc, Uln, Uls) = refs[:13]
        rest = refs[13:]
        if ghost:
            (gFh_lo, gFh_hi, gUh_lo, gUh_hi,
             gFl_lo, gFl_hi, gUl_lo, gUl_hi) = rest[:8]
            rest = rest[8:]
        if ghost_x:
            gcol_blocks = rest[:24]
            rest = rest[24:]
        outs = rest
        d = (scal[0, 0], scal[0, 1])
        fu = (scal[0, 2], scal[0, 3])
        tau = (scal[0, 4], scal[0, 5])
        i_flag = 6
        if ghost:
            # global-domain-edge flags (from lax.axis_index, via SMEM)
            shard_first = scal[0, i_flag] > 0.5
            shard_last = scal[0, i_flag + 1] > 0.5
            i_flag += 2
        if ghost_x:
            shard_x_first = scal[0, i_flag] > 0.5
            shard_x_last = scal[0, i_flag + 1] > 0.5

        extF = (jnp.concatenate([Fhs[:], Fhc[:], Fhn[:]], axis=0),
                jnp.concatenate([Fls[:], Flc[:], Fln[:]], axis=0))
        extU = (jnp.concatenate([Uhs[:], Uhc[:], Uhn[:]], axis=0),
                jnp.concatenate([Uls[:], Ulc[:], Uln[:]], axis=0))

        if ghost_x:
            # extend the block in x with the ghost-column arrays (west
            # data in lanes 120..127, east in lanes 0..7 -- adjacent to
            # the center after the concat).  Their own 8-row halo groups
            # carry the x-neighbor's y-halo rows (same index maps as the
            # fields); at y-shard-edge programs the spliced slabs below
            # overwrite those rows with true (corner-correct) data.
            def gext(k):
                c, n, s = gcol_blocks[3 * k], gcol_blocks[3 * k + 1], \
                    gcol_blocks[3 * k + 2]
                return jnp.concatenate([s[:], c[:], n[:]], axis=0)

            wFh, eFh, wUh, eUh, wFl, eFl, wUl, eUl = (
                gext(k) for k in range(8))
            extF = (jnp.concatenate([wFh, extF[0], eFh], axis=1),
                    jnp.concatenate([wFl, extF[1], eFl], axis=1))
            extU = (jnp.concatenate([wUh, extU[0], eUh], axis=1),
                    jnp.concatenate([wUl, extU[1], eUl], axis=1))

        tye = extF[0].shape[0]
        nxe = extF[0].shape[1]
        ty = outs[0].shape[0]
        nx = outs[0].shape[1]
        c0 = 128 if ghost_x else 0

        if ghost:
            # neighbor-shard slabs replace the (wrong) same-shard halo rows
            # at shard-edge programs, per pair component
            # (`pallas_rhs._splice_slabs`); width nxe on 2D meshes
            from .pallas_rhs import _splice_slabs

            extF = (_splice_slabs(extF[0], gFh_lo, gFh_hi),
                    _splice_slabs(extF[1], gFl_lo, gFl_hi))
            extU = (_splice_slabs(extU[0], gUh_lo, gUh_hi),
                    _splice_slabs(extU[1], gUl_lo, gUl_hi))

        def fix(ext, bc, dv):
            # BC images in the 8-row edge regions of edge programs
            # (`_make_fullstep_kernel.fix`), per df64 component
            if bc == BoundaryType.PERIODIC:
                return ext  # (sharded: the ring-ppermuted slabs ARE the wrap)
            i = pl.program_id(0)
            n = pl.num_programs(0)
            rows = jax.lax.broadcasted_iota(jnp.int32, ext[0].shape, 0)
            lo_img = (ext[0][8:9], ext[1][8:9])
            hi_img = (ext[0][tye - 9:tye - 8], ext[1][tye - 9:tye - 8])
            if bc == BoundaryType.DIRICHLET:
                tw = dd.mul_pow2(dv, 2.0)
                lo_img = dd.sub(tw, lo_img)
                hi_img = dd.sub(tw, hi_img)
            lo_mask = jnp.logical_and(rows < 8, i == 0)
            hi_mask = jnp.logical_and(rows >= tye - 8, i == n - 1)
            if ghost:
                # BC images only at GLOBAL domain edges; interior shard
                # seams keep the spliced neighbor rows
                lo_mask = jnp.logical_and(lo_mask, shard_first)
                hi_mask = jnp.logical_and(hi_mask, shard_last)
            h = jnp.where(lo_mask, lo_img[0], ext[0])
            h = jnp.where(hi_mask, hi_img[0], h)
            l = jnp.where(lo_mask, lo_img[1], ext[1])
            l = jnp.where(hi_mask, hi_img[1], l)
            return (h, l)

        def fix_x(ext, bc, dv):
            # x twin of `fix`, applied AFTER it (matching the y-then-x pad
            # order of `topo.pad`, which decides the corner images): at
            # global-x-edge shards overwrite the whole 128-lane ghost
            # region with the BC image of the adjacent real column (clamp
            # semantics / Dirichlet mirror); interior shards and periodic
            # keep the ring-ppermuted neighbor lanes
            if not ghost_x or bc == BoundaryType.PERIODIC:
                return ext
            cols = jax.lax.broadcasted_iota(jnp.int32, ext[0].shape, 1)
            w_img = (ext[0][:, 128:129], ext[1][:, 128:129])
            e_img = (ext[0][:, nxe - 129:nxe - 128],
                     ext[1][:, nxe - 129:nxe - 128])
            if bc == BoundaryType.DIRICHLET:
                tw = dd.mul_pow2(dv, 2.0)
                w_img = dd.sub(tw, w_img)
                e_img = dd.sub(tw, e_img)
            w_mask = jnp.logical_and(cols < 128, shard_x_first)
            e_mask = jnp.logical_and(cols >= nxe - 128, shard_x_last)
            h = jnp.where(w_mask, w_img[0], ext[0])
            h = jnp.where(e_mask, e_img[0], h)
            l = jnp.where(w_mask, w_img[1], ext[1])
            l = jnp.where(e_mask, e_img[1], l)
            return (h, l)

        def out_slice(a):
            return a[8:8 + ty, 128:128 + nx] if ghost_x else a[8:8 + ty]

        def rhs_at(bF, bU, dv):
            F_N = (_roll(bF[0], -1, 0), _roll(bF[1], -1, 0))
            F_S = (_roll(bF[0], 1, 0), _roll(bF[1], 1, 0))
            U_N = (_roll(bU[0], -1, 0), _roll(bU[1], -1, 0))
            U_S = (_roll(bU[0], 1, 0), _roll(bU[1], 1, 0))
            if ghost_x:
                # ghost lanes carry the true x-neighbors (or, at global-x
                # edges, the per-stage fix_x images): plain rotates, no
                # edge-column fixup
                F_E = (_roll(bF[0], -1, 1), _roll(bF[1], -1, 1))
                F_W = (_roll(bF[0], 1, 1), _roll(bF[1], 1, 1))
                U_E = (_roll(bU[0], -1, 1), _roll(bU[1], -1, 1))
                U_W = (_roll(bU[0], 1, 1), _roll(bU[1], 1, 1))
            else:
                F_E, F_W = _shift_x_dd(bF, f_bc, dv)
                U_E, U_W = _shift_x_dd(bU, u_bc, dv)
            return phys(bF, F_N, F_S, F_E, F_W, bU, U_N, U_S, U_E, U_W, fu)

        if scheme == "euler":
            bF, bU = extF, extU
            for _ in range(T):
                bF = fix_x(fix(bF, f_bc, d), f_bc, d)
                bU = fix_x(fix(bU, u_bc, d), u_bc, d)
                kF, kU = rhs_at(bF, bU, d)
                bF = dd.add(bF, dd.mul_const(kF, p.dt))
                bU = dd.add(bU, dd.mul_const(kU, p.dt))
            outs[0][:] = out_slice(bF[0])
            outs[1][:] = out_slice(bU[0])
            outs[2][:] = out_slice(bF[1])
            outs[3][:] = out_slice(bU[1])
            return

        if scheme == "si":
            from .pallas_rhs import si_s_varies

            bF = fix_x(fix(extF, f_bc, d), f_bc, d)
            bU = fix_x(fix(extU, u_bc, d), u_bc, d)
            dt_F, dt_U = rhs_at(bF, bU, d)
            # r0_F = dt * dt_F exactly, in BOTH prepare variants
            # (`allen_cahn.semi_implicit_prepare`: the guess variant's
            # dt/corr*(...) IS the guess-mode dt_F); phys returns
            # dt_U = lap_U + L*dt_F (+fu == 0 here), so lap_U is
            # recovered by an exact df64 subtraction.  Both residuals are
            # emitted as PAIRS: the hi planes feed the f32 CG and the lo
            # planes feed the iterative-refinement residual
            # (cross_residual_dd), which needs r0 beyond f32 rounding.
            r0 = dd.mul_const(dt_F, p.dt)
            lap_U = dd.sub(dt_U, dd.mul_const(dt_F, p.L))
            ut = dd.mul_const(lap_U, p.dt)
            outs[0][:] = out_slice(r0[0])
            outs[1][:] = out_slice(ut[0])
            outs[2][:] = out_slice(r0[1])
            outs[3][:] = out_slice(ut[1])
            if si_s_varies(p):
                # per-cell matvec coefficient s = gamma (/corr) * g * k1f
                # (`semi_implicit_prepare`); f32 like the f32 path's map
                # -- s only parameterizes the OPERATOR of the delta solve,
                # so its f32 rounding perturbs A by ~ulp, orders below the
                # solve tolerance (and the refinement residual uses the
                # same map, so the solved system is self-consistent)
                from .pallas_rhs import _g_theta_vpu

                if ghost_x:
                    F_E = (_roll(bF[0], -1, 1), _roll(bF[1], -1, 1))
                    F_W = (_roll(bF[0], 1, 1), _roll(bF[1], 1, 1))
                else:
                    F_E, F_W = _shift_x_dd(bF, f_bc, d)
                F_N = _roll(bF[0], -1, 0)
                F_S = _roll(bF[0], 1, 0)
                gxh = (F_E[0] - F_W[0]) * jnp.float32(1.0 / (2 * p.dx))
                gyh = (F_N - F_S) * jnp.float32(1.0 / (2 * p.dy))
                gn = jnp.sqrt(gxh * gxh + gyh * gyh)
                g32 = _g_theta_vpu(gxh, gyh, gn, p)
                k1f = jnp.float32(1.0 / p.alpha)
                s32 = jnp.float32(p.gamma) * k1f * (
                    g32 if g32 is not None else jnp.float32(1.0))
                if p.do_corrector_guess:
                    k2_32 = gn * jnp.float32(p.b * p.beta / p.alpha)
                    s32 = s32 / (1 + k2_32 * jnp.float32(p.dt * p.L))
                outs[4][:] = out_slice(s32)
            return

        xF = fix_x(fix(extF, f_bc, d), f_bc, d)
        xU = fix_x(fix(extU, u_bc, d), u_bc, d)

        def stage(ks, ws):
            """k = f(x + sum_i w_i k_i), ws df64 scalars; ghost fix at the
            blend's effective Dirichlet value d * (1 + sum w)."""
            bF, bU = xF, xU
            wsum = (jnp.float32(1.0), jnp.float32(0.0))
            for (kF_i, kU_i), w in zip(ks, ws):
                bF = dd.add(bF, dd.mul(kF_i, w))
                bU = dd.add(bU, dd.mul(kU_i, w))
                wsum = dd.add(wsum, w)
            dv = dd.mul(d, wsum)
            bF = fix_x(fix(bF, f_bc, dv), f_bc, dv)
            bU = fix_x(fix(bU, u_bc, dv), u_bc, dv)
            return rhs_at(bF, bU, dv)

        k1 = stage([], [])
        if scheme == "rk4":
            w_half = tuple(map(jnp.float32, dd.const(p.dt / 2)))
            w_full = tuple(map(jnp.float32, dd.const(p.dt)))
            k2 = stage([k1], [w_half])
            k3 = stage([k2], [w_half])
            k4 = stage([k3], [w_full])
            acc_F = dd.add(dd.add(k1[0], dd.mul_pow2(dd.add(k2[0], k3[0]), 2.0)),
                           k4[0])
            acc_U = dd.add(dd.add(k1[1], dd.mul_pow2(dd.add(k2[1], k3[1]), 2.0)),
                           k4[1])
            nF = dd.add(xF, dd.mul_const(acc_F, p.dt / 6))
            nU = dd.add(xU, dd.mul_const(acc_U, p.dt / 6))
        else:  # rkm
            w2 = dd.mul_const(tau, 1.0 / 3.0)
            w3 = dd.mul_const(tau, 1.0 / 6.0)
            w4a = dd.mul_pow2(tau, 0.125)
            w4b = dd.mul_const(tau, 0.375)
            w5a = dd.mul_pow2(tau, 0.5)
            w5b = dd.mul_const(tau, -1.5)
            w5c = dd.mul_pow2(tau, 2.0)
            k2 = stage([k1], [w2])
            k3 = stage([k1, k2], [w3, w3])
            k4 = stage([k1, k3], [w4a, w4b])
            k5 = stage([k1, k3, k4], [w5a, w5b, w5c])
            c6 = dd.mul_const(tau, 1.0 / 6.0)
            acc_F = dd.add(dd.add(k1[0], dd.mul_pow2(k4[0], 4.0)), k5[0])
            acc_U = dd.add(dd.add(k1[1], dd.mul_pow2(k4[1], 4.0)), k5[1])
            nF = dd.add(xF, dd.mul(acc_F, c6))
            nU = dd.add(xU, dd.mul(acc_U, c6))

            def comb(c1, c3, c4, c5):
                # 0.2c1 - 0.9c3 + 0.8c4 - 0.1c5 in df64: the catastrophic
                # cancellation that floors the f32 controller at ~2.3e-7
                # (RESULTS.md) resolves at ~2^-48 * max|k| here
                e = dd.sub(dd.mul_const(c1, 0.2), dd.mul_const(c3, 0.9))
                e = dd.add(e, dd.sub(dd.mul_const(c4, 0.8),
                                     dd.mul_const(c5, 0.1)))
                return jnp.abs(e[0] + e[1])

            # error maxima over the CENTER rows/columns only (halo rows
            # belong to neighbor blocks; ghost lanes to neighbor shards)
            eF = jnp.max(out_slice(comb(k1[0], k3[0], k4[0], k5[0])))
            eU = jnp.max(out_slice(comb(k1[1], k3[1], k4[1], k5[1])))
            outs[4][:] = jnp.full(outs[4].shape, eF)
            outs[5][:] = jnp.full(outs[5].shape, eU)

        outs[0][:] = out_slice(nF[0])
        outs[1][:] = out_slice(nU[0])
        outs[2][:] = out_slice(nF[1])
        outs[3][:] = out_slice(nU[1])

    return kernel


def _fullstep_call_dd(p: SimParams, scheme: str, interpret: bool, T: int,
                      Fh, Fl, Uh, Ul, scal, ghosts=None, gcols=None):
    # interpret mode also goes through jit: eager op-by-op execution of
    # the interpreter's df64 stage chains takes minutes per call at test
    # sizes, and with the EFT guards (df64.eft_guards) the compiled
    # XLA:CPU path is exact
    return _fullstep_jit_dd(p, scheme, interpret, T, Fh, Fl, Uh, Ul, scal,
                            ghosts, gcols)


@functools.partial(jax.jit, static_argnames=("p", "scheme", "interpret", "T"))
def _fullstep_jit_dd(p: SimParams, scheme: str, interpret: bool, T: int,
                     Fh, Fl, Uh, Ul, scal, ghosts=None, gcols=None):
    return _fullstep_impl_dd(p, scheme, interpret, T, Fh, Fl, Uh, Ul, scal,
                             ghosts, gcols)


def _fullstep_impl_dd(p: SimParams, scheme: str, interpret: bool, T: int,
                      Fh, Fl, Uh, Ul, scal, ghosts=None, gcols=None):
    ny, nx = Fh.shape  # local shard shape (== p.ny/p.nx single-chip)
    ghost = ghosts is not None
    ghost_x = gcols is not None
    nxe = nx + 256 if ghost_x else nx  # in-kernel extended width
    ty = _tile_dd(ny, nxe)
    grid = ny // ty
    with_err = scheme == "rkm"
    from .pallas_rhs import make_halo_row_maps, si_s_varies

    n_out = 5 if (scheme == "si" and si_s_varies(p)) else 4
    n_scal = 6 + (2 if ghost else 0) + (2 if ghost_x else 0)
    # the spec view carries the LOCAL shape; physics constants keep the
    # global p (dx/dy derive from the global grid)
    pv = p if (ny == p.ny and nx == p.nx) else p.replace(ny=ny, nx=nx)
    in_specs, out_specs = _specs(pv, ty, 2, with_err=with_err, n_out=n_out,
                                 n_scal=n_scal)
    if ghost:
        # 8 ghost-slab specs (hi-plane lo/hi pairs then lo-plane); width
        # nxe on 2D meshes, where the slabs are x-extended (corner data)
        for _ in range(8):
            in_specs.append(pl.BlockSpec((8, nxe), lambda i: (0, 0),
                                         memory_space=pltpu.VMEM))
    if ghost_x:
        # each of the 8 (ny, 128) ghost-column arrays rides the same
        # center + halo-row-group machinery as the fields (its y-halo
        # rows are needed by the stage chain), with the BC-matched index
        # maps; order (gFh_w, gFh_e, gUh_w, gUh_e, gFl_w, gFl_e, gUl_w,
        # gUl_e) -- see ghost_cols_dd
        center = lambda i: (i, 0)
        for bc in (p.Phi_boundary, p.Phi_boundary,
                   p.T_boundary, p.T_boundary) * 2:
            north, south = make_halo_row_maps(ny, ty, bc)
            in_specs += [
                pl.BlockSpec((ty, 128), center, memory_space=pltpu.VMEM),
                pl.BlockSpec((8, 128), north, memory_space=pltpu.VMEM),
                pl.BlockSpec((8, 128), south, memory_space=pltpu.VMEM)]
    kernel = _make_fullstep_kernel_dd(p, scheme, T, ghost=ghost,
                                      ghost_x=ghost_x)
    shape = jax.ShapeDtypeStruct((ny, nx), jnp.float32)
    out_shape = [shape] * n_out
    if with_err:
        err_shape = jax.ShapeDtypeStruct((grid * 8, 128), jnp.float32)
        out_shape += [err_shape, err_shape]
    n_stages = {"euler": T, "rk4": 4, "rkm": 5, "si": 1}[scheme]
    args = (scal, Fh, Fh, Fh, Uh, Uh, Uh, Fl, Fl, Fl, Ul, Ul, Ul)
    if ghost:
        args += tuple(ghosts)
    if ghost_x:
        args += tuple(g for g in gcols for _ in range(3))
    # interpret mode executes on XLA:CPU, whose LLVM codegen contracts
    # mul+add into FMA and silently breaks the df64 error-free
    # transforms; trace with the contraction guards there (off on the
    # Mosaic path -- see df64.eft_guards).  x64 is disabled during the
    # trace: the callers run under jax_enable_x64 (f64 configs), which
    # makes python ints in BlockSpec index maps and kernel iota/masks
    # trace as i64 -- Mosaic cannot legalize those -- while everything
    # this kernel computes is f32 pairs anyway.
    with jax.enable_x64(False), dd.eft_guards(interpret):
        out = pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=interpret,
            cost_estimate=pl.CostEstimate(
                flops=n_stages * 600 * ny * nx,  # ~15 f32 flops per df64 op
                bytes_accessed=8 * ny * nx * 4,
                transcendentals=n_stages * ny * nx,
            ),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(*args)
    return tuple(out)


def _split_scalar(x):
    """f64 (or python) scalar -> (hi, lo) f32 pair; traced f64 inputs
    require x64 mode (the driver enables it for float64 configs)."""
    if isinstance(x, (int, float)):
        hi, lo = dd.const(float(x))
        return jnp.float32(hi), jnp.float32(lo)
    x = jnp.asarray(x)
    if x.dtype == jnp.float64:
        hi = x.astype(jnp.float32)
        return hi, (x - hi.astype(jnp.float64)).astype(jnp.float32)
    return x.astype(jnp.float32), jnp.zeros_like(x, jnp.float32)


def _scal_row(dirichlet_value, fu, tau, extra=()):
    parts = []
    for v in (dirichlet_value, fu, tau):
        parts += list(_split_scalar(v))
    parts += list(extra)  # ghost mode: (shard_first, shard_last) flags
    n = 6 + len(extra)
    return jnp.stack([jnp.asarray(v, jnp.float32) for v in parts]).reshape(1, n)


# --- pair-level API (df64 state carried by the caller; no conversions) ---

def euler_steps_dd_pair(pair, p: SimParams, T: int = EULER_DD_BLOCK_STEPS,
                        fu=0.0, dirichlet_value=0.0, interpret=False):
    """T fused Euler steps on a (Fh, Fl, Uh, Ul) df64 state."""
    Fh, Fl, Uh, Ul = pair
    o = _fullstep_call_dd(p, "euler", interpret or FORCE_INTERPRET, T,
                          Fh, Fl, Uh, Ul, _scal_row(dirichlet_value, fu, 0.0))
    return (o[0], o[2], o[1], o[3])


def rk4_full_dd_pair(pair, p: SimParams, fu=0.0, dirichlet_value=0.0,
                     interpret=False):
    Fh, Fl, Uh, Ul = pair
    o = _fullstep_call_dd(p, "rk4", interpret or FORCE_INTERPRET, 1,
                          Fh, Fl, Uh, Ul, _scal_row(dirichlet_value, fu, 0.0))
    return (o[0], o[2], o[1], o[3])


def rkm_attempt_dd_pair(pair, tau, p: SimParams, fu=0.0, dirichlet_value=0.0,
                        interpret=False):
    """One Merson attempt; returns ((Fh,Fl,Uh,Ul), emax_F, emax_U) with the
    error maxima as f32 scalars."""
    Fh, Fl, Uh, Ul = pair
    o = _fullstep_call_dd(p, "rkm", interpret or FORCE_INTERPRET, 1,
                          Fh, Fl, Uh, Ul, _scal_row(dirichlet_value, fu, tau))
    return (o[0], o[2], o[1], o[3]), jnp.max(o[4]), jnp.max(o[5])


def si_prepare_dd_pair(pair, p: SimParams, dirichlet_value=0.0,
                       interpret=False):
    """Delta-form semi-implicit prepare on a df64 pair state: returns
    ((r0_F hi, lo), (uterm hi, lo)[, s]) -- f32 pairs plus the per-cell
    matvec coefficient map when it varies (`si_s_varies`)."""
    Fh, Fl, Uh, Ul = pair
    o = _fullstep_call_dd(p, "si", interpret or FORCE_INTERPRET, 1,
                          Fh, Fl, Uh, Ul, _scal_row(dirichlet_value, 0.0, 0.0))
    if len(o) > 4:
        return (o[0], o[2]), (o[1], o[3]), o[4]
    return (o[0], o[2]), (o[1], o[3])


def _make_cross_residual_kernel(bc: BoundaryType, C: float, X: float,
                                Y: float, heat_L=None, aniso: bool = False,
                                has_extra: bool = False,
                                ghost: bool = False,
                                ghost_x: bool = False):
    """r1 = r0 - A e in df64, A the constant cross operator
    (`ops.stencil.cross_matvec` semantics incl. its topo.pad ghosts with
    dirichlet_value=0: Neumann ghost=edge, Dirichlet ghost=-edge).

    heat_L: when set, r0 is built in-kernel as L*(e1_F + e2_F) + uterm
    (the heat system's delta rhs, `solvers/semi_implicit`), with (e1_F,
    e2_F) supplied as two extra planes forming a pair.

    has_extra (heat mode only): two more planes forming an additional
    rhs pair added to r0 -- the corrector/gamma terms
    (U_base - U) + dt*(1-gamma)*U_base (`simulation.cu:893-899,928-1008`).

    aniso: A is the variable-coefficient operator
    (1 + C*s) e + X*s (E+W) + Y*s (N+S) with a per-cell f32 map s
    (`ops.stencil.anisotropy_matvec` semantics) supplied as one extra
    plane; (C, X, Y) are then (Cm1, X, Y) of `AnisotropyMatrix`.

    ghost (y-sharded meshes): two (8, nx) slabs from
    `pallas_rhs._ghost_rows` (row 0 = the neighbor shard's edge row of e,
    with the global-edge BC image already applied outside) replace the
    same-shard halo rows the stencil reads at shard-edge programs; the
    in-kernel row BC is skipped entirely.

    ghost_x (x-sharded meshes): two (ny, 128) ghost-column arrays from
    `_ghost_cols_e` (west data in lane 127, east in lane 0, global-edge
    BC image already applied outside, each with its own halo row groups)
    are concatenated onto the block; the in-kernel column BC is skipped.
    """
    def kernel(*refs):
        x1 = x2 = None
        rest = list(refs[5:-1])
        ec, en, es, r0h, r0l = refs[:5]
        out = refs[-1]
        s_ref = f1 = f2 = None
        if aniso:
            s_ref = rest.pop(0)
        elif heat_L is not None:
            f1, f2 = rest.pop(0), rest.pop(0)
            if has_extra:
                x1, x2 = rest.pop(0), rest.pop(0)
        if ghost:
            g_lo, g_hi = rest[:2]
            rest = rest[2:]
        ext = jnp.concatenate([es[:], ec[:], en[:]], axis=0)
        if ghost_x:
            (wc, wn, ws, ecol, enx, esx) = rest
            wext = jnp.concatenate([ws[:], wc[:], wn[:]], axis=0)
            eext = jnp.concatenate([esx[:], ecol[:], enx[:]], axis=0)
            ext = jnp.concatenate([wext, ext, eext], axis=1)
        tye = ext.shape[0]
        ty = out.shape[0]
        nxc = out.shape[1]
        ctr = (lambda a: a[8:8 + ty, 128:128 + nxc]) if ghost_x \
            else (lambda a: a[8:8 + ty])
        if ghost:
            # the 1-point stencil reads only ext[7] (S of the first center
            # row) and ext[tye-8] (N of the last); patch those from the
            # ppermuted neighbor rows at shard-edge programs -- interior
            # programs keep their (correct) same-shard halo rows
            i = pl.program_id(0)
            n = pl.num_programs(0)
            rows = jax.lax.broadcasted_iota(jnp.int32, ext.shape, 0)
            ext = jnp.where(jnp.logical_and(rows == 7, i == 0),
                            g_lo[0:1], ext)
            ext = jnp.where(jnp.logical_and(rows == tye - 8, i == n - 1),
                            g_hi[0:1], ext)
        elif bc != BoundaryType.PERIODIC:
            i = pl.program_id(0)
            n = pl.num_programs(0)
            rows = jax.lax.broadcasted_iota(jnp.int32, ext.shape, 0)
            lo_img = ext[8:9]
            hi_img = ext[tye - 9:tye - 8]
            if bc == BoundaryType.DIRICHLET:
                lo_img, hi_img = -lo_img, -hi_img  # pad value 0: ghost=-edge
            ext = jnp.where(jnp.logical_and(rows < 8, i == 0), lo_img, ext)
            ext = jnp.where(jnp.logical_and(rows >= tye - 8, i == n - 1),
                            hi_img, ext)
        N = _roll(ext, -1, 0)
        S = _roll(ext, 1, 0)
        E = _roll(ext, -1, 1)
        W = _roll(ext, 1, 1)
        if ghost_x:
            pass  # ghost lanes carry the true x-neighbors (BC pre-applied)
        elif bc != BoundaryType.PERIODIC:
            img = -ext if bc == BoundaryType.DIRICHLET else ext
            nx = ext.shape[1]
            E = jnp.where(_col_mask(ext, nx - 1), img, E)
            W = jnp.where(_col_mask(ext, 0), img, W)
        # A e in pair precision: e and its neighbors are exact f32, the
        # neighbor sums are TwoSum pairs, the coefficient products df64
        zero = jnp.zeros_like(ext)

        def neighbor_term():
            # square cells have X == Y (the shipped configs): one raw
            # neighbor sum times one pair constant
            ew = dd.add((E, zero), (W, zero))
            ns = dd.add((N, zero), (S, zero))
            if X == Y:
                return dd.mul_const(dd.add(ew, ns), X)
            return dd.add(dd.mul_const(ew, X), dd.mul_const(ns, Y))

        if aniso:
            # (1 + Cm1 s) e + X s (E+W) + Y s (N+S)
            #   = e + s * (Cm1 e + X (E+W) + Y (N+S))
            cross = dd.add(dd.mul_const((ext, zero), C), neighbor_term())
            sc = ctr(cross[0]), ctr(cross[1])
            Ae = dd.add((ctr(ext), ctr(zero)),
                        dd.mul_f32(sc, s_ref[:]))
        else:
            full = dd.add(dd.mul_const((ext, zero), C), neighbor_term())
            Ae = (ctr(full[0]), ctr(full[1]))
        r0 = (r0h[:], r0l[:])
        if heat_L is not None:
            # r0 := L * (e1_F + e2_F pair) + uterm pair
            r0 = dd.add(dd.mul_const((f1[:], f2[:]), heat_L), r0)
            if x1 is not None:
                # corrector / gamma != 1 rhs terms, pre-assembled by the
                # caller as an f32 pair
                r0 = dd.add(r0, (x1[:], x2[:]))
        r1 = dd.sub(r0, Ae)
        out[:] = r1[0] + r1[1]

    return kernel


@functools.partial(jax.jit, static_argnames=("bc", "C", "X", "Y", "heat_L",
                                             "aniso", "interpret", "ny",
                                             "nx"))
def _cross_residual_call(bc, C, X, Y, heat_L, aniso, interpret, ny, nx, e,
                         r0h, r0l, f1, f2, x1=None, x2=None,
                         g_lo=None, g_hi=None, g_w=None, g_e=None):
    from .pallas_rhs import make_halo_row_maps

    ghost_x = g_w is not None
    ty = _tile_dd(ny, nx + 256 if ghost_x else nx)
    grid = ny // ty
    north, south = make_halo_row_maps(ny, ty, bc)
    center = lambda i: (i, 0)
    espec = [pl.BlockSpec((ty, nx), center, memory_space=pltpu.VMEM),
             pl.BlockSpec((8, nx), north, memory_space=pltpu.VMEM),
             pl.BlockSpec((8, nx), south, memory_space=pltpu.VMEM)]
    cspec = pl.BlockSpec((ty, nx), center, memory_space=pltpu.VMEM)
    in_specs = espec + [cspec, cspec]
    args = [e, e, e, r0h, r0l]
    has_extra = x1 is not None
    ghost = g_lo is not None
    if aniso:
        in_specs += [cspec]
        args += [f1]  # the s map rides the f1 slot
    elif heat_L is not None:
        in_specs += [cspec, cspec]
        args += [f1, f2]
        if has_extra:
            in_specs += [cspec, cspec]
            args += [x1, x2]
    if ghost:
        nxe = nx + 256 if ghost_x else nx
        if ghost_x:
            # pad the (8, nx) ghost rows to the extended width (the 1-deep
            # stencil never reads their ghost-lane corners)
            pad = ((0, 0), (128, 128))
            g_lo, g_hi = jnp.pad(g_lo, pad), jnp.pad(g_hi, pad)
        gspec = pl.BlockSpec((8, nxe), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)
        in_specs += [gspec, gspec]
        args += [g_lo, g_hi]
    if ghost_x:
        gxspec = [pl.BlockSpec((ty, 128), center, memory_space=pltpu.VMEM),
                  pl.BlockSpec((8, 128), north, memory_space=pltpu.VMEM),
                  pl.BlockSpec((8, 128), south, memory_space=pltpu.VMEM)]
        in_specs += gxspec + gxspec
        args += [g_w, g_w, g_w, g_e, g_e, g_e]
    kernel = _make_cross_residual_kernel(bc, C, X, Y, heat_L, aniso,
                                         has_extra=has_extra, ghost=ghost,
                                         ghost_x=ghost_x)
    with jax.enable_x64(False), dd.eft_guards(interpret):
        return pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=in_specs,
            out_specs=cspec,
            out_shape=jax.ShapeDtypeStruct((ny, nx), jnp.float32),
            interpret=interpret,
        )(*args)


def cross_residual_dd(r0_pair, e, A, interpret=False):
    """Refinement residual r1 = r0 - A e (pair r0, exact-f32 e, constant
    cross A); returns an f32 plane for the second CG solve."""
    ny, nx = e.shape
    return _cross_residual_call(A.boundary, float(A.C), float(A.X),
                                float(A.Y), None, False,
                                interpret or FORCE_INTERPRET, ny, nx,
                                e, r0_pair[0], r0_pair[1], e, e)


def aniso_residual_dd(r0_pair, e, A, s, interpret=False):
    """Variable-coefficient refinement residual r1 = r0 - A(s) e
    (`AnisotropyMatrix` semantics with a per-cell f32 map s)."""
    ny, nx = e.shape
    return _cross_residual_call(A.boundary, float(A.Cm1), float(A.X),
                                float(A.Y), None, True,
                                interpret or FORCE_INTERPRET, ny, nx,
                                e, r0_pair[0], r0_pair[1], s, s)


def heat_residual_dd(ut_pair, eF_pair, e, A, L, extra_pair=None,
                     interpret=False):
    """Heat-system refinement residual r1 = (L*e_F + uterm [+ extra]) - A e,
    with e_F = eF_pair carried as (first solve, refinement) f32 planes and
    ``extra_pair`` the optional corrector/gamma rhs terms
    (U_base - U) + dt*(1-gamma)*U_base as an f32 pair
    (`simulation.cu:893-899`)."""
    ny, nx = e.shape
    x1, x2 = extra_pair if extra_pair is not None else (None, None)
    return _cross_residual_call(A.boundary, float(A.C), float(A.X),
                                float(A.Y), float(L), False,
                                interpret or FORCE_INTERPRET, ny, nx,
                                e, ut_pair[0], ut_pair[1],
                                eF_pair[0], eF_pair[1], x1, x2)


def _ghost_rows_e(e, bc: BoundaryType, axis_y: str):
    """Ghost rows of a single f32 plane for the sharded residual kernels
    (the matvec convention: `topo.pad` ghosts with dirichlet_value=0)."""
    from .pallas_rhs import _ghost_rows

    return _ghost_rows([(e, e)], [1.0], bc, 0, axis_y, 0.0)


def _ghost_cols_e(e, bc: BoundaryType, axis_x: str):
    """Ghost COLUMNS of a single f32 plane for the x-sharded residual
    kernels (matvec pad convention, dirichlet_value=0): returns (g_w, g_e)
    of shape (ny, 128) with the west neighbor's edge column in lane 127
    and the east neighbor's in lane 0 -- adjacent to the center after the
    in-kernel concat."""
    from jax import lax

    n = lax.axis_size(axis_x)
    idx = lax.axis_index(axis_x)
    fwd = [(i, (i + 1) % n) for i in range(n)]
    bwd = [(i, (i - 1) % n) for i in range(n)]
    g_w = lax.ppermute(e[:, -1:], axis_x, fwd)
    g_e = lax.ppermute(e[:, :1], axis_x, bwd)
    if bc != BoundaryType.PERIODIC:
        sign = -1.0 if bc == BoundaryType.DIRICHLET else 1.0
        g_w = jnp.where(idx == 0, sign * e[:, :1], g_w)
        g_e = jnp.where(idx == n - 1, sign * e[:, -1:], g_e)
    return jnp.pad(g_w, ((0, 0), (127, 0))), jnp.pad(g_e, ((0, 0), (0, 127)))


def _ghost_e_kw(e, bc: BoundaryType, axis_y, axis_x):
    kw = {}
    if axis_y is not None:
        kw["g_lo"], kw["g_hi"] = _ghost_rows_e(e, bc, axis_y)
    if axis_x is not None:
        kw["g_w"], kw["g_e"] = _ghost_cols_e(e, bc, axis_x)
    return kw


def cross_residual_dd_sharded(r0_pair, e, A, axis_y, interpret=False,
                              axis_x=None):
    """Sharded twin of `cross_residual_dd`: e's shard-edge halo rows
    and/or columns arrive over ICI (one ppermute pair per sharded axis),
    global edges keep the BC image."""
    ny, nx = e.shape
    return _cross_residual_call(A.boundary, float(A.C), float(A.X),
                                float(A.Y), None, False,
                                interpret or FORCE_INTERPRET, ny, nx,
                                e, r0_pair[0], r0_pair[1], e, e,
                                **_ghost_e_kw(e, A.boundary, axis_y, axis_x))


def aniso_residual_dd_sharded(r0_pair, e, A, s, axis_y, interpret=False,
                              axis_x=None):
    """Sharded twin of `aniso_residual_dd` (per-cell s map is pointwise,
    so only e needs the halo exchange)."""
    ny, nx = e.shape
    return _cross_residual_call(A.boundary, float(A.Cm1), float(A.X),
                                float(A.Y), None, True,
                                interpret or FORCE_INTERPRET, ny, nx,
                                e, r0_pair[0], r0_pair[1], s, s,
                                **_ghost_e_kw(e, A.boundary, axis_y, axis_x))


def heat_residual_dd_sharded(ut_pair, eF_pair, e, A, L, axis_y,
                             extra_pair=None, interpret=False, axis_x=None):
    """Sharded twin of `heat_residual_dd` (uterm/e_F/extra planes are
    pointwise; only e needs the halo exchange)."""
    ny, nx = e.shape
    x1, x2 = extra_pair if extra_pair is not None else (None, None)
    return _cross_residual_call(A.boundary, float(A.C), float(A.X),
                                float(A.Y), float(L), False,
                                interpret or FORCE_INTERPRET, ny, nx,
                                e, ut_pair[0], ut_pair[1],
                                eF_pair[0], eF_pair[1], x1, x2,
                                **_ghost_e_kw(e, A.boundary, axis_y, axis_x))


def supports_dd_sharded(p: SimParams, ny_local: int, nx_local: int = 0,
                        x_sharded: bool = False) -> bool:
    """Ghost-slab/ghost-column df64 whole-integrator feasibility on a
    local shard (x-sharded blocks run 256 lanes wider in-kernel)."""
    nx_local = nx_local or p.nx
    if not supports_dd(p.replace(ny=ny_local, nx=nx_local)):
        return False
    nxe = nx_local + 256 if x_sharded else nx_local
    return _tile_dd(ny_local, nxe) >= 8


def wants_dd_sharded(p: SimParams, topo, ny_local: int,
                     nx_local: int = 0) -> bool:
    """Gate for the ghost-slab/ghost-column df64 kernels on y-, x- and 2D
    meshes."""
    from .rhs import _on_tpu_or_forced

    return (p.backend != "xla" and topo.is_sharded
            and supports_dd_sharded(p, ny_local, nx_local,
                                    x_sharded=topo.axis_x is not None)
            and _on_tpu_or_forced(p))


def ghost_slabs_dd(pair, axis_y: str, gcols=None):
    """Exchange the 8-row edge slabs of all four pair planes over ICI.

    Mirrors `pallas_rhs._ghost_slabs` but stacks (hi, lo) into ONE
    (16, nx) message per field per direction, so the collective count per
    step equals the f32 path's (4 ppermutes) at 2x the bytes.  Returns 8
    (8, nx) slabs ordered (gFh_lo, gFh_hi, gUh_lo, gUh_hi, gFl_lo,
    gFl_hi, gUl_lo, gUl_hi) -- the kernel's ghost operand order.

    2D meshes (``gcols`` from an already-completed `ghost_cols_dd`
    exchange): each slab is pre-extended in x with the ghost-column lanes
    BEFORE the y-ppermute, so the received (8, nx+256) slab carries the
    DIAGONAL neighbor's corner data -- the stage chain reads corners at
    depth > 1, which single-phase exchanges cannot supply."""
    from jax import lax

    Fh, Fl, Uh, Ul = pair
    n = lax.axis_size(axis_y)
    fwd = [(i, (i + 1) % n) for i in range(n)]
    bwd = [(i, (i - 1) % n) for i in range(n)]
    if gcols is not None:
        gFh_w, gFh_e, gUh_w, gUh_e, gFl_w, gFl_e, gUl_w, gUl_e = gcols
        xext = lambda P, w, e: jnp.concatenate([w, P, e], axis=1)
        Fh = xext(Fh, gFh_w, gFh_e)
        Fl = xext(Fl, gFl_w, gFl_e)
        Uh = xext(Uh, gUh_w, gUh_e)
        Ul = xext(Ul, gUl_w, gUl_e)

    def ex(h, l):
        lo = lax.ppermute(jnp.concatenate([h[-8:], l[-8:]], axis=0),
                          axis_y, fwd)
        hi = lax.ppermute(jnp.concatenate([h[:8], l[:8]], axis=0),
                          axis_y, bwd)
        return lo[:8], hi[:8], lo[8:], hi[8:]  # (hi-plane lo/hi, lo-plane lo/hi)

    gFh_lo, gFh_hi, gFl_lo, gFl_hi = ex(Fh, Fl)
    gUh_lo, gUh_hi, gUl_lo, gUl_hi = ex(Uh, Ul)
    return (gFh_lo, gFh_hi, gUh_lo, gUh_hi, gFl_lo, gFl_hi, gUl_lo, gUl_hi)


def ghost_cols_dd(pair, axis_x: str):
    """Exchange the 8-COLUMN edge slabs of all four pair planes over ICI
    (the x-sharded twin of `ghost_slabs_dd`): one (ny, 16) message per
    field per direction, hi and lo lanes stacked.  Returns 8 (ny, 128)
    arrays ordered (gFh_w, gFh_e, gUh_w, gUh_e, gFl_w, gFl_e, gUl_w,
    gUl_e): west arrays carry the x-predecessor's LAST 8 columns in lanes
    120..127 and east arrays the x-successor's FIRST 8 columns in lanes
    0..7, so both sit adjacent to the center block after the in-kernel
    concat; the remaining lanes are zero filler (> stage-depth away from
    any written cell).  Global-x-edge BC images are applied IN-KERNEL per
    stage (`fix_x`), like the y slabs."""
    from jax import lax

    Fh, Fl, Uh, Ul = pair
    n = lax.axis_size(axis_x)
    fwd = [(i, (i + 1) % n) for i in range(n)]
    bwd = [(i, (i - 1) % n) for i in range(n)]

    def ex(h, l):
        w = lax.ppermute(jnp.concatenate([h[:, -8:], l[:, -8:]], axis=1),
                         axis_x, fwd)
        e = lax.ppermute(jnp.concatenate([h[:, :8], l[:, :8]], axis=1),
                         axis_x, bwd)
        pw, pe = ((0, 0), (120, 0)), ((0, 0), (0, 120))
        return (jnp.pad(w[:, :8], pw), jnp.pad(e[:, :8], pe),
                jnp.pad(w[:, 8:], pw), jnp.pad(e[:, 8:], pe))

    gFh_w, gFh_e, gFl_w, gFl_e = ex(Fh, Fl)
    gUh_w, gUh_e, gUl_w, gUl_e = ex(Uh, Ul)
    return (gFh_w, gFh_e, gUh_w, gUh_e, gFl_w, gFl_e, gUl_w, gUl_e)


def _dd_ghosts(pair, axis_y, axis_x):
    """(slabs, gcols, scal flag extras) for a sharded dd fullstep call:
    the x exchange runs first so the y slabs can carry corner data on 2D
    meshes (two-phase exchange)."""
    gcols = ghost_cols_dd(pair, axis_x) if axis_x is not None else None
    slabs = (ghost_slabs_dd(pair, axis_y, gcols)
             if axis_y is not None else None)
    extra = ()
    if axis_y is not None:
        extra += _shard_flags(axis_y)
    if axis_x is not None:
        extra += _shard_flags(axis_x)
    return slabs, gcols, extra


def _shard_flags(axis_y: str):
    from jax import lax

    idx = lax.axis_index(axis_y)
    n = lax.axis_size(axis_y)
    return ((idx == 0).astype(jnp.float32), (idx == n - 1).astype(jnp.float32))


def euler_steps_dd_pair_sharded(pair, p: SimParams, axis_y,
                                T: int = EULER_DD_BLOCK_STEPS, fu=0.0,
                                dirichlet_value=0.0, interpret=False,
                                axis_x=None):
    """T fused Euler steps per shard with one slab/column exchange per
    sharded axis (depth T <= 8)."""
    slabs, gcols, extra = _dd_ghosts(pair, axis_y, axis_x)
    Fh, Fl, Uh, Ul = pair
    o = _fullstep_call_dd(p, "euler", interpret or FORCE_INTERPRET, T,
                          Fh, Fl, Uh, Ul,
                          _scal_row(dirichlet_value, fu, 0.0, extra),
                          ghosts=slabs, gcols=gcols)
    return (o[0], o[2], o[1], o[3])


def rk4_full_dd_pair_sharded(pair, p: SimParams, axis_y, fu=0.0,
                             dirichlet_value=0.0, interpret=False,
                             axis_x=None):
    slabs, gcols, extra = _dd_ghosts(pair, axis_y, axis_x)
    Fh, Fl, Uh, Ul = pair
    o = _fullstep_call_dd(p, "rk4", interpret or FORCE_INTERPRET, 1,
                          Fh, Fl, Uh, Ul,
                          _scal_row(dirichlet_value, fu, 0.0, extra),
                          ghosts=slabs, gcols=gcols)
    return (o[0], o[2], o[1], o[3])


def rkm_attempt_dd_pair_sharded(pair, tau, p: SimParams, axis_y, fu=0.0,
                                dirichlet_value=0.0, interpret=False,
                                slabs=None, flags=None, axis_x=None,
                                gcols=None):
    """One Merson attempt per shard; returns (pair', emax_F, emax_U) with
    SHARD-LOCAL f32 maxima (caller pmaxes).  ``slabs``/``gcols``/``flags``
    (a `_dd_ghosts` result) allow the solver to hoist the tau-invariant
    collectives out of the retry loop."""
    if flags is None:
        slabs, gcols, flags = _dd_ghosts(pair, axis_y, axis_x)
    Fh, Fl, Uh, Ul = pair
    o = _fullstep_call_dd(p, "rkm", interpret or FORCE_INTERPRET, 1,
                          Fh, Fl, Uh, Ul,
                          _scal_row(dirichlet_value, fu, tau, flags),
                          ghosts=slabs, gcols=gcols)
    return (o[0], o[2], o[1], o[3]), jnp.max(o[4]), jnp.max(o[5])


def si_prepare_dd_pair_sharded(pair, p: SimParams, axis_y,
                               dirichlet_value=0.0, interpret=False,
                               axis_x=None):
    """Sharded twin of `si_prepare_dd_pair`: the pair state's 8-row edge
    slabs (and/or 8-column edge slabs on x-sharded meshes) travel over
    ICI (`ghost_slabs_dd`/`ghost_cols_dd`, one stacked message per field
    per direction), BC images apply only at global edges."""
    slabs, gcols, extra = _dd_ghosts(pair, axis_y, axis_x)
    Fh, Fl, Uh, Ul = pair
    o = _fullstep_call_dd(p, "si", interpret or FORCE_INTERPRET, 1,
                          Fh, Fl, Uh, Ul,
                          _scal_row(dirichlet_value, 0.0, 0.0, extra),
                          ghosts=slabs, gcols=gcols)
    if len(o) > 4:
        return (o[0], o[2]), (o[1], o[3]), o[4]
    return (o[0], o[2]), (o[1], o[3])


def pair_add_f32(pair, e_F, e_U):
    """(state pair) + f32 deltas, in pair precision: the semi-implicit
    add-back next = x + e.  Pure TwoSum chains (no products), so safe to
    evaluate at the XLA level on any backend -- FMA contraction needs a
    multiply."""
    Fh, Fl, Uh, Ul = pair
    F2 = dd.add_f32((Fh, Fl), e_F)
    U2 = dd.add_f32((Uh, Ul), e_U)
    return (F2[0], F2[1], U2[0], U2[1])


# --- f64-state API (split/join at the boundary; for per-step use) ---

def state_to_pair(F, U):
    Fh, Fl = dd.from_f64(F)
    Uh, Ul = dd.from_f64(U)
    return (Fh, Fl, Uh, Ul)


def pair_to_state(pair):
    return dd.to_f64((pair[0], pair[1])), dd.to_f64((pair[2], pair[3]))


def euler_steps_dd(F, U, p: SimParams, T: int = EULER_DD_BLOCK_STEPS,
                   fu=0.0, dirichlet_value=0.0, interpret=False):
    out = euler_steps_dd_pair(state_to_pair(F, U), p, T, fu, dirichlet_value,
                              interpret)
    return pair_to_state(out)


def rk4_full_dd(F, U, p: SimParams, fu=0.0, dirichlet_value=0.0,
                interpret=False):
    out = rk4_full_dd_pair(state_to_pair(F, U), p, fu, dirichlet_value,
                           interpret)
    return pair_to_state(out)


def rkm_attempt_dd(F, U, tau, p: SimParams, fu=0.0, dirichlet_value=0.0,
                   interpret=False):
    pair, eF, eU = rkm_attempt_dd_pair(state_to_pair(F, U), tau, p, fu,
                                       dirichlet_value, interpret)
    nF, nU = pair_to_state(pair)
    return nF, nU, eF.astype(F.dtype), eU.astype(F.dtype)
