"""Fused Pallas kernels for the conjugate-gradient hot loop.

The reference's CG (`simulation.cu:596-690`) launches, per iteration, a
tiled stencil matvec, two separate device-wide dot reductions (each a full
re-read of its operands) and two axpy kernels.  Here the iteration costs
two fused passes:

  * ``matvec_pAp``: 5-point operator (constant cross or per-cell
    anisotropy map, `simulation.cu:528-578`) producing Ap AND per-block
    partial sums of <p, Ap> in the same read of p;
  * ``update_xr_rr``: x += alpha p, r -= alpha Ap, emitting per-block
    partial sums of the new <r, r> from the same pass.

The search-direction update p = r + beta p stays in XLA (a single fused
axpy).  Boundary handling reuses the halo row-group machinery of
`ops/pallas_rhs.py`.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.params import BoundaryType
from .pallas_rhs import (_pick_halo_rows, _roll, _row_mask, _shift_x,
                         _tile_y, make_halo_row_maps)


def _partial_spec(ty):
    return pl.BlockSpec((8, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)


def _halo_specs(ny, nx, ty, bc: BoundaryType):
    north, south = make_halo_row_maps(ny, ty, bc)
    return [
        pl.BlockSpec((ty, nx), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((8, nx), north, memory_space=pltpu.VMEM),
        pl.BlockSpec((8, nx), south, memory_space=pltpu.VMEM),
    ]


@functools.partial(jax.jit, static_argnames=("bc", "C", "X", "Y", "with_s",
                                             "blend", "ny", "nx", "interpret",
                                             "ghost", "ghost_x"))
def _matvec_pAp(bc: BoundaryType, C: float, X: float, Y: float, with_s: bool,
                blend: bool, ny: int, nx: int, interpret: bool, v, s, r, beta,
                ghost: bool = False, g_lo=None, g_hi=None,
                ghost_x: bool = False, g_w=None, g_e=None, out=None):
    """Fused (optionally blended) matvec + <p, Ap> partials.

    blend=False: p = v.  blend=True: the CG direction update is folded in --
    p' = r + beta*v is formed in VMEM from the halo'd inputs, and the kernel
    emits (p', A p', <p', A p'>) so the separate axpy pass disappears.

    ghost / ghost_x: the y-halo arrives as ppermuted ghost ROWS and/or the
    x-halo as ghost COLUMNS (x-sharded meshes; same machinery as the
    sharded RHS kernels).  ghost_x is wired for the unblended form only
    (the direction-blend would need two ghost column sets).

    out: optional DEAD (ny, nx) buffer donated as the Av output's backing
    store (input_output_aliases).  Writing into warm pages instead of a
    fresh allocation skips the write-allocate read of every cold cache
    line (the RESULTS.md roofline: fresh-buffer stores run at half the
    stream rate).  The CG loop feeds the previous iteration's Ap, which
    is dead once x/r are updated.  DONATION CONTRACT: the caller must not
    use ``out`` after this call.
    """
    if ghost_x and blend:
        raise NotImplementedError("ghost columns are wired for the "
                                  "unblended matvec form only")
    ty = _tile_y(ny, nx, 3 if blend else 2, 4)
    grid = ny // ty
    has_dead_out = out is not None  # (the kernel shadows the name 'out')

    def kernel(*refs):
        i = 0
        if blend:
            b_ref = refs[0]
            i = 1
        vc, vn, vs = refs[i:i + 3]
        i += 3
        if blend:
            rc, rn, rs = refs[i:i + 3]
            i += 3
        sc = refs[i] if with_s else None
        i += 1 if with_s else 0
        if ghost:
            gl, gh = refs[i:i + 2]
            i += 2
        if ghost_x:
            gw, ge = refs[i:i + 2]
            i += 2
        if has_dead_out:
            i += 1  # the dead alias-target buffer; never read
        outs = refs[i:]

        if blend:
            bt = b_ref[0, 0]
            pc = rc[:] + bt * vc[:]
            pn = rn[:] + bt * vn[:]
            ps = rs[:] + bt * vs[:]
        else:
            pc, pn, ps = vc[:], vn[:], vs[:]
        if ghost:
            from .pallas_rhs import _pick_halo_rows_ghost

            n_row, s_row = _pick_halo_rows_ghost(pn, ps, gl[:], gh[:])
            ty_k = pc.shape[0]
            N = jnp.where(_row_mask(pc, ty_k - 1), n_row, _roll(pc, -1, 0))
            S = jnp.where(_row_mask(pc, 0), s_row, _roll(pc, 1, 0))
        else:
            n_row, s_row = _pick_halo_rows(pc, pn, ps, bc, 0.0)
            ty_k = pc.shape[0]
            N = jnp.where(_row_mask(pc, ty_k - 1), n_row, _roll(pc, -1, 0))
            S = jnp.where(_row_mask(pc, 0), s_row, _roll(pc, 1, 0))
        if ghost_x:
            E, W = _shift_x(pc, bc, 0.0, gw[:, 0:1], ge[:, 0:1])
        else:
            E, W = _shift_x(pc, bc, 0.0)
        # square cells have X == Y (the shipped configs): one neighbor sum
        # times one (per-cell) coefficient -- saves 1-2 multiplies/cell
        # (the matvec is cache-resident/VPU-bound at <= 2048^2, RESULTS.md)
        if with_s:
            sv = sc[:]
            if X == Y:
                Av = (1 + C * sv) * pc + (X * sv) * ((E + W) + (N + S))
            else:
                Av = ((1 + C * sv) * pc + (X * sv) * (E + W)
                      + (Y * sv) * (N + S))
        elif X == Y:
            Av = C * pc + X * ((E + W) + (N + S))
        else:
            Av = C * pc + X * (E + W) + Y * (N + S)
        if blend:
            p_out, out, part = outs
            p_out[:] = pc
        else:
            out, part = outs
        out[:] = Av
        part[:] = jnp.full(part.shape, jnp.sum(pc * Av))

    fspec = pl.BlockSpec((ty, nx), lambda i: (i, 0), memory_space=pltpu.VMEM)
    in_specs = []
    args = []
    if blend:
        in_specs.append(pl.BlockSpec((1, 1), lambda i: (0, 0),
                                     memory_space=pltpu.SMEM))
        args.append(jnp.reshape(jnp.asarray(beta, jnp.float32), (1, 1)))
    in_specs += _halo_specs(ny, nx, ty, bc)
    args += [v, v, v]
    if blend:
        in_specs += _halo_specs(ny, nx, ty, bc)
        args += [r, r, r]
    if with_s:
        in_specs.append(fspec)
        args.append(s)
    if ghost:
        gspec = pl.BlockSpec((8, nx), lambda i: (0, 0), memory_space=pltpu.VMEM)
        in_specs += [gspec, gspec]
        args += [g_lo, g_hi]
    if ghost_x:
        cspec = pl.BlockSpec((ty, 128), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
        in_specs += [cspec, cspec]
        args += [g_w, g_e]
    io_alias = {}
    if out is not None:
        in_specs.append(fspec)
        args.append(out)
        io_alias = {len(in_specs) - 1: 1 if blend else 0}
    out_specs = [fspec, _partial_spec(ty)]
    out_shape = [jax.ShapeDtypeStruct((ny, nx), jnp.float32),
                 jax.ShapeDtypeStruct((grid * 8, 128), jnp.float32)]
    if blend:
        out_specs = [fspec] + out_specs
        out_shape = [jax.ShapeDtypeStruct((ny, nx), jnp.float32)] + out_shape
    # x64 off during tracing: f64 configs (the df64 semi-implicit path)
    # reach these f32 kernels under jax_enable_x64, where python ints in
    # index maps trace as i64 and fail Mosaic verification
    with jax.enable_x64(False):
        res = pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            input_output_aliases=io_alias,
            interpret=interpret,
        )(*args)
    if blend:
        p_new, out, part = res
    else:
        out, part = res
        p_new = None
    pAp = jnp.sum(part.reshape(grid, 8, 128)[:, 0, 0])
    if blend:
        return p_new, out, pAp
    return out, pAp


def cross_matvec_pAp(A, v, interpret: bool = False, out=None):
    """(A v, <v, A v>) for the constant cross operator (ops.stencil.CrossMatrix).

    ``out``: optional dead buffer donated as Av's storage (see _matvec_pAp)."""
    ny, nx = v.shape
    return _matvec_pAp(A.boundary, A.C, A.X, A.Y, False, False, ny, nx,
                       interpret, v, v, v, 0.0, out=out)


def aniso_matvec_pAp(A, s, v, interpret: bool = False, out=None):
    """(A v, <v, A v>) for the anisotropy operator (ops.stencil.AnisotropyMatrix).

    Note the operator form (1 + Cm1*s) I + X*s (E+W) + Y*s (N+S)."""
    ny, nx = v.shape
    return _matvec_pAp(A.boundary, A.Cm1, A.X, A.Y, True, False, ny, nx,
                       interpret, v, s, v, 0.0, out=out)


def _ghost_kw(bc, v, axis_y, axis_x):
    """Ghost rows (y-sharded) / columns (x-sharded) for a single vector's
    matvec; either axis may be None."""
    from .pallas_rhs import _ghost_cols, _ghost_rows

    kw = {}
    if axis_y is not None:
        g_lo, g_hi = _ghost_rows([(v, v)], [1.0], bc, 0, axis_y, 0.0)
        kw.update(ghost=True, g_lo=g_lo, g_hi=g_hi)
    if axis_x is not None:
        g_w, g_e = _ghost_cols([(v, v)], [1.0], bc, 0, axis_x, 0.0)
        kw.update(ghost_x=True, g_w=g_w, g_e=g_e)
    return kw


def cross_matvec_pAp_sharded(A, v, axis_y, interpret: bool = False,
                             axis_x=None, out=None):
    """Sharded twin of ``cross_matvec_pAp``: the y-halo arrives as ghost
    rows (and the x-halo as ghost columns on x-sharded meshes) over ICI;
    the returned <v, Av> is SHARD-LOCAL (caller psums)."""
    ny, nx = v.shape
    return _matvec_pAp(A.boundary, A.C, A.X, A.Y, False, False, ny, nx,
                       interpret, v, v, v, 0.0, out=out,
                       **_ghost_kw(A.boundary, v, axis_y, axis_x))


def aniso_matvec_pAp_sharded(A, s, v, axis_y, interpret: bool = False,
                             axis_x=None, out=None):
    """Sharded twin of ``aniso_matvec_pAp`` (local <v, Av>; caller psums)."""
    ny, nx = v.shape
    return _matvec_pAp(A.boundary, A.Cm1, A.X, A.Y, True, False, ny, nx,
                       interpret, v, s, v, 0.0, out=out,
                       **_ghost_kw(A.boundary, v, axis_y, axis_x))


def cross_advance_p_matvec(A, r, p, beta, interpret: bool = False, out=None):
    """(p', A p', <p', A p'>) with p' = r + beta*p fused into the matvec."""
    ny, nx = p.shape
    return _matvec_pAp(A.boundary, A.C, A.X, A.Y, False, True, ny, nx,
                       interpret, p, p, r, beta, out=out)


def aniso_advance_p_matvec(A, s, r, p, beta, interpret: bool = False,
                           out=None):
    """Anisotropy-operator variant of ``cross_advance_p_matvec``."""
    ny, nx = p.shape
    return _matvec_pAp(A.boundary, A.Cm1, A.X, A.Y, True, True, ny, nx,
                       interpret, p, s, r, beta, out=out)


@functools.partial(jax.jit, static_argnames=("ny", "nx", "interpret"))
def _axpby_inplace(ny: int, nx: int, interpret: bool, a, b, r, pv):
    ty = _tile_y(ny, nx, 2, 4)
    grid = ny // ty
    spec = pl.BlockSpec((ty, nx), lambda i: (i, 0), memory_space=pltpu.VMEM)

    def kernel(s_ref, r_ref, p_ref, o):
        o[:] = s_ref[0, 0] * r_ref[:] + s_ref[0, 1] * p_ref[:]

    scal = jnp.reshape(
        jnp.stack([jnp.asarray(a, jnp.float32), jnp.asarray(b, jnp.float32)]),
        (1, 2))
    with jax.enable_x64(False):  # see _matvec_pAp: Mosaic rejects i64 maps
        return pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=[pl.BlockSpec((1, 2), lambda i: (0, 0),
                                   memory_space=pltpu.SMEM), spec, spec],
            out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((ny, nx), jnp.float32),
            # block-local pointwise: writing over p's own pages skips the
            # write-allocate of a fresh buffer (same discipline as update_xr_rr)
            input_output_aliases={2: 0},
            interpret=interpret,
        )(scal, r, pv)


def axpby_inplace(a, b, r, pv, interpret: bool = False):
    """a*r + b*p, written IN PLACE over ``pv``.

    DONATION CONTRACT: ``pv`` must be dead after the call (the CG loop's
    direction update; every prior reader of p is scheduled before it)."""
    ny, nx = pv.shape
    return _axpby_inplace(ny, nx, interpret, a, b, r, pv)


@functools.partial(jax.jit, static_argnames=("ny", "nx", "interpret"))
def _update_xr_rr(ny: int, nx: int, interpret: bool, x, r, pv, Ap, alpha):
    ty = _tile_y(ny, nx, 3, 4)
    grid = ny // ty
    spec = pl.BlockSpec((ty, nx), lambda i: (i, 0), memory_space=pltpu.VMEM)

    def kernel(a_ref, x_ref, r_ref, p_ref, Ap_ref, xo, ro, part):
        al = a_ref[0, 0]
        xo[:] = x_ref[:] + al * p_ref[:]
        rn = r_ref[:] - al * Ap_ref[:]
        ro[:] = rn
        part[:] = jnp.full(part.shape, jnp.sum(rn * rn))

    with jax.enable_x64(False):  # see _matvec_pAp: Mosaic rejects i64 maps
        xo, ro, part = pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=[pl.BlockSpec((1, 1), lambda i: (0, 0),
                                   memory_space=pltpu.SMEM),
                      spec, spec, spec, spec],
            out_specs=[spec, spec, _partial_spec(ty)],
            out_shape=[jax.ShapeDtypeStruct((ny, nx), jnp.float32),
                       jax.ShapeDtypeStruct((ny, nx), jnp.float32),
                       jax.ShapeDtypeStruct((grid * 8, 128), jnp.float32)],
            # x/r are pointwise-updated per block: writing them in place
            # avoids the write-allocate penalty of fresh output buffers
            # (RESULTS.md roofline notes); block i only touches block i
            input_output_aliases={1: 0, 2: 1},
            interpret=interpret,
        )(jnp.reshape(jnp.asarray(alpha, jnp.float32), (1, 1)), x, r, pv, Ap)
    rr = jnp.sum(part.reshape(grid, 8, 128)[:, 0, 0])
    return xo, ro, rr


def update_xr_rr(x, r, pv, Ap, alpha, interpret: bool = False):
    """Fused (x + alpha p, r - alpha Ap, <r', r'>).

    DONATION CONTRACT: the input ``x`` and ``r`` buffers are updated in
    place (``input_output_aliases``) and must be DEAD after this call --
    callers may not reuse the old arrays inside the same jit.  The CG
    loops satisfy this by construction (each iteration consumes only the
    returned x/r); interpret/debug paths do not alias, so code that
    (incorrectly) reuses donated inputs would pass in interpret mode yet
    read clobbered memory on TPU."""
    ny, nx = x.shape
    return _update_xr_rr(ny, nx, interpret, x, r, pv, Ap, alpha)

