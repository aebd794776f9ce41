"""Pallas-on-TPU tutorial kernels, from naive to production-shaped.

The analog of the reference's pedagogy file (`cuda_examples.cuh`: 8
progressively optimized CUDA kernels -- naive saxpy, grid-stride loops,
shared-memory tiles, warp-shuffle reductions -- each checked against a CPU
loop).  The TPU progression teaches different muscles:

  1. whole-array kernel             (VMEM in, VMEM out)
  2. gridded row-block kernel       (BlockSpecs pipeline HBM<->VMEM)
  3. scalar parameters via SMEM
  4. block-parallel reduction       (per-block partials + tiny final pass)
  5. stencil with halo row-groups   (index maps as the halo machinery)
  6. fused multi-output kernel      (stats bundle in one read)

Each step is verified against jnp.  Run: ``python examples/pallas_tutorial.py``
(any backend; uses interpret mode off-TPU).  The production versions of
steps 5-6 live in ``bachelors_tpu/ops``.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INTERPRET = jax.default_backend() != "tpu"


def check(name, got, want, atol=1e-5):
    ok = np.allclose(np.asarray(got), np.asarray(want), atol=atol, rtol=1e-5)
    print(f"  {'PASS' if ok else 'FAIL'}  {name}")
    assert ok, name


# 1. whole-array kernel: y = a*x + y ------------------------------------------
def saxpy_whole(a, x, y):
    def kernel(x_ref, y_ref, o_ref):
        o_ref[:] = a * x_ref[:] + y_ref[:]

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=INTERPRET,
    )(x, y)


# 2. gridded row blocks: same op, but Mosaic pipelines HBM->VMEM tiles --------
def saxpy_gridded(a, x, y, ty=128):
    spec = pl.BlockSpec((ty, x.shape[1]), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)

    def kernel(x_ref, y_ref, o_ref):
        o_ref[:] = a * x_ref[:] + y_ref[:]

    return pl.pallas_call(
        kernel, grid=(x.shape[0] // ty,),
        in_specs=[spec, spec], out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=INTERPRET,
    )(x, y)


# 3. runtime scalars via SMEM (compile once, vary a) --------------------------
def saxpy_smem(a, x, y, ty=128):
    spec = pl.BlockSpec((ty, x.shape[1]), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)

    def kernel(a_ref, x_ref, y_ref, o_ref):
        o_ref[:] = a_ref[0, 0] * x_ref[:] + y_ref[:]

    return pl.pallas_call(
        kernel, grid=(x.shape[0] // ty,),
        in_specs=[pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
                  spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=INTERPRET,
    )(jnp.reshape(jnp.asarray(a, x.dtype), (1, 1)), x, y)


# 4. block-parallel reduction: per-block partial sums -------------------------
def block_sum(x, ty=128):
    ny, nx = x.shape
    grid = ny // ty

    def kernel(x_ref, part_ref):
        part_ref[:] = jnp.full(part_ref.shape, jnp.sum(x_ref[:]))

    part = pl.pallas_call(
        kernel, grid=(grid,),
        in_specs=[pl.BlockSpec((ty, nx), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((grid * 8, 128), jnp.float32),
        interpret=INTERPRET,
    )(x)
    return jnp.sum(part.reshape(grid, 8, 128)[:, 0, 0])


# 5. 5-point stencil with halo row-groups (index maps do the halo work) -------
def laplacian_halo(x, ty=64):
    ny, nx = x.shape
    g = ty // 8
    ngr = ny // 8

    def kernel(c_ref, n_ref, s_ref, o_ref):
        c = c_ref[:]
        i = pl.program_id(0)
        n_prog = pl.num_programs(0)
        north = jnp.where(i == n_prog - 1, n_ref[7:8], n_ref[0:1])
        south = jnp.where(i == 0, s_ref[0:1], s_ref[7:8])
        ids = jax.lax.broadcasted_iota(jnp.int32, c.shape, 0)
        N = jnp.where(ids == ty - 1, north, pltpu.roll(c, ty - 1, 0))
        S = jnp.where(ids == 0, south, pltpu.roll(c, 1, 0))
        cols = jax.lax.broadcasted_iota(jnp.int32, c.shape, 1)
        E = jnp.where(cols == nx - 1, c, pltpu.roll(c, nx - 1, 1))
        W = jnp.where(cols == 0, c, pltpu.roll(c, 1, 1))
        o_ref[:] = N + S + E + W - 4 * c

    return pl.pallas_call(
        kernel, grid=(ny // ty,),
        in_specs=[
            pl.BlockSpec((ty, nx), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, nx), lambda i: (jnp.minimum((i + 1) * g, ngr - 1), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, nx), lambda i: (jnp.maximum(i * g - 1, 0), 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ty, nx), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=INTERPRET,
    )(x, x, x)


# 6. fused multi-output: {sum, |x|_1, min, max} in one read -------------------
def fused_stats(x, ty=128):
    ny, nx = x.shape
    grid = ny // ty

    def kernel(x_ref, s_ref, l1_ref, mn_ref, mx_ref):
        v = x_ref[:]
        s_ref[:] = jnp.full(s_ref.shape, jnp.sum(v))
        l1_ref[:] = jnp.full(l1_ref.shape, jnp.sum(jnp.abs(v)))
        mn_ref[:] = jnp.full(mn_ref.shape, jnp.min(v))
        mx_ref[:] = jnp.full(mx_ref.shape, jnp.max(v))

    pspec = pl.BlockSpec((8, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)
    pshape = jax.ShapeDtypeStruct((grid * 8, 128), jnp.float32)
    s, l1, mn, mx = pl.pallas_call(
        kernel, grid=(grid,),
        in_specs=[pl.BlockSpec((ty, nx), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[pspec] * 4, out_shape=[pshape] * 4,
        interpret=INTERPRET,
    )(x)

    def fin(p, red):
        return red(p.reshape(grid, 8, 128)[:, 0, 0])

    return fin(s, jnp.sum), fin(l1, jnp.sum), fin(mn, jnp.min), fin(mx, jnp.max)


def main():
    print(f"pallas tutorial (backend={jax.default_backend()}, "
          f"interpret={INTERPRET})")
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(256, 256)), jnp.float32)
    y = jnp.asarray(rng.normal(size=(256, 256)), jnp.float32)

    check("1 whole-array saxpy", saxpy_whole(2.5, x, y), 2.5 * x + y)
    check("2 gridded saxpy", saxpy_gridded(2.5, x, y), 2.5 * x + y)
    check("3 smem-scalar saxpy", saxpy_smem(1.7, x, y), 1.7 * x + y)
    check("4 block-parallel sum", block_sum(x), jnp.sum(x), atol=1e-2)
    xp = jnp.pad(x, 1, mode="edge")
    lap = (xp[2:, 1:-1] + xp[:-2, 1:-1] + xp[1:-1, 2:] + xp[1:-1, :-2]
           - 4 * x)
    check("5 halo stencil laplacian", laplacian_halo(x), lap)
    s, l1, mn, mx = fused_stats(x)
    check("6 fused stats sum", s, jnp.sum(x), atol=1e-2)
    check("6 fused stats L1", l1, jnp.sum(jnp.abs(x)), atol=1e-2)
    check("6 fused stats min", mn, jnp.min(x))
    check("6 fused stats max", mx, jnp.max(x))
    print("all tutorial kernels verified")


if __name__ == "__main__":
    main()
