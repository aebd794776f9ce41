"""Independent fused-statistics Pallas kernel: the microbenchmark rival.

The reference cross-races CPU vs thrust vs its custom reduction tree
(`simulation.cu:1300-1358`, `cuda_reduction.cuh:534-568`) so a regression in
any one implementation shows up against the others.  The production stats
path here is one fused XLA reduction (`ops/reductions.field_stats`); this
module is the independent rival -- a hand-written Pallas kernel computing
the same {sum, L1, L2, min, max} bundle in one HBM pass with per-program
partials finished on the host side of the kernel -- used by
``bench/microbench.py`` for the cross-race and by tests as a second
implementation to validate against.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .reductions import Stats

_LANES = 128


def _kernel(x_ref, s_ref, l1_ref, l2_ref, mn_ref, mx_ref):
    v = x_ref[:]
    a = jnp.abs(v)
    s_ref[:] = jnp.full(s_ref.shape, jnp.sum(v))
    l1_ref[:] = jnp.full(l1_ref.shape, jnp.sum(a))
    l2_ref[:] = jnp.full(l2_ref.shape, jnp.sum(v * v))
    mn_ref[:] = jnp.full(mn_ref.shape, jnp.min(v))
    mx_ref[:] = jnp.full(mx_ref.shape, jnp.max(v))


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_field_stats(x: jnp.ndarray, interpret: bool = False) -> Stats:
    """One-pass {sum, L1, L2, min, max} of a float32 array via Pallas.

    Same conventions as ``reductions.field_stats``: L1 and L2 are *mean*
    norms (`cuda_reduction.cuh:390-406`).  Requires total size divisible by
    8*128 (pad or fall back to the XLA path otherwise).
    """
    n = x.size
    if n % (8 * _LANES) != 0:
        raise ValueError(f"size {n} not divisible by {8 * _LANES}")
    rows = n // _LANES
    v = x.reshape(rows, _LANES).astype(jnp.float32)
    ty = 8
    for cand in (512, 256, 128, 64, 32, 16, 8):
        if rows % cand == 0:
            ty = cand
            break
    grid = rows // ty

    part_spec = pl.BlockSpec((8, _LANES), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    part_shape = jax.ShapeDtypeStruct((grid * 8, _LANES), jnp.float32)
    s, l1, l2, mn, mx = pl.pallas_call(
        _kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec((ty, _LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[part_spec] * 5,
        out_shape=[part_shape] * 5,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(flops=5 * n, bytes_accessed=n * 4,
                                      transcendentals=0),
    )(v)

    def fin(p, red):
        return red(p.reshape(grid, 8, _LANES)[:, 0, 0])

    nn = jnp.float32(n)
    return Stats(
        sum=fin(s, jnp.sum),
        L1=fin(l1, jnp.sum) / nn,
        L2=jnp.sqrt(fin(l2, jnp.sum) / nn),
        min=fin(mn, jnp.min),
        max=fin(mx, jnp.max),
    )
