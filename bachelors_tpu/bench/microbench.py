"""Reduction micro-benchmark (the ``run_benchmarks`` hook).

The analog of the reference's reduction benchmark sweep
(`simulation.cu:1300-1358`): f32 max-reduce bandwidth over a size sweep,
comparing the fused stats reduction and plain max, reporting GB/s.  The
reference compares CPU vs thrust vs its custom tree (`plot.py:731-733`
records 68 GB/s peak on consumer hardware, ~450 GB/s-class on A100); on TPU
both paths lower through XLA's reduction emitter.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.reductions import field_stats
from ..parallel.topology import Topology
from ..utils.logging import get_logger
from ..utils.timing import benchmark_median

log = get_logger("bench")


def run_reduction_benchmark(n_max: int = 2 * 4096 * 4096) -> list:
    sizes = []
    n = 256 * 256
    while n <= n_max:
        sizes.append(n)
        n *= 4
    if not sizes:
        sizes = [n_max]

    topo = Topology()
    results = []
    key = jax.random.PRNGKey(0)
    for n in sizes:
        x = jax.random.uniform(key, (n,), jnp.float32)

        max_fn = jax.jit(lambda a: jnp.max(a))
        stats_fn = jax.jit(lambda a: field_stats(a, topo))

        t_max = benchmark_median(lambda: max_fn(x), max_time_s=0.5).median
        t_stats = benchmark_median(lambda: stats_fn(x), max_time_s=0.5).median

        bytes_ = n * 4
        r = dict(n=n,
                 max_gbps=bytes_ / t_max / 1e9,
                 fused_stats_gbps=bytes_ / t_stats / 1e9)
        results.append(r)
        log.info(f"reduce n={n}: max {r['max_gbps']:.1f} GB/s, "
                 f"fused stats {r['fused_stats_gbps']:.1f} GB/s")
    return results
