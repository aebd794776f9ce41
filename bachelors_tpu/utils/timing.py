"""Benchmark timing harness.

Replicates the shape of the reference's micro-benchmark machinery
(`simulation.cu:1193-1267` ``benchmark_median``): warmup, wall-clock budget,
per-run timings, sorted -> median/avg/min/max plus percentile-trimmed stats.
Device work is synchronized with ``block_until_ready`` (the analog of CUDA
event timing, `simulation.cu:708-729`).
"""
from __future__ import annotations

import dataclasses
import time
from typing import Callable, List, Optional

import jax


@dataclasses.dataclass
class BenchStats:
    runs: int
    median: float
    average: float
    min: float
    max: float
    p10: float
    p90: float

    def __str__(self):
        return (f"median {self.median*1e3:.3f}ms avg {self.average*1e3:.3f}ms "
                f"min {self.min*1e3:.3f}ms max {self.max*1e3:.3f}ms ({self.runs} runs)")


def benchmark_median(fn: Callable[[], object], *, warmup: int = 3,
                     max_time_s: float = 2.0, min_runs: int = 5,
                     max_runs: int = 1000) -> BenchStats:
    """Time ``fn`` (which must return a jax array or pytree to sync on)."""
    for _ in range(warmup):
        jax.block_until_ready(fn())

    times: List[float] = []
    t_budget_start = time.perf_counter()
    while (len(times) < min_runs
           or (time.perf_counter() - t_budget_start < max_time_s
               and len(times) < max_runs)):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        times.append(time.perf_counter() - t0)

    times.sort()
    n = len(times)
    return BenchStats(
        runs=n,
        median=times[n // 2],
        average=sum(times) / n,
        min=times[0],
        max=times[-1],
        p10=times[int(n * 0.10)],
        p90=times[min(int(n * 0.90), n - 1)],
    )


def benchmark_steps(step_fn: Callable, state, n_steps: int, *, warmup: int = 2,
                    repeats: int = 5):
    """Time ``n_steps`` chained applications of a jitted step function.

    Returns (seconds_per_step_median, final_state).
    """
    s = state
    for _ in range(warmup):
        s = step_fn(s)
    jax.block_until_ready(jax.tree.leaves(s)[0])

    per_step: List[float] = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(n_steps):
            s = step_fn(s)
        jax.block_until_ready(jax.tree.leaves(s)[0])
        per_step.append((time.perf_counter() - t0) / n_steps)
    per_step.sort()
    return per_step[len(per_step) // 2], s
