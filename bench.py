"""Headline benchmark: cell-updates/sec at 2048^2 explicit-RK4 (BASELINE.json).

Reference number to beat: A100 RK4 at 2048^2 = 2.34 ms/step = 1.79e9
cell-steps/s (`BASELINE.md`, `benchmark_ellapsed_times.txt:111`).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

Timing method: two device-side fori_loop runs (K big, k small) bracketed by
forced scalar fetches; (T_big - T_small)/(K - k) cancels dispatch/sync
overhead of the tunnel, mirroring the reference's percentile-trimmed
median harness intent (`simulation.cu:1193-1267`).
"""
import json
import os
import sys
import threading
import time

sys.path.insert(0, __file__.rsplit("/", 1)[0])

import jax
import jax.numpy as jnp

import bachelors_tpu as bt
from bachelors_tpu.solvers.run import advance_n

BASELINE_RK4_CELLS_PER_S = 1.79e9  # A100, 2048^2, f64
BASELINE_EULER_STEP_MS = 0.44      # A100 Euler step time at 2048^2

# tunnel resilience (CLAUDE.md "tunnel degradation mode"): the axon TPU
# backend sometimes (a) fails init with UNAVAILABLE, or (b) stalls the
# FIRST device->host transfer of a process 3-10 min.  Before any timed
# section we run exactly the documented stall diagnostic with a bounded
# wait, and on transient failure we re-exec a fresh process (backend init
# state is per-process) with backoff instead of dying rc=1.
MAX_ATTEMPTS = 3
PROBE_TIMEOUT_S = float(os.environ.get("BENCH_PROBE_TIMEOUT_S", "900"))
_BACKOFF_S = (30, 120)  # sleep before attempt 1, 2


def _probe_first_fetch(timeout_s: float):
    """Run the one-liner stall diagnostic (`float(jnp.float32(2.5))`) in a
    side thread with a bounded wait.  Returns (ok, waited_seconds).  A
    degraded tunnel makes only the first fetch slow; once this returns,
    subsequent fetches are fast and timing is trustworthy."""
    result: dict = {}

    def probe():
        try:
            result["value"] = float(jnp.float32(2.5))
        except Exception as e:  # noqa: BLE001 - reported to the caller
            result["error"] = e

    t0 = time.perf_counter()
    th = threading.Thread(target=probe, daemon=True)
    th.start()
    th.join(timeout_s)
    waited = time.perf_counter() - t0
    if th.is_alive():
        return False, waited
    if "error" in result:
        raise result["error"]
    return True, waited


def _transient(e: BaseException) -> bool:
    msg = f"{type(e).__name__}: {e}"
    return any(s in msg for s in ("UNAVAILABLE", "DEADLINE_EXCEEDED",
                                  "backend setup", "connection dropped",
                                  "first-fetch stall"))


def _retry_or_report(e: BaseException, extra: dict):
    """Re-exec a fresh process with backoff on transient device failures;
    after MAX_ATTEMPTS, emit a well-formed degraded-note JSON line (rc 0)
    so the round artifact records WHAT failed instead of dying rc=1."""
    attempt = int(os.environ.get("BENCH_ATTEMPT", "0"))
    if _transient(e) and attempt + 1 < MAX_ATTEMPTS:
        wait = _BACKOFF_S[min(attempt, len(_BACKOFF_S) - 1)]
        print(f"bench: transient device failure (attempt {attempt + 1}/"
              f"{MAX_ATTEMPTS}): {str(e)[:200]}; retrying in {wait}s",
              file=sys.stderr, flush=True)
        time.sleep(wait)
        env = dict(os.environ, BENCH_ATTEMPT=str(attempt + 1))
        os.execve(sys.executable, [sys.executable, os.path.abspath(__file__)],
                  env)
    out = {
        "metric": "cell-updates/sec/chip, 2048^2 explicit-RK4 (f32)",
        "value": 0.0,
        "unit": "cells/s",
        "vs_baseline": 0.0,
        "error": f"device unavailable after {attempt + 1} attempts: "
                 f"{str(e)[:300]}",
    }
    out.update(extra)
    print(json.dumps(out))
    raise SystemExit(0)


def sync(x):
    return float(jnp.sum(x))


# --- north-star roofline (BASELINE.md: ">=80% of HBM-roofline
# cell-updates/sec").  The memory-bound kernel class of this framework is
# the CG iteration (RESULTS.md "the HBM floor model"): 44 B/cell/iteration
# -- fused matvec+<p,Ap> with dead-buffer output aliasing (8 B/cell),
# fused x/r update (24 B/cell), in-place axpby (12 B/cell).  The explicit
# solvers at the 2048^2 headline size are cache-resident/VPU-bound
# (effective rates exceed HBM bandwidth there), so the roofline fraction
# is measured at a true-HBM size (8192^2) against a SAME-PROCESS stream
# probe (HBM timings vary ~50% between processes, CLAUDE.md).  Reference
# habit being matched: its GB/s printouts (`simulation.cu:1269-1296`).
CG_ITER_BYTES_PER_CELL = 44.0
STREAM_BYTES_PER_CELL = 12.0  # in-place axpby: read r, read p, write p


def roofline_cg(n=8192):
    """Returns the roofline sub-dict: measured stream GB/s, production CG
    iteration cost, its effective GB/s, and the roofline fraction."""
    import numpy as np

    from bachelors_tpu.ops.pallas_cg import axpby_inplace, cross_matvec_pAp
    from bachelors_tpu.ops.stencil import CrossMatrix

    rng = np.random.default_rng(0)
    # big arrays as jit OPERANDS, never closures (HTTP 413, CLAUDE.md)
    r = jnp.asarray(rng.normal(size=(n, n)).astype(np.float32))
    pv = jnp.asarray(rng.normal(size=(n, n)).astype(np.float32))

    @jax.jit
    def stream(r, pv, reps):
        def body(_, pv):
            return axpby_inplace(1.0, 0.9999, r, pv)
        return jax.lax.fori_loop(0, reps, body, pv)

    k_big, k_small = 64, 8
    sync(stream(r, pv, k_small))
    sync(stream(r, pv, k_big))
    t0 = time.perf_counter()
    sync(stream(r, pv, k_small))
    t_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    sync(stream(r, pv, k_big))
    t_b = time.perf_counter() - t0
    t_axpby = (t_b - t_s) / (k_big - k_small)
    stream_gbps = STREAM_BYTES_PER_CELL * n * n / t_axpby / 1e9

    # production CG: the implicit-heat operator at ladder-parity dx
    p_si = bt.SimParams(nx=n, ny=n, L0=4.0 * n / 512, dt=5e-6,
                        solver=bt.SolverType.SEMI_IMPLICIT, dtype="float32")
    A = CrossMatrix.implicit_heat(p_si)
    mv = lambda v, out=None: cross_matvec_pAp(A, v, out=out)

    from bachelors_tpu.solvers.cg import cg_solve

    def make_solver(iters):
        def run(b):
            # tolerance 0 never converges: exactly `iters` iterations
            x, _res = cg_solve(lambda v: v, b, tolerance=0.0,
                               max_iters=iters, matvec_pAp=mv)
            return x
        return jax.jit(run)

    deep, shallow = make_solver(24), make_solver(4)
    sync(shallow(r))
    sync(deep(r))
    t0 = time.perf_counter()
    sync(shallow(r))
    t_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    sync(deep(r))
    t_b = time.perf_counter() - t0
    t_iter = (t_b - t_s) / 20
    eff_gbps = CG_ITER_BYTES_PER_CELL * n * n / t_iter / 1e9
    return {
        "grid": n,
        "stream_gbps": round(stream_gbps, 1),
        "cg_iter_ms": round(t_iter * 1e3, 4),
        "cg_iter_bytes_per_cell": CG_ITER_BYTES_PER_CELL,
        "effective_gbps": round(eff_gbps, 1),
        "roofline_frac": round(eff_gbps / stream_gbps, 3),
        "note": "memory-bound kernel class (CG iteration) at a true-HBM "
                "size; the 2048^2 solver rows are cache-resident/VPU-bound "
                "(effective rates exceed HBM bandwidth -- RESULTS.md)",
    }


def time_steps(p, k_big, k_small):
    F, U = bt.make_initial_fields(p, bt.InitialConditions(
        circle_center=(p.L0 / 2, p.L0 / 2), circle_radius=p.L0 / 80))
    st0 = bt.make_state(F, U, p)
    step = bt.make_stepper(p)
    from bachelors_tpu.parallel.topology import Topology
    from bachelors_tpu.solvers.explicit import make_euler_pair_stepper

    pair = make_euler_pair_stepper(p, Topology())  # the driver fast path
    adv = jax.jit(lambda s, n: advance_n(step, s, n, pair_stepper=pair))

    sync(adv(st0, k_small).F)   # compile small
    sync(adv(st0, k_big).F)     # compile big
    t0 = time.perf_counter()
    sync(adv(st0, k_small).F)
    t_small = time.perf_counter() - t0
    t0 = time.perf_counter()
    sync(adv(st0, k_big).F)
    t_big = time.perf_counter() - t0
    return (t_big - t_small) / (k_big - k_small)


def main():
    # persistent compile cache: the tunnel's compile service is slow and can
    # saturate; cached modules make reruns near-instant
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    except Exception:
        pass

    probe_note = {}
    try:
        ok, waited = _probe_first_fetch(PROBE_TIMEOUT_S)
        if not ok:
            raise RuntimeError(
                f"first-fetch stall: the initial device->host transfer did "
                f"not complete within {PROBE_TIMEOUT_S:.0f}s (tunnel "
                f"degradation mode, CLAUDE.md)")
        if waited > 30:
            # degraded-but-recovered: note it; timing below is trustworthy
            # (only the first fetch of a process stalls)
            probe_note["degraded_first_fetch_s"] = round(waited, 1)
            print(f"bench: tunnel degraded, first fetch took {waited:.0f}s; "
                  "proceeding (subsequent fetches are unaffected)",
                  file=sys.stderr, flush=True)
        on_tpu = jax.default_backend() == "tpu"
    except SystemExit:
        raise
    except BaseException as e:  # noqa: BLE001 - includes jax fatal errors
        _retry_or_report(e, {})
        return

    n = 2048 if on_tpu else 256
    k_big, k_small = (2000, 16) if on_tpu else (50, 4)

    # ladder-parity geometry: the reference benchmark scales L0 with the
    # grid (scale multiplies nx and L0, `config.h:481-490`), keeping dx
    # fixed at 4/512 -- this sets the implicit systems' stiffness, so the
    # semi-implicit iteration counts are only comparable at the same dx
    p = bt.SimParams(nx=n, ny=n, L0=4.0 * n / 512,
                     solver=bt.SolverType.EXPLICIT_RK4,
                     dt=5e-6, S=0.0, dtype="float32")
    try:
        sec_per_step = time_steps(p, k_big, k_small)
    except SystemExit:
        raise
    except BaseException as e:  # noqa: BLE001 - includes jax fatal errors
        _retry_or_report(e, probe_note)
        return
    cells_per_s = n * n / sec_per_step

    out = {
        "metric": f"cell-updates/sec/chip, {n}^2 explicit-RK4 (f32)",
        "value": round(cells_per_s, 1),
        "unit": "cells/s",
        "vs_baseline": round(cells_per_s / BASELINE_RK4_CELLS_PER_S, 3),
        "rk4_step_ms": round(sec_per_step * 1e3, 4),
        "grid": n,
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
    }
    out.update(probe_note)

    # secondary solvers, best-effort (A100 reference at 2048^2: Euler
    # 0.44 ms, RKM 3.77 ms, S-I 4.26 ms)
    try:
        euler_sec = time_steps(p.replace(solver=bt.SolverType.EXPLICIT_EULER),
                               k_big, k_small)
        out["euler_step_ms"] = round(euler_sec * 1e3, 4)
        out["euler_vs_baseline"] = round(BASELINE_EULER_STEP_MS / (euler_sec * 1e3), 3)

        rkm_sec = time_steps(
            p.replace(solver=bt.SolverType.EXPLICIT_RK4_ADAPTIVE, min_dt=1e-9),
            max(k_big // 4, 8), k_small)
        out["rkm_step_ms"] = round(rkm_sec * 1e3, 4)
        out["rkm_vs_baseline"] = round(3.77 / (rkm_sec * 1e3), 3)

        si_sec = time_steps(p.replace(solver=bt.SolverType.SEMI_IMPLICIT),
                            max(k_big // 16, 8), k_small)
        out["semi_implicit_step_ms"] = round(si_sec * 1e3, 4)
        out["semi_implicit_vs_baseline"] = round(4.26 / (si_sec * 1e3), 3)
    except Exception as e:  # noqa: BLE001 - headline metric must still print
        out["secondary_error"] = str(e)[:120]

    if on_tpu:
        # the north-star number (BASELINE.md: >=80% of HBM roofline)
        try:
            out["roofline"] = roofline_cg()
        except Exception as e:  # noqa: BLE001
            out["roofline_error"] = str(e)[:120]

        # equal-precision (float64-grade) Euler via the df64 pair kernels
        # (A100 native-f64 Euler at 2048^2: 0.4375 ms/step).  x64 flips
        # LAST: it forces retraces of later f32 jits in this process.
        try:
            jax.config.update("jax_enable_x64", True)
            e64_sec = time_steps(
                p.replace(solver=bt.SolverType.EXPLICIT_EULER,
                          dtype="float64"), 1296, k_small)
            out["euler_f64_step_ms"] = round(e64_sec * 1e3, 4)
            out["euler_f64_vs_baseline"] = round(0.4375 / (e64_sec * 1e3), 3)
        except Exception as e:  # noqa: BLE001
            out["euler_f64_error"] = str(e)[:120]

    print(json.dumps(out))


if __name__ == "__main__":
    main()
