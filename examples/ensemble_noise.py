"""Ensemble study: nucleation sensitivity to initial-temperature noise.

Runs B independent simulations as ONE vmapped program (the data-parallel
axis, `parallel/sharded.make_ensemble_stepper` without a mesh), each with a
different Perlin-noise perturbation of the initial undercooling, and renders
the ensemble mean and standard deviation of the phase field -- the kind of
uncertainty map the reference could only produce by running config files
sequentially (`main.cpp:244`).

Usage:
    python examples/ensemble_noise.py [--members 8] [--size 256]
                                      [--steps 4000] [--out ensemble.png]

Equivalent driver run: `[tpu] ensemble = 8` + `[initial] noise_T = 0.02`.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

import bachelors_tpu as bt
from bachelors_tpu.solvers.base import make_stepper
from bachelors_tpu.solvers.run import advance_n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--members", type=int, default=8)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--steps", type=int, default=4000)
    ap.add_argument("--noise", type=float, default=0.02)
    ap.add_argument("--out", default="ensemble.png")
    args = ap.parse_args()

    n = args.size
    p = bt.SimParams(nx=n, ny=n, L0=4.0 * n / 512,
                     solver=bt.SolverType.EXPLICIT_RK4,
                     dt=5e-6, S=0.3, m0=6.0, theta0=0.1, dtype="float32")

    # per-member initial conditions: same seed crystal, different noise
    members = []
    for seed in range(args.members):
        F, U = bt.make_initial_fields(p, bt.InitialConditions(
            circle_center=(p.L0 / 2, p.L0 / 2), circle_radius=p.L0 / 60,
            circle_fade=4.0, noise_T=args.noise, noise_seed=seed))
        members.append(bt.make_state(F, U, p))
    state = jax.tree.map(lambda *xs: jnp.stack(xs), *members)

    step = jax.vmap(make_stepper(p))
    adv = jax.jit(lambda s, k: advance_n(step, s, k))

    t0 = time.perf_counter()
    state = adv(state, args.steps)
    jax.block_until_ready(state.F)
    dt_wall = time.perf_counter() - t0
    print(f"{args.members} members x {args.steps} RK4 steps at {n}^2: "
          f"{dt_wall:.2f}s "
          f"({args.members * args.steps / dt_wall:.0f} member-steps/s)")

    F = np.asarray(state.F)  # (B, ny, nx)
    mean, std = F.mean(axis=0), F.std(axis=0)

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 2, figsize=(11, 5), constrained_layout=True)
    im0 = axes[0].imshow(mean, origin="lower", cmap="viridis")
    axes[0].set_title(f"ensemble mean phase (B={args.members})")
    fig.colorbar(im0, ax=axes[0], shrink=0.85)
    im1 = axes[1].imshow(std, origin="lower", cmap="magma")
    axes[1].set_title("ensemble std (interface uncertainty)")
    fig.colorbar(im1, ax=axes[1], shrink=0.85)
    for ax in axes:
        ax.set_xticks([])
        ax.set_yticks([])
    fig.savefig(args.out, dpi=140)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
