"""Scalar ODE integration playground.

The analog of the reference's `integration_methods.h`: small, readable
scalar versions of the framework's time integrators (Euler, semi-implicit
Euler, RK4, adaptive Runge-Kutta-Merson) for studying order/step-size
behavior against closed-form solutions -- the scaffolding from which the
PDE steppers' tableaus are validated (the RKM tableau here is the same one
`solvers/explicit.rkm_adaptive_step` uses).

All integrators are jittable and operate on scalar (or pytree) states.
"""
from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
from jax import lax


def euler(f: Callable, x0, t0: float, t1: float, dt: float):
    n = int(round((t1 - t0) / dt))

    def body(i, carry):
        x, t = carry
        return x + dt * f(t, x), t + dt

    x, _ = lax.fori_loop(0, n, body, (jnp.asarray(x0, jnp.float64 if jax.config.read("jax_enable_x64") else jnp.float32), jnp.asarray(t0)))
    return x


def semi_implicit_euler(f: Callable, x0, t0: float, t1: float, dt: float,
                        fixed_point_iters: int = 3):
    """Implicit Euler x' = x + dt f(t+dt, x') via fixed-point iteration --
    the scalar shape of the corrector loop."""
    n = int(round((t1 - t0) / dt))

    def body(i, carry):
        x, t = carry
        xp = x
        for _ in range(fixed_point_iters):
            xp = x + dt * f(t + dt, xp)
        return xp, t + dt

    x, _ = lax.fori_loop(0, n, body, (jnp.asarray(x0), jnp.asarray(t0)))
    return x


def rk4(f: Callable, x0, t0: float, t1: float, dt: float):
    n = int(round((t1 - t0) / dt))

    def body(i, carry):
        x, t = carry
        k1 = f(t, x)
        k2 = f(t + dt / 2, x + dt / 2 * k1)
        k3 = f(t + dt / 2, x + dt / 2 * k2)
        k4 = f(t + dt, x + dt * k3)
        return x + dt / 6 * (k1 + 2 * k2 + 2 * k3 + k4), t + dt

    x, _ = lax.fori_loop(0, n, body, (jnp.asarray(x0), jnp.asarray(t0)))
    return x


def rk_merson(f: Callable, x0, t0: float, t1: float, dt0: float,
              tolerance: float = 1e-8, min_dt: float = 1e-12,
              max_steps: int = 100000):
    """Adaptive Runge-Kutta-Merson with the same tableau and step control
    as the PDE stepper (`solvers/explicit.rkm_adaptive_step`):
        eps = tau/3 * |0.2 k1 - 0.9 k3 + 0.8 k4 - 0.1 k5|
        tau <- (tol/eps)^0.2 * 4/5 * tau
    Returns (x(t1), steps_taken)."""
    tol = jnp.asarray(tolerance)

    def cond(carry):
        x, t, tau, steps = carry
        return jnp.logical_and(t < t1 - 1e-15, steps < max_steps)

    def body(carry):
        x, t, tau, steps = carry
        tau = jnp.minimum(tau, t1 - t)
        k1 = f(t, x)
        k2 = f(t + tau / 3, x + tau / 3 * k1)
        k3 = f(t + tau / 3, x + tau / 6 * (k1 + k2))
        k4 = f(t + tau / 2, x + tau / 8 * (k1 + 3 * k3))
        k5 = f(t + tau, x + tau / 2 * (k1 - 3 * k3 + 4 * k4))
        eps = tau / 3 * jnp.abs(0.2 * k1 - 0.9 * k3 + 0.8 * k4 - 0.1 * k5)
        accept = eps < tol
        x_new = x + tau / 6 * (k1 + 4 * k4 + k5)
        x = jnp.where(accept, x_new, x)
        t = jnp.where(accept, t + tau, t)
        new_tau = (tol / jnp.maximum(eps, 1e-20)) ** 0.2 * 0.8 * tau
        new_tau = jnp.maximum(new_tau, min_dt)
        return x, t, new_tau, steps + 1

    x, t, tau, steps = lax.while_loop(
        cond, body, (jnp.asarray(x0, jnp.float64 if jax.config.read("jax_enable_x64") else jnp.float32),
                     jnp.asarray(t0, jnp.float64 if jax.config.read("jax_enable_x64") else jnp.float32),
                     jnp.asarray(dt0), jnp.asarray(0)))
    return x, steps
