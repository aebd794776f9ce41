"""Exact 2D Frank-disk (one-phase Stefan) benchmark solution.

The reference's manufactured radial solution (`exact.h`, re-expressed in
`models/exact.py`) is flagged broken upstream ("slightly broken! do not
use", `simulation.h:17`); numerically its outer profile has an O(1) heat
equation residual (see tests/test_exact.py) because it grafts a
time-varying Gibbs-Thomson front temperature onto a profile that can only
be exact for a constant one.

This module provides the *correct* classical solution the thesis profile
approximates: the 2D Frank disk.  A solid disk grows as

    R(t) = sqrt(R0^2 + 2*lambda*t)        (same front law as the thesis)

and with tau = t + R0^2/(2*lambda) (so R^2 = 2*lambda*tau) the temperature

    u(r, t) = 0                                   for r <= R(t)
    u(r, t) = -Delta * [1 - E1(r^2/(4 tau)) / E1(lambda/2)]   for r > R(t)

satisfies the heat equation u_t = lap(u) EXACTLY for r > R (E1(r^2/4tau)
is an exact radial 2D heat solution), is continuous at the front
(u(R) = 0 = the melting temperature), and satisfies the Stefan energy
balance  L * dR/dt = -du/dr|_{R+}  (latent heat released at the advancing
front flows into the undercooled liquid, where du/dr < 0) when the
undercooling is

    Delta = L * (lambda/2) * exp(lambda/2) * E1(lambda/2).

No forcing term is needed -- unlike the thesis profile.  Used by
tests/test_exact.py to validate the heat-equation path of every integrator
against a true analytic solution.
"""
from __future__ import annotations

import dataclasses
import math

import jax.numpy as jnp
from jax.scipy.special import expi


def E1(x):
    """Exponential integral E1(x) = -Ei(-x), x > 0."""
    return -expi(-x)


@dataclasses.dataclass(frozen=True)
class FrankParams:
    lam: float = 0.5     # growth constant: R^2 = R0^2 + 2*lam*t
    R_ini: float = 0.25
    L: float = 1.0       # latent heat in the Stefan balance

    @property
    def delta(self) -> float:
        """Far-field undercooling fixed by the Stefan condition."""
        x = self.lam / 2
        # scipy-free scalar E1 via the jnp implementation
        e1 = float(E1(jnp.asarray(x, jnp.float64)))
        return self.L * x * math.exp(x) * e1

    @property
    def t0(self) -> float:
        return self.R_ini ** 2 / (2 * self.lam)


DEFAULT = FrankParams()


def frank_R(t, p: FrankParams = DEFAULT):
    return jnp.sqrt(p.R_ini ** 2 + 2 * p.lam * t)


def frank_u(t, r, p: FrankParams = DEFAULT):
    tau = t + p.t0
    xi = r * r / (4 * tau)
    e1_front = E1(jnp.asarray(p.lam / 2, jnp.result_type(float, r)))
    outside = -p.delta * (1 - E1(jnp.maximum(xi, 1e-30)) / e1_front)
    Rt = frank_R(t, p)
    return jnp.where(r <= Rt, 0.0, outside)


def frank_phi(t, r, p: FrankParams = DEFAULT):
    return jnp.where(r <= frank_R(t, p), 1.0, 0.0)
