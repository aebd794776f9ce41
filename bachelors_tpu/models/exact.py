"""Manufactured radial ("expanding circle") benchmark solution.

Re-expression of the reference's analytic benchmark (`exact.h`): a circular
solid seed of initial radius R0 growing as

    R(t)   = sqrt(R0^2 + 2*lambda*t)
    phi    = 1 inside r <= R(t), 0 outside
    u      = U(t)                      for r <= R(t)
    u      = U(t) + T(r/R(t))          for r >  R(t)
    U(t)   = -eps*(lambda+2)/R(t)
    T(s)   = -lambda*e^{lambda/2} * [ e^{-lambda/2} - e^{-lambda s^2/2}/s
              + sqrt(lambda/2)*pi*(erf(sqrt(lambda/2)) - erf(s*sqrt(lambda/2))) ]
    f_u(t) = eps*lambda*(lambda+2)/R(t)^3       (heat-equation forcing)

Consistency: f_u = dU/dt (the forcing compensates the moving plateau), and
T(1) = 0 so u is continuous across the front.

NOTE: the upstream subsystem is flagged "slightly broken! do not use"
(`simulation.h:17`).  tests/test_exact.py quantifies the actual PDE residual
of this profile numerically rather than trusting it; the framework treats it
as a *manufactured* solution (used with the matching forcing term), for
which internal consistency -- not exactness of the closed form -- is what
the validation relies on.
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import jax.scipy.special as jsp


@dataclasses.dataclass(frozen=True)
class ExactParams:
    """Fixed benchmark constants (`exact.h:89-96`)."""

    lam: float = 0.5
    R_ini: float = 0.25
    epsilon: float = 0.001


DEFAULT = ExactParams()


def exact_R(t, p: ExactParams = DEFAULT):
    return jnp.sqrt(p.R_ini * p.R_ini + 2 * p.lam * t)


def exact_U(t, p: ExactParams = DEFAULT):
    """Inner-plateau temperature (Gibbs-Thomson-like undercooling)."""
    return -p.epsilon * (p.lam + 2) / exact_R(t, p)


def exact_T_profile(s, p: ExactParams = DEFAULT):
    """Outer similarity temperature profile T(s), s = r/R(t) >= 1."""
    lam = p.lam
    sqrtl2 = jnp.sqrt(lam / 2.0)
    integral = (
        jnp.exp(-lam / 2)
        - jnp.exp(-lam / 2 * s * s) / s
        + sqrtl2 * jnp.pi * (jsp.erf(sqrtl2) - jsp.erf(s * sqrtl2))
    )
    return -lam * jnp.exp(lam / 2) * integral


def exact_fu(t, p: ExactParams = DEFAULT):
    """Heat forcing f_u = dU/dt = eps*lam*(lam+2)/R^3 (`exact.h:37-42`)."""
    Rt = exact_R(t, p)
    return p.epsilon * p.lam * (p.lam + 2) / (Rt * Rt * Rt)


def exact_u(t, r, p: ExactParams = DEFAULT):
    """Temperature field at radius r, time t."""
    Rt = exact_R(t, p)
    s = jnp.maximum(r / Rt, 1.0)
    return exact_U(t, p) + jnp.where(r > Rt, exact_T_profile(s, p), 0.0)


def exact_phi(t, r, p: ExactParams = DEFAULT):
    """Sharp-interface phase indicator."""
    return jnp.where(r <= exact_R(t, p), 1.0, 0.0)


def exact_phi_ini(r, xi, p: ExactParams = DEFAULT, fade: float = 1.0):
    """Smoothed initial phase profile: linear ramp of width fade*xi around
    R_ini (`exact.h:70-87`)."""
    lo = p.R_ini - fade * xi / 2
    hi = p.R_ini + fade * xi / 2
    ramp = 1 - (r - lo) / (hi - lo)
    return jnp.clip(ramp, 0.0, 1.0)


def radius_grid(nx: int, ny: int, L0: float, dtype=jnp.float32):
    """Cell-center distances from the domain center, matching the reference's
    convention pos = ((i+0.5)/n)*L0 (`main.cpp:101`, `simulation.cu:1079-1082`)."""
    dx = L0 / nx
    dy = L0 / ny
    x = (jnp.arange(nx, dtype=dtype) + 0.5) * dx - L0 / 2
    y = (jnp.arange(ny, dtype=dtype) + 0.5) * dy - L0 / 2
    return jnp.sqrt(x[None, :] ** 2 + y[:, None] ** 2)
