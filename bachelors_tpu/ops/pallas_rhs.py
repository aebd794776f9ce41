"""Fused Pallas RHS kernel (single HBM pass: blend + BC + stencil + physics).

Placeholder gate: the fused kernel lands in the next milestone; until then
``supports()`` returns False so the auto backend uses the XLA path.
"""
from __future__ import annotations

from ..core.params import SimParams


def supports(p: SimParams) -> bool:
    return False


def rhs_pallas(Fb, Ub, p: SimParams, fu=0.0, dirichlet_value=0.0,
               is_euler: bool = False):
    raise NotImplementedError("pallas RHS backend not available yet")
