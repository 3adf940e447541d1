"""Tire lateral-force models.

Reference parity (SURVEY.md §2 "Nonlinear vehicle simulator", §3.5): linear
in slip angle (``Fy = C * alpha``) and a simplified Pacejka / saturating
variant. Pure scalar jnp functions — vmap over axles, batch, horizon.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.config import VehicleParams

# Pacejka shape factor (magic-formula "C"); stiffness factor B is chosen so
# the small-slip slope D*C*B matches the linear cornering stiffness.
_PACEJKA_C = 1.3


def tire_force_linear(alpha, stiffness, fz_mu):
    """Linear tire: Fy = C * alpha (no saturation)."""
    del fz_mu
    return stiffness * alpha


def tire_force_pacejka(alpha, stiffness, fz_mu):
    """Simplified magic formula: Fy = D sin(C atan(B alpha)).

    D = mu * Fz (friction-limited peak), B = stiffness / (C * D) so that
    dFy/dalpha at 0 equals the linear cornering stiffness.
    """
    D = fz_mu
    B = stiffness / (_PACEJKA_C * jnp.maximum(D, 1e-6))
    return D * jnp.sin(_PACEJKA_C * jnp.arctan(B * alpha))


def tire_force(alpha, stiffness, fz_mu, tire: str):
    if tire == "linear":
        return tire_force_linear(alpha, stiffness, fz_mu)
    if tire == "pacejka":
        return tire_force_pacejka(alpha, stiffness, fz_mu)
    raise ValueError(f"unknown tire model: {tire!r}")


def axle_loads(p: VehicleParams):
    """Static axle normal loads (Fzf, Fzr) scaled by friction mu."""
    L = p.lf + p.lr
    fzf = p.m * p.g * p.lr / L
    fzr = p.m * p.g * p.lf / L
    return p.mu * fzf, p.mu * fzr
