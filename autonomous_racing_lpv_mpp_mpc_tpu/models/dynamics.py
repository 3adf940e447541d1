"""Nonlinear bicycle dynamics in curvilinear (Frenet) track coordinates.

Reference parity (SURVEY.md §2 "Nonlinear vehicle simulator", §3.5): the
plant for the closed loop — dynamic bicycle with slip-angle tire forces,
plus the kinematic variant (BASELINE.json config 1). The reference keeps
both Frenet and global pose; here the Frenet ODE is the primary state (it is
what the MPC consumes) and global pose is recovered through
``track.frenet_to_global``.

State vectors (curvature ``kappa`` is a function of ``s`` via the track):

- dynamic   (nx=6): x = (vx, vy, wz, e_psi, s, e_y)
- kinematic (nx=4): x = (vx, e_psi, s, e_y)

inputs (nu=2): u = (delta, a)  [steering rad, longitudinal accel m/s^2]

All functions are pure jnp on scalars/vectors — ``vmap`` over batch and
horizon; curvature is passed in explicitly so the functions stay
track-agnostic and scan-friendly.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.config import VehicleParams
from .tires import axle_loads, tire_force

DYN_NX = 6
KIN_NX = 4
NU = 2

# scheduling floor on vx: the LPV entries divide by vx (SURVEY.md §2 "LPV
# model builder"); the plant also guards atan2 slip angles at standstill.
VX_EPS = 0.05

# floor on the Frenet denominator 1 - kappa*e_y: it crosses zero when the
# car is further from the centerline than the corner radius; clamping keeps
# the ODE/LPV finite so an off-track excursion stays recoverable.
DENOM_EPS = 0.1


def frenet_denom(kappa, ey):
    return jnp.maximum(1.0 - kappa * ey, DENOM_EPS)


def f_dynamic(p: VehicleParams, x, u, kappa, tire: str = "linear"):
    """Continuous-time dynamic-bicycle Frenet ODE, dx/dt.

    x = (vx, vy, wz, e_psi, s, e_y), u = (delta, a).
    """
    vx, vy, wz, epsi, _s, ey = x
    delta, a = u
    vx_safe = jnp.maximum(vx, VX_EPS)

    alpha_f = delta - jnp.arctan2(vy + p.lf * wz, vx_safe)
    alpha_r = -jnp.arctan2(vy - p.lr * wz, vx_safe)
    fzf_mu, fzr_mu = axle_loads(p)
    fyf = tire_force(alpha_f, p.Cf, fzf_mu, tire)
    fyr = tire_force(alpha_r, p.Cr, fzr_mu, tire)

    sd, cd = jnp.sin(delta), jnp.cos(delta)
    dvx = a - (fyf * sd) / p.m + wz * vy - (p.cd0 + p.cd1 * vx) / p.m
    dvy = (fyf * cd + fyr) / p.m - wz * vx
    dwz = (p.lf * fyf * cd - p.lr * fyr) / p.Iz

    se, ce = jnp.sin(epsi), jnp.cos(epsi)
    denom = frenet_denom(kappa, ey)
    sdot = (vx * ce - vy * se) / denom
    depsi = wz - kappa * sdot
    dey = vx * se + vy * ce
    return jnp.stack([dvx, dvy, dwz, depsi, sdot, dey])


def f_kinematic(p: VehicleParams, x, u, kappa, tire: str = "linear"):
    """Continuous-time kinematic-bicycle Frenet ODE (no tire slip).

    x = (vx, e_psi, s, e_y), u = (delta, a).  Yaw rate is the no-slip
    relation vx * tan(delta) / L (side-slip beta omitted — config-1 model).
    """
    del tire
    vx, epsi, _s, ey = x
    delta, a = u
    L = p.lf + p.lr

    dvx = a - (p.cd0 + p.cd1 * vx) / p.m
    psidot = vx * jnp.tan(delta) / L
    se, ce = jnp.sin(epsi), jnp.cos(epsi)
    denom = frenet_denom(kappa, ey)
    sdot = vx * ce / denom
    depsi = psidot - kappa * sdot
    dey = vx * se
    return jnp.stack([dvx, depsi, sdot, dey])


def f_model(p: VehicleParams, x, u, kappa, model: str, tire: str = "linear"):
    if model == "dynamic":
        return f_dynamic(p, x, u, kappa, tire)
    if model == "kinematic":
        return f_kinematic(p, x, u, kappa, tire)
    raise ValueError(f"unknown model: {model!r}")


def model_nx(model: str) -> int:
    return {"dynamic": DYN_NX, "kinematic": KIN_NX}[model]
