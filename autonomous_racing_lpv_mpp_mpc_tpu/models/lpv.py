"""Quasi-LPV embedding: nonlinear bicycle -> A(theta) x + B(theta) u.

Reference parity (SURVEY.md §2 "LPV model builder"): THE core idea of the
reference — rewrite the nonlinear dynamics as a Linear Parameter-Varying
system scheduled on theta = (vx, vy, wz, delta, e_psi, e_y, kappa), evaluated
along the previous predicted trajectory (successive quasi-LPV scheduling,
SURVEY.md §3.2).

Embedding choices (standard for the Alcala et al. lineage):

- slip angles are linear-in-state with 1/vx_bar scheduling
  (atan dropped; exact at the scheduling point in the small-slip regime);
- trig of delta and e_psi is frozen at the scheduled value;
- ``d(e_y)/dt = vx sin(e_psi)`` uses the sinc embedding
  ``vx_bar * sinc(e_psi_bar) * e_psi`` so the prediction keeps the
  steering->heading->lateral-error coupling (A[ey, epsi] != 0) while being
  exact at the scheduling point;
- bilinear terms (wz*vy, wz*vx) freeze one factor.

Property tested in tests/test_lpv.py: at the scheduling point,
``A @ x_bar + B @ u_bar`` equals the (atan/tan-free) nonlinear dynamics.

``ltv_abc`` is the non-reference successive-linearization alternative
(exact Jacobians by jax.jacfwd + affine residual).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.config import VehicleParams
from .dynamics import VX_EPS, f_model, frenet_denom


def _sinc(x):
    # sin(x)/x, safe at 0
    return jnp.sinc(x / jnp.pi)


def _effective_stiffness(p: VehicleParams, x_bar, u_bar, tire: str):
    """(Cf_eff, Cr_eff): secant cornering stiffness at the scheduled slip.

    "Pacejka-linearized" LPV (BASELINE.json config 2): for the saturating
    tire, the LPV uses the secant slope Fy(alpha_bar)/alpha_bar of the magic
    formula at the scheduling point, so predictions soften as the car
    approaches the grip limit. For the linear tire this reduces to (Cf, Cr).
    """
    if tire == "linear":
        return p.Cf, p.Cr
    from .tires import axle_loads, tire_force_pacejka

    vx, vy, wz = x_bar[0], x_bar[1], x_bar[2]
    delta = u_bar[0]
    vxs = jnp.maximum(vx, VX_EPS)
    alpha_f = delta - jnp.arctan2(vy + p.lf * wz, vxs)
    alpha_r = -jnp.arctan2(vy - p.lr * wz, vxs)
    fzf_mu, fzr_mu = axle_loads(p)
    eps = 1e-4
    af = jnp.where(jnp.abs(alpha_f) < eps, eps, alpha_f)
    ar = jnp.where(jnp.abs(alpha_r) < eps, eps, alpha_r)
    cf = tire_force_pacejka(af, p.Cf, fzf_mu) / af
    cr = tire_force_pacejka(ar, p.Cr, fzr_mu) / ar
    return cf, cr


def lpv_ab_dynamic(p: VehicleParams, x_bar, u_bar, kappa, tire: str = "linear"):
    """Continuous-time (A, B) for the dynamic bicycle at scheduling point.

    x = (vx, vy, wz, e_psi, s, e_y), u = (delta, a).
    """
    vx, vy, wz, epsi, _s, ey = x_bar
    delta = u_bar[0]
    Cf, Cr = _effective_stiffness(p, x_bar, u_bar, tire)
    vxs = jnp.maximum(vx, VX_EPS)
    sd, cd = jnp.sin(delta), jnp.cos(delta)
    se, ce = jnp.sin(epsi), jnp.cos(epsi)
    denom = frenet_denom(kappa, ey)

    A = jnp.zeros((6, 6), dtype=jnp.result_type(vx))
    B = jnp.zeros((6, 2), dtype=jnp.result_type(vx))

    # vx row: a - Fyf sin(d)/m + wz vy - drag/m
    A = A.at[0, 0].set(-(p.cd1 + p.cd0 / vxs) / p.m)
    A = A.at[0, 1].set(Cf * sd / (p.m * vxs) + wz)
    A = A.at[0, 2].set(Cf * p.lf * sd / (p.m * vxs))
    B = B.at[0, 0].set(-Cf * sd / p.m)
    B = B.at[0, 1].set(1.0)

    # vy row: (Fyf cos(d) + Fyr)/m - wz vx
    A = A.at[1, 1].set(-(Cf * cd + Cr) / (p.m * vxs))
    A = A.at[1, 2].set((-Cf * p.lf * cd + Cr * p.lr) / (p.m * vxs) - vxs)
    B = B.at[1, 0].set(Cf * cd / p.m)

    # wz row: (lf Fyf cos(d) - lr Fyr)/Iz
    A = A.at[2, 1].set((-p.lf * Cf * cd + p.lr * Cr) / (p.Iz * vxs))
    A = A.at[2, 2].set(-(p.lf**2 * Cf * cd + p.lr**2 * Cr) / (p.Iz * vxs))
    B = B.at[2, 0].set(p.lf * Cf * cd / p.Iz)

    # e_psi row: wz - kappa * sdot
    A = A.at[3, 0].set(-kappa * ce / denom)
    A = A.at[3, 1].set(kappa * se / denom)
    A = A.at[3, 2].set(1.0)

    # s row: sdot = (vx ce - vy se)/denom
    A = A.at[4, 0].set(ce / denom)
    A = A.at[4, 1].set(-se / denom)

    # e_y row: vx se + vy ce  (sinc embedding on e_psi)
    A = A.at[5, 1].set(ce)
    A = A.at[5, 3].set(vxs * _sinc(epsi))

    return A, B


def lpv_ab_kinematic(p: VehicleParams, x_bar, u_bar, kappa):
    """Continuous-time (A, B) for the kinematic bicycle.

    x = (vx, e_psi, s, e_y), u = (delta, a).
    """
    vx, epsi, _s, ey = x_bar
    del u_bar
    vxs = jnp.maximum(vx, VX_EPS)
    L = p.lf + p.lr
    se, ce = jnp.sin(epsi), jnp.cos(epsi)
    denom = frenet_denom(kappa, ey)

    A = jnp.zeros((4, 4), dtype=jnp.result_type(vx))
    B = jnp.zeros((4, 2), dtype=jnp.result_type(vx))

    A = A.at[0, 0].set(-(p.cd1 + p.cd0 / vxs) / p.m)
    B = B.at[0, 1].set(1.0)

    # e_psi row: vx tan(delta)/L - kappa sdot   (tan(d) ~ d for authority in B)
    A = A.at[1, 0].set(-kappa * ce / denom)
    B = B.at[1, 0].set(vxs / L)

    # s row
    A = A.at[2, 0].set(ce / denom)

    # e_y row (sinc embedding)
    A = A.at[3, 1].set(vxs * _sinc(epsi))

    return A, B


def lpv_ab(p: VehicleParams, x_bar, u_bar, kappa, model: str, tire: str = "linear"):
    if model == "dynamic":
        return lpv_ab_dynamic(p, x_bar, u_bar, kappa, tire)
    if model == "kinematic":
        return lpv_ab_kinematic(p, x_bar, u_bar, kappa)
    raise ValueError(f"unknown model: {model!r}")


def ltv_abc(p: VehicleParams, x_bar, u_bar, kappa, model: str, tire: str = "linear"):
    """Exact Jacobian linearization with affine residual (LTV/SQP mode).

    Returns (A, B, c) with dx/dt ~= A x + B u + c, exact to first order at
    (x_bar, u_bar). Not what the reference does (its LPV uses no affine
    term), but strictly more accurate; selected by
    ``MPCConfig.linearization == "ltv"``.
    """
    f = lambda x, u: f_model(p, x, u, kappa, model, tire)
    A = jax.jacfwd(f, argnums=0)(x_bar, u_bar)
    B = jax.jacfwd(f, argnums=1)(x_bar, u_bar)
    c = f(x_bar, u_bar) - A @ x_bar - B @ u_bar
    return A, B, c
