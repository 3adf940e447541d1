"""Online friction adaptation: recursive estimation of the tire-road mu
from lateral-dynamics residuals, fed back into the LPV scheduling.

Reference parity: the reference lineage treats mu as a fixed constant set
at the top of ``main.py`` (SURVEY.md §2 "Experiment driver"); the LPV-MPC
papers it implements flag friction uncertainty as the dominant model error.
This module closes that loop: each control period, the measured state
transition is inverted for the axle lateral forces, compared against the
magic-formula prediction at the current mu-hat, and mu-hat is updated by a
scalar recursive-least-squares (Gauss-Newton) step. TPU-first design: the
estimator is a pure jittable function of arrays (scan/vmap-friendly — a
4096-scenario sweep adapts 4096 independent mu-hats in one program), and
the measurement sensitivity dFy/dmu comes from ``jax.grad`` of the actual
tire model rather than a hand-derived formula, so it stays correct if the
tire model changes.

Physics: with the dynamic-bicycle Frenet state (vx, vy, wz, e_psi, s, e_y)
and input (delta, a),

    m * (vy_dot + wz * vx) = Fyf * cos(delta) + Fyr
    Iz * wz_dot            = lf * Fyf * cos(delta) - lr * Fyr

is a 2x2 linear system in the axle forces: every control period yields a
MEASURED (Fyf, Fyr) from finite-differenced (vy_dot, wz_dot). The Pacejka
model predicts Fy(alpha; mu) with peak D = mu * Fz, so each axle supplies
one scalar residual for the RLS update. Near the linear region Fy is
mu-insensitive (dFy/dmu ~ 0); the update is excitation-gated by the
sensitivity magnitude so the estimate simply coasts on straights and
adapts in corners — the standard persistency-of-excitation guard.

Only the dynamic model carries a lateral-force channel; the kinematic
model (config 1) has no mu observability and is rejected at trace time.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..core.config import MPCConfig, SolverConfig, VehicleParams
from ..models.dynamics import VX_EPS
from ..models.tires import tire_force_pacejka
from ..track.track import Track
from .closed_loop import plant_step
from .mpc import mpc_init, mpc_step

MU_MIN = 0.1
MU_MAX = 1.5


class FrictionState(NamedTuple):
    """Scalar-RLS state for the friction estimate."""

    mu: jnp.ndarray    # current estimate
    P: jnp.ndarray     # RLS covariance (scalar)


def friction_init(mu0: float = 1.0, P0: float = 0.25) -> FrictionState:
    f32 = jnp.float32
    return FrictionState(mu=jnp.asarray(mu0, f32), P=jnp.asarray(P0, f32))


def measured_axle_forces(p: VehicleParams, x_prev, x_next, u, dt):
    """Invert the lateral dynamics for the axle forces over one period.

    Derivatives are finite differences of the measured state; slip angles
    and the gyroscopic term use the midpoint state (2nd-order accurate in
    dt, which matters: the plant sub-integrates at dt/10).
    Returns (fyf, fyr, alpha_f, alpha_r).
    """
    delta = u[0]
    x_mid = 0.5 * (x_prev + x_next)
    vx, vy, wz = x_mid[0], x_mid[1], x_mid[2]
    vy_dot = (x_next[1] - x_prev[1]) / dt
    wz_dot = (x_next[2] - x_prev[2]) / dt

    y1 = p.m * (vy_dot + wz * vx)      # = fyf*cos(delta) + fyr
    y2 = p.Iz * wz_dot                 # = lf*fyf*cos(delta) - lr*fyr
    L = p.lf + p.lr
    cd = jnp.cos(delta)
    # guard cos(delta) ~ 0 (never reached with |delta| <= ~0.3 rad)
    fyf = (p.lr * y1 + y2) / (L * jnp.where(jnp.abs(cd) < 0.1, 0.1, cd))
    fyr = (p.lf * y1 - y2) / L

    vx_safe = jnp.maximum(vx, VX_EPS)
    alpha_f = delta - jnp.arctan2(vy + p.lf * wz, vx_safe)
    alpha_r = -jnp.arctan2(vy - p.lr * wz, vx_safe)
    return fyf, fyr, alpha_f, alpha_r


def friction_step(
    p: VehicleParams,
    st: FrictionState,
    x_prev: jnp.ndarray,
    x_next: jnp.ndarray,
    u: jnp.ndarray,
    dt: float,
    forgetting: float = 0.995,
    min_sensitivity: float = 0.05,
) -> FrictionState:
    """One RLS update of mu-hat from one measured state transition.

    Two scalar measurements (front/rear axle force) are processed as
    sequential scalar RLS updates — no matrix inverse anywhere. Updates
    are gated on |dFy/dmu| >= min_sensitivity * Fz (per axle), so
    straight-line driving leaves the estimate untouched rather than
    letting noise random-walk it.
    """
    fyf_m, fyr_m, alpha_f, alpha_r = measured_axle_forces(
        p, x_prev, x_next, u, dt)

    L = p.lf + p.lr
    fzf = p.m * p.g * p.lr / L          # base loads, WITHOUT mu
    fzr = p.m * p.g * p.lf / L

    def h_axle(mu, alpha, stiffness, fz):
        return tire_force_pacejka(alpha, stiffness, mu * fz)

    def one_update(carry, meas):
        mu, P = carry
        y, alpha, stiffness, fz = meas
        h, J = jax.value_and_grad(h_axle)(mu, alpha, stiffness, fz)
        gate = jnp.abs(J) >= min_sensitivity * fz
        S = forgetting + J * P * J
        K = P * J / S
        mu2 = jnp.clip(mu + K * (y - h), MU_MIN, MU_MAX)
        P2 = (P - K * J * P) / forgetting
        return (jnp.where(gate, mu2, mu), jnp.where(gate, P2, P)), None

    meas = (
        jnp.stack([fyf_m, fyr_m]),
        jnp.stack([alpha_f, alpha_r]),
        jnp.stack([jnp.asarray(p.Cf, jnp.float32),
                   jnp.asarray(p.Cr, jnp.float32)]),
        jnp.stack([jnp.asarray(fzf, jnp.float32),
                   jnp.asarray(fzr, jnp.float32)]),
    )
    (mu, P), _ = jax.lax.scan(one_update, (st.mu, st.P), meas)
    return FrictionState(mu=mu, P=P)


class AdaptiveLog(NamedTuple):
    X: jnp.ndarray          # (T, nx) plant states
    U: jnp.ndarray          # (T, nu)
    mu_hat: jnp.ndarray     # (T,) friction estimate after each step
    converged: jnp.ndarray  # (T,)


def adaptive_closed_loop(
    p: VehicleParams,
    cfg: MPCConfig,
    scfg: SolverConfig,
    track: Track,
    x0: jnp.ndarray,
    x_ref: jnp.ndarray,
    T: int,
    mu_true: float,
    mu0: float = 1.0,
    sim_tire: str = "pacejka",
    n_sub: int = 10,
    forgetting: float = 0.995,
    adapt: bool = True,
) -> AdaptiveLog:
    """Closed loop with model mismatch: the PLANT runs at ``mu_true`` while
    the controller starts at ``mu0`` and (with ``adapt=True``) re-schedules
    its LPV + friction-circle speed caps on mu-hat every step. One jitted
    ``lax.scan`` over T — vmap/shard over scenarios like ``closed_loop``.

    ``adapt=False`` is the ablation arm: same program, estimator output
    ignored (for the adaptation-recovers-tracking test).
    """
    if cfg.model != "dynamic":
        raise ValueError("friction adaptation needs the dynamic model "
                         "(kinematic has no lateral-force channel)")
    p_plant = p.replace(mu=jnp.asarray(mu_true, jnp.float32))
    carry0 = mpc_init(p.replace(mu=jnp.asarray(mu0, jnp.float32)),
                      cfg, track, x0)
    fst0 = friction_init(mu0)

    def step(carry, _):
        x, mpc_carry, fst = carry
        # `adapt` is static: the ablation arm compiles the estimator out of
        # the control path but still logs its trace
        mu_ctrl = fst.mu if adapt else jnp.asarray(mu0, jnp.float32)
        p_hat = p.replace(mu=mu_ctrl)
        u, mpc_carry, diag = mpc_step(p_hat, cfg, scfg, track, x, x_ref,
                                      mpc_carry)
        x_next = plant_step(p_plant, cfg, track, x, u, n_sub=n_sub,
                            sim_tire=sim_tire)
        fst = friction_step(p, fst, x, x_next, u, cfg.dt,
                            forgetting=forgetting)
        out = (x_next, u, fst.mu, diag.converged)
        return (x_next, mpc_carry, fst), out

    (_, _, _), outs = jax.lax.scan(step, (x0, carry0, fst0), None, length=T)
    return AdaptiveLog(*outs)
