"""Global-frame closed loop: plant in world coordinates + Frenet estimation.

Reference parity (SURVEY.md §2 "Nonlinear vehicle simulator", §3.4): the
reference simulates the plant in the GLOBAL frame (vx, vy, wz, X, Y, psi)
and recovers the Frenet state each step via ``map.getLocalPosition`` — the
exact structure rebuilt here with the branch-free ``global_to_frenet``.
Optionally the measured state is corrupted with Gaussian noise and filtered
by the EKF (SURVEY.md §2 "State estimator") before reaching the MPC.

The Frenet-native loop (closed_loop.py) is the fast path; this one is the
fidelity path — tests assert both agree on clean measurements.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..core.config import MPCConfig, SolverConfig, VehicleParams
from ..models.dynamics import VX_EPS
from ..models.tires import axle_loads, tire_force
from ..track.track import (
    Track,
    frenet_to_global,
    global_to_frenet,
    global_to_frenet_windowed,
)
from .mpc import mpc_init, mpc_step


class GlobalLog(NamedTuple):
    Xg: jnp.ndarray         # (T, 6) global plant states (vx, vy, wz, X, Y, psi)
    Xf: jnp.ndarray         # (T, 6) estimated Frenet states fed to the MPC
    U: jnp.ndarray          # (T, 2)
    converged: jnp.ndarray  # (T,)


def f_global(p: VehicleParams, xg, u, tire: str = "linear"):
    """World-frame dynamic bicycle ODE: xg = (vx, vy, wz, X, Y, psi)."""
    vx, vy, wz, _X, _Y, psi = xg
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
    dX = vx * jnp.cos(psi) - vy * jnp.sin(psi)
    dY = vx * jnp.sin(psi) + vy * jnp.cos(psi)
    return jnp.stack([dvx, dvy, dwz, dX, dY, wz])


def global_plant_step(p, cfg, xg, u, n_sub: int = 10, sim_tire=None):
    tire = sim_tire or cfg.tire
    h = cfg.dt / n_sub

    def sub(x, _):
        return x + h * f_global(p, x, u, tire), None

    x_next, _ = jax.lax.scan(sub, xg, None, length=n_sub)
    return x_next


def estimate_frenet(track: Track, xg, s_hint=None):
    """Global plant state -> Frenet MPC state (reference getLocalPosition).

    Multi-lap: ``global_to_frenet`` returns s in [0, L); ``s_hint`` (the
    previous unwrapped s) re-unwraps it so the MPC sees monotone progress.
    """
    vx, vy, wz = xg[0], xg[1], xg[2]
    if s_hint is not None:
        # O(window) nearest-node search around the previous s — the dense
        # argmin is O(n_cells) per step and collapses on long tracks
        s, ey, epsi = global_to_frenet_windowed(
            track, xg[3], xg[4], xg[5], s_hint)
        L = track.length
        lap = jnp.round((s_hint - s) / L)
        s = s + lap * L
    else:
        s, ey, epsi = global_to_frenet(track, xg[3], xg[4], xg[5])
    return jnp.stack([vx, vy, wz, epsi, s, ey])


def closed_loop_global(
    p: VehicleParams,
    cfg: MPCConfig,
    scfg: SolverConfig,
    track: Track,
    x0_frenet: jnp.ndarray,
    x_ref,
    T: int,
    n_sub: int = 10,
    sim_tire: Optional[str] = None,
    noise_sigma: Optional[jnp.ndarray] = None,
    key: Optional[jnp.ndarray] = None,
    use_ekf: bool = False,
) -> GlobalLog:
    """World-frame plant + Frenet conversion + (optional) noisy measurement.

    With ``use_ekf=True`` the noisy Frenet measurement is filtered by the
    EKF (loop/estimator.py) before reaching the MPC — the full
    estimate -> plan -> solve -> apply -> simulate structure of
    SURVEY.md §3.1 with a real observer in the chain.
    """
    assert cfg.model == "dynamic", "global-frame loop uses the dynamic model"
    from .estimator import ekf_init, ekf_step

    Xw, Yw, psiw = frenet_to_global(track, x0_frenet[4], x0_frenet[5], x0_frenet[3])
    xg0 = jnp.stack([x0_frenet[0], x0_frenet[1], x0_frenet[2], Xw, Yw, psiw])
    carry0 = mpc_init(p, cfg, track, x0_frenet)
    if key is None:
        key = jax.random.PRNGKey(0)
    ekf0 = ekf_init(x0_frenet)
    nx = x0_frenet.shape[0]
    Qn = 1e-4 * jnp.eye(nx, dtype=x0_frenet.dtype)
    Rn = (
        jnp.diag(noise_sigma**2) if noise_sigma is not None
        else 1e-4 * jnp.eye(nx, dtype=x0_frenet.dtype)
    )

    def step(c, _):
        xg, mpc_carry, ekf, u_prev, s_prev, k = c
        z = estimate_frenet(track, xg, s_hint=s_prev)
        if noise_sigma is not None:
            k, k2 = jax.random.split(k)
            z = z + noise_sigma * jax.random.normal(k2, z.shape, z.dtype)
        if use_ekf:
            ekf = ekf_step(p, cfg, track, ekf, u_prev, z, Qn, Rn)
            xf = ekf.x
        else:
            xf = z
        u, mpc_carry, diag = mpc_step(p, cfg, scfg, track, xf, x_ref, mpc_carry)
        xg_next = global_plant_step(p, cfg, xg, u, n_sub=n_sub, sim_tire=sim_tire)
        return (
            (xg_next, mpc_carry, ekf, u, xf[4], k),
            (xg_next, xf, u, diag.converged),
        )

    init = (xg0, carry0, ekf0, jnp.zeros(2, x0_frenet.dtype), x0_frenet[4], key)
    _, (Xg, Xf, U, conv) = jax.lax.scan(step, init, None, length=T)
    return GlobalLog(Xg=Xg, Xf=Xf, U=U, converged=conv)
