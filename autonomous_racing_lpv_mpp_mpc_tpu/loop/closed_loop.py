"""Whole-lap closed-loop harness: estimate -> solve -> apply -> simulate.

Reference parity (SURVEY.md §3.1): the reference's ``main.py`` hot loop —
per step, solve the MPC, apply u0, integrate the nonlinear plant at a fine
sub-step (dt_sim << dt). Here the whole lap is ONE jitted ``lax.scan``
program (SURVEY.md §7 L5), so closed-loop laps vmap over scenario batches
and run entirely on-device.

The plant can use a different tire model than the MPC's internal LPV
(e.g. Pacejka plant vs linear-tire controller) to exercise model mismatch,
matching the reference's sim-vs-controller split (SURVEY.md §2).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..core.config import MPCConfig, SolverConfig, VehicleParams
from ..models import f_model
from ..track.track import Track, curvature_at
from .mpc import MPCCarry, mpc_init, mpc_step


class ClosedLoopLog(NamedTuple):
    X: jnp.ndarray          # (T, nx) plant states after each step
    U: jnp.ndarray          # (T, nu) applied controls
    converged: jnp.ndarray  # (T,)
    iters: jnp.ndarray      # (T,)
    r_prim: jnp.ndarray     # (T,)
    r_dual: jnp.ndarray     # (T,)
    # (T,) exact Farkas certificate per step (loop/mpc.py::MPCDiag;
    # SURVEY.md §5 "Failure detection"): True only when the settled-dual
    # heuristic fired AND OSQP §3.4's certificate conditions confirmed it.
    certified_infeasible: jnp.ndarray = False


class ClosedLoopLogPred(NamedTuple):
    """ClosedLoopLog + the MPC's predicted trajectories (reference parity:
    'predicted vs closed-loop traces' plots, SURVEY.md §2 Plot/logging)."""

    X: jnp.ndarray
    U: jnp.ndarray
    converged: jnp.ndarray
    iters: jnp.ndarray
    r_prim: jnp.ndarray
    r_dual: jnp.ndarray
    certified_infeasible: jnp.ndarray
    X_pred: jnp.ndarray     # (T, N+1, nx) prediction made at each step


def plant_step(
    p: VehicleParams,
    cfg: MPCConfig,
    track: Track,
    x: jnp.ndarray,
    u: jnp.ndarray,
    n_sub: int = 10,
    sim_tire: Optional[str] = None,
    sim_model: Optional[str] = None,
):
    """Integrate the nonlinear plant for one control period (fine Euler)."""
    tire = sim_tire or cfg.tire
    model = sim_model or cfg.model
    h = cfg.dt / n_sub
    s_idx = 4 if model == "dynamic" else 2

    def sub(x_i, _):
        kap = curvature_at(track, x_i[s_idx])
        return x_i + h * f_model(p, x_i, u, kap, model, tire), None

    x_next, _ = jax.lax.scan(sub, x, None, length=n_sub)
    return x_next


def closed_loop(
    p: VehicleParams,
    cfg: MPCConfig,
    scfg: SolverConfig,
    track: Track,
    x0: jnp.ndarray,
    x_ref: jnp.ndarray,          # (N+1, nx) per-stage reference (constant in s)
    T: int,
    n_sub: int = 10,
    sim_tire: Optional[str] = None,
    carry0: Optional[MPCCarry] = None,
    log_predictions: bool = False,
    obstacles=None,
) -> ClosedLoopLog:
    """Run T control steps of the full closed loop; returns stacked logs.

    ``log_predictions=True`` additionally records each step's predicted
    trajectory (ClosedLoopLogPred) for predicted-vs-actual analysis/plots.
    ``obstacles`` is an optional static (n_obs, 4) corridor-block array
    (``engine/assembly.py::corridor_from_blocks`` semantics) applied to
    every step's tracker bounds — parked obstacles; moving opponents go
    through ``planner/online.py``.
    """
    carry_init = carry0 if carry0 is not None else mpc_init(p, cfg, track, x0)

    def step(carry, _):
        x, mpc_carry = carry
        u, mpc_carry, diag = mpc_step(p, cfg, scfg, track, x, x_ref, mpc_carry,
                                      obstacles=obstacles)
        x_next = plant_step(p, cfg, track, x, u, n_sub=n_sub, sim_tire=sim_tire)
        out = (x_next, u, diag.converged, diag.iters, diag.r_prim, diag.r_dual,
               diag.certified_infeasible)
        if log_predictions:
            out = out + (mpc_carry.X_pred,)
        return (x_next, mpc_carry), out

    (_, _), outs = jax.lax.scan(step, (x0, carry_init), None, length=T)
    if log_predictions:
        return ClosedLoopLogPred(*outs)
    return ClosedLoopLog(*outs)
