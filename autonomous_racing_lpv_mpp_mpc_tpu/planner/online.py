"""Online receding-horizon replanning: planner + tracker at two rates.

Reference parity (SURVEY.md §2 "MPP planner", RAS-2020 behavior): the
obstacle-aware planner runs at a slower rate than the 30 Hz tracker,
re-planning a receding horizon from the car's CURRENT state (so new
obstacles are avoided mid-lap); the tracker follows the latest table.

Host-driven outer loop (the SQP planner is a host loop around jitted
solves); each tracking segment is one jitted ``lax.scan`` chunk.
"""

from __future__ import annotations

from typing import Callable, List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import MPCConfig, MPPConfig, SolverConfig, VehicleParams
from ..track.track import Track
from .mpp import plan_mpp
from .reftable import RefTable


class ReplanLog(NamedTuple):
    log: NamedTuple               # concatenated ClosedLoopLog (T, ...)
    replan_steps: np.ndarray      # step indices where replanning happened
    plan_progress: np.ndarray     # planned span per replan [m]


def _track_segment(p, cfg, scfg, track, T_seg, sim_tire):
    """Jitted closed-loop chunk that also returns the final carry."""
    # (lazy import: loop.mpc imports planner.reftable, so importing loop at
    # module scope would make planner/__init__ circular)
    from ..loop.closed_loop import ClosedLoopLog, plant_step
    from ..loop.mpc import mpc_step

    @jax.jit
    def run(x0, carry, table: RefTable, obstacles=None):
        def step(c, _):
            x, mc = c
            u, mc, diag = mpc_step(p, cfg, scfg, track, x, table, mc,
                                   obstacles=obstacles)
            x_next = plant_step(p, cfg, track, x, u, n_sub=10, sim_tire=sim_tire)
            out = (x_next, u, diag.converged, diag.iters, diag.r_prim,
                   diag.r_dual, diag.certified_infeasible)
            return (x_next, mc), out

        (x_f, carry_f), outs = jax.lax.scan(step, (x0, carry), None, length=T_seg)
        return x_f, carry_f, ClosedLoopLog(*outs)

    return run


def replanning_loop(
    p: VehicleParams,
    cfg: MPCConfig,
    scfg: SolverConfig,
    pcfg: MPPConfig,
    track: Track,
    x0: jnp.ndarray,
    T: int,
    replan_every: int = 60,
    obstacles_fn: Optional[Callable[[int], Optional[jnp.ndarray]]] = None,
    sim_tire: Optional[str] = None,
    plan_scfg: Optional[SolverConfig] = None,
    max_obstacle_rows: int = 8,
) -> ReplanLog:
    """Run T tracker steps, re-planning every ``replan_every`` steps.

    ``obstacles_fn(step)`` returns the (n_obs, 4) obstacle array visible at
    that time (or None) — obstacles may appear/move between replans. The
    blocks are fed BOTH to the planner (corridor-shifted reference) and to
    the tracker QP (per-stage e_y corridor, engine/assembly.py::
    tracker_bounds) so avoidance holds even when the tracker lags the
    planned line. Blocks are padded to ``max_obstacle_rows`` so the jitted
    segment/planner never retrace as corridors move.
    """
    from ..loop.mpc import mpc_init
    from .opponents import pad_blocks

    assert cfg.model == pcfg.model, (cfg.model, pcfg.model)
    segment = _track_segment(p, cfg, scfg, track, replan_every, sim_tire)
    carry = mpc_init(p, cfg, track, x0)
    x = x0
    logs: List = []
    replan_steps, spans = [], []

    t = 0
    while t < T:
        obs = obstacles_fn(t) if obstacles_fn is not None else None
        if obs is not None:
            obs = jnp.asarray(pad_blocks(obs, max_obstacle_rows))
        table, diag = plan_mpp(
            p, pcfg, track, scfg=plan_scfg, obstacles=obs, x0_state=x
        )
        replan_steps.append(t)
        spans.append(float(diag.progress))
        x, carry, log = segment(x, carry, table, obs)
        logs.append(log)
        t += replan_every

    cat = jax.tree.map(lambda *ls: jnp.concatenate(ls, axis=0), *logs)
    return ReplanLog(
        log=cat,
        replan_steps=np.asarray(replan_steps),
        plan_progress=np.asarray(spans),
    )


def _boundary_predictor(cfg: MPCConfig, steps: int):
    """Jitted predictor of the tracker state at the NEXT segment boundary:
    integrate arc length along the current table's velocity profile and
    read the racing line there. Crude on purpose — it only SEEDS the
    pipelined planner (latency compensation); the tracker absorbs the
    residual like any reference deviation. Model-generic: builds the state
    via the model's (vx, s, e_y) indices (dynamic nx=6 / kinematic nx=4)."""
    from ..engine.assembly import _s_index, state_indices
    from ..models import model_nx

    nx = model_nx(cfg.model)
    s_i = _s_index(cfg.model)
    vx_i, ey_i = state_indices(cfg.model)

    @jax.jit
    def predict(table: RefTable, x):
        def body(s, _):
            v, _ey, _dl = table.lookup(s)
            return s + v * cfg.dt, None

        s_end, _ = jax.lax.scan(body, x[s_i], None, length=steps)
        v, ey, _dl = table.lookup(s_end)
        out = jnp.zeros((nx,), jnp.float32)
        return out.at[vx_i].set(v).at[s_i].set(s_end).at[ey_i].set(ey)

    return predict


def pipelined_replanning_loop(
    p: VehicleParams,
    cfg: MPCConfig,
    scfg: SolverConfig,
    pcfg: MPPConfig,
    track: Track,
    x0: jnp.ndarray,
    T: int,
    replan_every: int = 60,
    obstacles_fn: Optional[Callable[[int], Optional[jnp.ndarray]]] = None,
    sim_tire: Optional[str] = None,
    plan_scfg: Optional[SolverConfig] = None,
    max_obstacle_rows: int = 8,
    planner_device=None,
) -> ReplanLog:
    """Pipeline-parallel replanning (SURVEY.md §2.2 "planner->tracker
    pipelining"; VERDICT r1 coverage row 14): the planner for segment k+1
    executes CONCURRENTLY with tracking segment k.

    Mechanics: the tracker segment is dispatched (JAX async) on the
    tracker device; the planner SQP for the next segment is then dispatched
    on ``planner_device`` (default: the second device when one exists) from
    the boundary state PREDICTED along the current table — the standard
    latency-compensation offset of pipelined MPC hierarchies. The only
    cross-device traffic is the small RefTable + predicted state at each
    boundary; with a single device the loop still works (dispatch overlap
    only).

    vs ``replanning_loop`` (serial): same API, same obstacle semantics; the
    tracker never stalls for the planner's SQP, so wall time per segment is
    max(tracker, planner) instead of their sum.
    """
    from ..loop.mpc import mpc_init
    from .opponents import pad_blocks

    assert cfg.model == pcfg.model, (cfg.model, pcfg.model)
    devs = jax.devices()
    tracker_dev = devs[0]
    planner_dev = planner_device if planner_device is not None else (
        devs[1] if len(devs) > 1 else devs[0])
    put_t = lambda t: jax.device_put(t, tracker_dev)
    put_p = lambda t: jax.device_put(t, planner_dev)

    p_t, track_t = put_t((p, track))
    p_p, track_p = put_p((p, track))
    segment = _track_segment(p_t, cfg, scfg, track_t, replan_every, sim_tire)
    predict = _boundary_predictor(cfg, replan_every)

    def plan(x_state, obs_raw):
        obs = (put_p(jnp.asarray(pad_blocks(obs_raw, max_obstacle_rows)))
               if obs_raw is not None else None)
        return plan_mpp(p_p, pcfg, track_p, scfg=plan_scfg, obstacles=obs,
                        x0_state=put_p(x_state))

    x = put_t(jnp.asarray(x0))
    carry = mpc_init(p_t, cfg, track_t, x)
    table, diag = plan(x, obstacles_fn(0) if obstacles_fn else None)
    logs: List = []
    # spans holds DEVICE scalars until after the loop: a float()/np.asarray
    # inside the loop is a host sync that silently serializes the pipeline
    # (VERDICT r2 weak #8); tests/test_planner.py pins a host-sync budget.
    replan_steps, spans = [0], [diag.progress]

    t = 0
    while t < T:
        obs_now = obstacles_fn(t) if obstacles_fn is not None else None
        obs_t = (put_t(jnp.asarray(pad_blocks(obs_now, max_obstacle_rows)))
                 if obs_now is not None else None)
        table_t = put_t(table)
        # 1. tracker segment: async dispatch on the tracker device
        x_f, carry_f, log = segment(x, carry, table_t, obs_t)
        # 2. planner for the NEXT segment: dispatched on the planner device
        #    while the tracker executes — no dependency on x_f
        t_next = t + replan_every
        if t_next < T:
            x_pred = predict(table_t, x)
            table_next, diag = plan(
                x_pred, obstacles_fn(t_next) if obstacles_fn else None)
            replan_steps.append(t_next)
            spans.append(diag.progress)   # device scalar; no host sync here
            table = table_next
        # 3. join the segment
        x, carry = x_f, carry_f
        logs.append(log)
        t = t_next

    cat = jax.tree.map(lambda *ls: jnp.concatenate(ls, axis=0), *logs)
    return ReplanLog(
        log=cat,
        replan_steps=np.asarray(replan_steps),
        plan_progress=np.asarray(spans),
    )
