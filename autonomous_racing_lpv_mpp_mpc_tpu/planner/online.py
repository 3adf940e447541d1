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
            out = (x_next, u, diag.converged, diag.iters, diag.r_prim, diag.r_dual)
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

    assert cfg.model == pcfg.model == "dynamic"
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
