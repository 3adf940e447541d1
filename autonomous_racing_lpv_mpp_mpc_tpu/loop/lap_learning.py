"""Iterative lap-time learning: reference-velocity ILC across laps.

Beyond reference parity: the reference repo plans once and tracks
(SURVEY.md §3.3); its code lineage (Berkeley BARC / RacingLMPC,
SURVEY.md §0 [RECALL-MED]) is famous for *learning across laps*. This
module closes that outer loop on top of the existing stack: after every
lap, the realized trajectory is binned onto the planner's RefTable s-grid
and the velocity reference / racing line / steering feed-forward are
updated by an iterative-learning rule, so lap time drops lap over lap
toward the friction limit — no new solver machinery, just a second small
jitted program between laps.

TPU-first design: a lap is the existing single-scan jitted closed loop
(loop/closed_loop.py); the learning update is one jitted function built
from ``segment_sum`` binning plus two circular accel-limit ``lax.scan``
sweeps — no per-node host Python, static shapes throughout, so the whole
learner vmaps over scenario batches exactly like any closed loop. The
outer iteration is a tiny host loop (n_laps ~ 10) reusing two compiled
programs.

Update rule per grid node i (visited by the lap trace):
- clean (binned |a_lat| within the friction budget AND the car near the
  commanded line): vx_i <- realized vx + gain * headroom, where headroom
  is the gap to the curvature speed limit sqrt(a_frac mu g / |kappa_i|);
- violated (grip or corridor): vx_i <- shrink * realized vx (back off
  below what was actually driven);
- unvisited: keep the previous reference.
The raw profile is then made longitudinally consistent with circular
forward (accel-limited) and backward (braking-limited) v^2 sweeps and a
small circular smoothing stencil, i.e. the standard velocity-profile
filter, evaluated entirely in-graph.
"""

from __future__ import annotations

from typing import List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..core.config import MPCConfig, SolverConfig, VehicleParams
from ..planner.reftable import RefTable
from ..track.track import Track, curvature_at
from .closed_loop import closed_loop


@struct.dataclass
class LapLearnConfig:
    """Knobs of the lap-over-lap reference update."""

    gain: float = 0.6        # fraction of the speed headroom added when clean
    shrink: float = 0.92     # vx backoff factor where limits were violated
    dv_max: float = 0.6      # max vx increase per node per lap [m/s]
    a_lat_frac: float = 0.85  # usable fraction of the friction circle
    ey_tol: float = 0.10     # |e_y - ey_ref| above this counts as a violation
    beta_line: float = 0.35  # racing-line / delta_ff learning rate
    v_floor: float = 0.5     # never command below this [m/s]


class LapLearnLog(NamedTuple):
    lap_steps: np.ndarray    # (n_laps,) steps to complete each lap (T if DNF)
    tables_vx: np.ndarray    # (n_laps + 1, n) vx profile before each lap
    table: RefTable          # final learned table
    last_log: NamedTuple     # ClosedLoopLog of the final lap


def initial_table(track: Track, ds: float = 0.05, vx0: float = 1.0) -> RefTable:
    """Conservative flat-speed centerline table to seed the learner."""
    L = float(track.length)
    n = max(int(round(L / ds)), 8)
    f32 = lambda v: jnp.asarray(v, jnp.float32)
    return RefTable(
        ds=f32(L / n),
        length=f32(L),
        vx=jnp.full((n,), vx0, jnp.float32),
        ey=jnp.zeros((n,), jnp.float32),
        delta=jnp.zeros((n,), jnp.float32),
    )


def _accel_limit_circular(v, ds, a_acc, a_brake, wraps: int = 2):
    """Longitudinal-consistency filter on a circular v(s) profile.

    Forward pass caps acceleration (v_{i+1}^2 <= v_i^2 + 2 a_acc ds),
    backward pass caps braking (v_i^2 <= v_{i+1}^2 + 2 a_brake ds); each
    runs ``wraps`` times around the loop so limits propagate across the
    start line. Both are O(n) scans — jit/vmap-clean.
    """

    def sweep(v, a):
        def body(c, vi):
            vn = jnp.minimum(vi, jnp.sqrt(c * c + 2.0 * a * ds))
            return vn, vn

        for _ in range(wraps):
            _, v = jax.lax.scan(body, v[-1], v)
        return v

    v = sweep(v, a_acc)
    v = sweep(v[::-1], a_brake)[::-1]
    return v


def learn_from_lap(
    p: VehicleParams,
    cfg: MPCConfig,
    llcfg: LapLearnConfig,
    track: Track,
    table: RefTable,
    X: jnp.ndarray,          # (T, nx) closed-loop states of the lap
    U: jnp.ndarray,          # (T, nu) applied controls
) -> RefTable:
    """One ILC update of the reference table from a realized lap (jittable)."""
    n = table.vx.shape[0]
    dyn = cfg.model == "dynamic"
    s_idx, ey_i = (4, 5) if dyn else (2, 3)
    s, vx, ey = X[:, s_idx], X[:, 0], X[:, ey_i]

    # lateral accel: measured vx*wz for the dynamic model, kinematic
    # steady-state vx^2 kappa otherwise
    a_lat = vx * X[:, 2] if dyn else vx * vx * curvature_at(track, s)

    sm = s - table.length * jnp.floor(s / table.length)
    idx = jnp.clip((sm / table.ds).astype(jnp.int32), 0, n - 1)
    cnt = jax.ops.segment_sum(jnp.ones_like(vx), idx, num_segments=n)
    mean = lambda v: jax.ops.segment_sum(v, idx, num_segments=n) / jnp.maximum(cnt, 1.0)
    vx_m, ey_m, al_m, de_m = mean(vx), mean(ey), mean(jnp.abs(a_lat)), mean(U[:, 0])
    visited = cnt > 0.0

    # node-local friction speed limit from the track's curvature table
    grid_s = (jnp.arange(n, dtype=jnp.float32) + 0.5) * table.ds
    kap = jnp.abs(curvature_at(track, grid_s))
    a_cap = llcfg.a_lat_frac * p.mu * p.g
    v_lim = jnp.sqrt(a_cap / jnp.maximum(kap, a_cap / cfg.bounds.vx_max**2))

    ey_room = track.width / 2.0 - 0.05
    viol = (al_m > a_cap) | (jnp.abs(ey_m - table.ey) > llcfg.ey_tol) | (
        jnp.abs(ey_m) > ey_room
    )
    headroom = jnp.clip(v_lim - vx_m, 0.0, llcfg.dv_max)
    v_cand = jnp.where(viol, llcfg.shrink * vx_m, vx_m + llcfg.gain * headroom)
    smooth = lambda a: 0.25 * jnp.roll(a, 1) + 0.5 * a + 0.25 * jnp.roll(a, -1)
    v_new = jnp.where(visited, v_cand, table.vx)
    v_new = smooth(jnp.clip(v_new, llcfg.v_floor, cfg.bounds.vx_max))
    # consistency LAST so the emitted profile respects the accel limits
    v_new = _accel_limit_circular(
        v_new, table.ds, cfg.bounds.a_max, -cfg.bounds.a_min
    )

    blend = lambda old, new: jnp.where(
        visited, (1.0 - llcfg.beta_line) * old + llcfg.beta_line * new, old
    )
    ey_new = jnp.clip(smooth(blend(table.ey, ey_m)), -ey_room, ey_room)
    de_new = jnp.clip(
        smooth(blend(table.delta, de_m)),
        -cfg.bounds.delta_max,
        cfg.bounds.delta_max,
    )
    return table.replace(vx=v_new, ey=ey_new, delta=de_new)


def lap_steps(cfg: MPCConfig, track: Track, X: jnp.ndarray, T: int):
    """Steps until arc length crosses one track length (T if never)."""
    s_idx = 4 if cfg.model == "dynamic" else 2
    done = (X[:, s_idx] - X[0, s_idx]) >= track.length
    return jnp.where(done.any(), jnp.argmax(done), T)


def iterative_lap_learning(
    p: VehicleParams,
    cfg: MPCConfig,
    scfg: SolverConfig,
    track: Track,
    x0: jnp.ndarray,
    n_laps: int,
    T_lap: int,
    llcfg: Optional[LapLearnConfig] = None,
    table0: Optional[RefTable] = None,
    sim_tire: Optional[str] = None,
    obstacles=None,
) -> LapLearnLog:
    """Run ``n_laps`` laps, updating the reference table after each.

    Every lap restarts from ``x0`` (standing start, reference-lineage
    protocol) and follows the current table; the update between laps is
    :func:`learn_from_lap`. Host loop over laps; both inner programs are
    compiled once. With static ``obstacles`` (corridor blocks) the ey
    learning memorizes the avoidance line into the table, so later laps
    pre-position for the pass instead of reacting inside the horizon.
    """
    llcfg = llcfg or LapLearnConfig()
    table = table0 if table0 is not None else initial_table(track)

    run_lap = jax.jit(
        lambda tbl: closed_loop(
            p, cfg, scfg, track, x0, tbl, T=T_lap, sim_tire=sim_tire,
            obstacles=obstacles,
        )
    )
    update = jax.jit(
        lambda tbl, X, U: learn_from_lap(p, cfg, llcfg, track, tbl, X, U)
    )
    steps_fn = jax.jit(lambda X: lap_steps(cfg, track, X, T_lap))

    laps: List[int] = []
    vx_hist = [np.asarray(table.vx)]
    log = None
    for _ in range(n_laps):
        log = run_lap(table)
        laps.append(int(steps_fn(log.X)))
        table = update(table, log.X, log.U)
        vx_hist.append(np.asarray(table.vx))

    return LapLearnLog(
        lap_steps=np.asarray(laps),
        tables_vx=np.stack(vx_hist),
        table=table,
        last_log=log,
    )


def batched_lap_learning(
    p_b: VehicleParams,          # batched params (each leaf (B,))
    cfg: MPCConfig,
    scfg: SolverConfig,
    track: Track,
    x0_b: jnp.ndarray,           # (B, nx)
    n_laps: int,
    T_lap: int,
    llcfg: Optional[LapLearnConfig] = None,
    table0: Optional[RefTable] = None,
    sim_tire: Optional[str] = None,
) -> LapLearnLog:
    """Learn a whole GRID of cars' profiles in parallel (DP analog).

    The per-lane learner is exactly :func:`learn_from_lap`; lap rollout and
    update are vmapped over the batch axis, so e.g. a friction sweep learns
    one friction-dependent racing profile per lane in the same wall time as
    one car — the scenario-batching design of SURVEY.md §2.2 applied to the
    learning outer loop. Shard the batch axis with ``shard_map`` exactly
    like ``parallel/scenarios.py`` for pod-scale sweeps.
    """
    llcfg = llcfg or LapLearnConfig()
    B = x0_b.shape[0]
    one = table0 if table0 is not None else initial_table(track)
    table = jax.tree.map(lambda a: jnp.broadcast_to(a, (B,) + a.shape), one)

    run_lap = jax.jit(jax.vmap(
        lambda pp, x0, tbl: closed_loop(
            pp, cfg, scfg, track, x0, tbl, T=T_lap, sim_tire=sim_tire
        ),
    ))
    update = jax.jit(jax.vmap(
        lambda pp, tbl, X, U: learn_from_lap(pp, cfg, llcfg, track, tbl, X, U),
    ))
    steps_fn = jax.jit(jax.vmap(lambda X: lap_steps(cfg, track, X, T_lap)))

    laps: List[np.ndarray] = []
    vx_hist = [np.asarray(table.vx)]
    log = None
    for _ in range(n_laps):
        log = run_lap(p_b, x0_b, table)
        laps.append(np.asarray(steps_fn(log.X)))
        table = update(p_b, table, log.X, log.U)
        vx_hist.append(np.asarray(table.vx))

    return LapLearnLog(
        lap_steps=np.stack(laps),        # (n_laps, B)
        tables_vx=np.stack(vx_hist),     # (n_laps + 1, B, n)
        table=table,
        last_log=log,
    )
