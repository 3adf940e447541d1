"""MPP: Model Predictive Planner — progress-maximizing LPV trajectory
optimization over the track centerline.

Reference parity (SURVEY.md §2 "MPP planner", §3.3): optimize progress
(max s-dot / min lap time) over a long horizon subject to the same LPV
dynamics + friction/accel limits; the obstacle-aware variant shifts the
lateral corridor bounds (RAS 2020 paper behavior). Planner and tracking MPC
share the same batched engine (BASELINE.json): ``scheduled_stages`` /
``augment_dynamics`` / ``constraint_rows`` and the ADMM/Riccati solver are
reused verbatim — only the cost (progress + trust region) and the per-stage
bounds differ.

SQP structure: initial guess from the friction-limited velocity profile,
then ``n_sqp`` passes of (re-linearize along iterate -> solve the long-
horizon QP -> adopt solution). The long horizon (H ~= 512) is where the
parallel-in-horizon associative-scan Riccati pays off (SURVEY.md §2.2).

Output: an s-indexed :class:`RefTable` (vx_ref, e_y_ref, delta_ff) sampled
from the final trajectory's last full lap (drops the start-up transient).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..core.config import MPPConfig, SolverConfig, VehicleParams
from ..engine.assembly import (
    N_CON,
    augment_dynamics,
    constraint_rows,
    scheduled_stages,
    state_indices,
    _s_index,
)
from ..models import model_nx
from ..models.dynamics import NU
from ..solver.admm import BoxQP
from ..solver.production import production_solve
from ..solver.riccati import LQRCost, LQRDynamics
from ..track.track import Track, curvature_at, wrap_s
from .reftable import RefTable
from .velocity_profile import curvature_speed_limit, velocity_profile


class MPPDiag(NamedTuple):
    converged: jnp.ndarray   # (n_sqp,) per-SQP-pass solver convergence
    iters: jnp.ndarray       # (n_sqp,)
    lap_time: jnp.ndarray    # scalar [s] estimated from the final trajectory
    progress: jnp.ndarray    # scalar total s covered by the plan


def _initial_trajectory(p, pcfg: MPPConfig, track: Track, v_prof, s0=0.0,
                        v0=None):
    """Roll the velocity profile along the centerline -> (X, U) guess.

    With ``v0`` (online replanning) the guess speed is additionally
    accel-limited from the car's current speed.
    """
    nx = model_nx(pcfg.model)
    L = p.lf + p.lr
    n = track.kappa.shape[0]
    s0 = jnp.asarray(s0, jnp.float32)

    def v_at(s):
        sm = wrap_s(track, s)
        v = v_prof[jnp.clip((sm / track.ds).astype(jnp.int32), 0, n - 1)]
        if v0 is not None:
            reach = jnp.sqrt(jnp.maximum(v0, 0.2) ** 2
                             + 2.0 * pcfg.bounds.a_max * jnp.maximum(s - s0, 0.0))
            v = jnp.minimum(v, reach)
        return v

    def step(s, _):
        v = v_at(s)
        s_next = s + pcfg.dt * v
        return s_next, s

    _, s_traj = jax.lax.scan(step, jnp.asarray(s0, jnp.float32), None,
                             length=pcfg.H + 1)
    v_traj = v_at(s_traj)
    kap = curvature_at(track, s_traj)
    X = jnp.zeros((pcfg.H + 1, nx), jnp.float32)
    X = X.at[:, 0].set(v_traj)
    X = X.at[:, _s_index(pcfg.model)].set(s_traj)
    if pcfg.model == "dynamic":
        X = X.at[:, 2].set(kap * v_traj)          # wz ~= kappa * v
    delta_ff = jnp.arctan(kap * L)
    accel = (v_traj[1:] - v_traj[:-1]) / pcfg.dt
    U = jnp.stack([delta_ff[:-1], accel], axis=1)
    return X, U


def _stage_bounds(p, pcfg: MPPConfig, track: Track, s_sched, obstacles):
    """(H+1, nc) per-stage bounds: curvature speed cap, corridor, inputs."""
    b = pcfg.bounds
    H1 = s_sched.shape[0]
    n = track.kappa.shape[0]
    v_cap_tab = curvature_speed_limit(p, track, b, pcfg.a_lat_frac)
    sm = wrap_s(track, s_sched)
    v_cap = v_cap_tab[jnp.clip((sm / track.ds).astype(jnp.int32), 0, n - 1)]

    half = track.width / 2 - pcfg.ey_margin
    ey_lo = jnp.full((H1,), -half)
    ey_hi = jnp.full((H1,), half)
    if obstacles is not None:
        from ..engine.assembly import (
            block_curvatures,
            corridor_from_blocks,
            steerable_curvature,
        )

        ey_lo, ey_hi = corridor_from_blocks(
            sm, ey_lo, ey_hi, obstacles, pcfg.ey_margin, half,
            kappa_blk=block_curvatures(track, obstacles),
            kappa_cap=steerable_curvature(p, b.delta_max),
        )

    lb = jnp.zeros((H1, N_CON), jnp.float32)
    ub = jnp.zeros((H1, N_CON), jnp.float32)
    lb = lb.at[:, 0].set(b.vx_min).at[:, 1].set(ey_lo)
    ub = ub.at[:, 0].set(v_cap).at[:, 1].set(ey_hi)
    lb = lb.at[:, 2].set(-b.delta_max).at[:, 3].set(b.a_min)
    ub = ub.at[:, 2].set(b.delta_max).at[:, 3].set(b.a_max)
    lb = lb.at[:, 4].set(-b.ddelta_max).at[:, 5].set(-b.da_max)
    ub = ub.at[:, 4].set(b.ddelta_max).at[:, 5].set(b.da_max)
    inf = jnp.inf
    lb = lb.at[0, :2].set(-inf)
    ub = ub.at[0, :2].set(inf)
    lb = lb.at[-1, 2:].set(-inf)
    ub = ub.at[-1, 2:].set(inf)
    return lb, ub


def _build_planner_qp(p, pcfg: MPPConfig, track, X_bar, U_bar, u_prev, obstacles):
    H = pcfg.H
    nx = model_nx(pcfg.model)
    na = nx + NU
    f32 = jnp.float32
    s_idx = _s_index(pcfg.model)

    Ad, Bd, cd = scheduled_stages(p, pcfg, track, X_bar, U_bar)
    Aa, Ba, ca = augment_dynamics(Ad, Bd, cd)

    Qt = jnp.asarray(pcfg.q_trust, f32)[:nx]
    dR = jnp.diag(jnp.asarray(pcfg.dr, f32))
    Rd = jnp.diag(jnp.asarray(pcfg.r, f32))
    Q1 = jnp.zeros((na, na), f32).at[:nx, :nx].set(jnp.diag(Qt))
    Q_stage = Q1.at[nx:, nx:].set(dR)
    Q = jnp.tile(Q_stage[None], (H + 1, 1, 1)).at[H].set(Q1)
    R = jnp.tile((Rd + dR)[None], (H, 1, 1))
    M = jnp.tile(jnp.zeros((na, NU), f32).at[nx:, :].set(-dR)[None], (H, 1, 1))

    # linear cost: trust region pulls to the iterate; progress reward on s
    q = jnp.zeros((H + 1, na), f32).at[:, :nx].set(-(X_bar * Qt[None, :]))
    q = q.at[:, s_idx].add(-pcfg.w_progress / (H + 1))
    q = q.at[H, s_idx].add(-pcfg.w_progress)
    r = jnp.zeros((H, NU), f32)

    Dx, Du = constraint_rows(pcfg.model, f32)
    lb, ub = _stage_bounds(p, pcfg, track, X_bar[:, s_idx], obstacles)
    soft = jnp.full((N_CON,), jnp.inf, f32).at[1].set(2000.0)

    xa0 = jnp.concatenate([X_bar[0], u_prev], axis=0)
    return BoxQP(
        dyn=LQRDynamics(Aa, Ba, ca),
        cost=LQRCost(Q, q, R, r, M),
        Dx=Dx, Du=Du, lb=lb, ub=ub, x0=xa0, soft=soft,
    )


def _build_table(p, pcfg: MPPConfig, track: Track, s_traj, vx_tr, ey_tr,
                 delta_tr_u, v_prof) -> RefTable:
    """Sample the optimized trajectory onto a uniform s grid.

    Full-lap plans (progress >= track length) use the LAST lap (drops the
    start-up transient). Partial plans (online replanning, SURVEY §3.3's
    obstacle-aware receding planner) fill only the covered span; uncovered
    cells fall back to the friction-limited velocity profile on the
    centerline with geometric feed-forward steering.
    """
    length = float(track.length)
    n_ref = max(8, int(round(length / pcfg.ds_ref)))
    s_grid = jnp.arange(n_ref, dtype=jnp.float32) * (length / n_ref)
    delta_tr = jnp.concatenate([delta_tr_u, delta_tr_u[-1:]])

    s0, s_end = s_traj[0], s_traj[-1]
    progress = s_end - s0
    L32 = jnp.asarray(length, jnp.float32)

    # query points: last covered window ending at s_end, length min(progress, L)
    span = jnp.minimum(progress, L32)
    base = s_end - span
    qs = base + ((s_grid - base) % L32)
    covered = qs <= s_end  # (within [base, s_end])
    vx_tab = jnp.interp(qs, s_traj, vx_tr)
    ey_tab = jnp.interp(qs, s_traj, ey_tr)
    dl_tab = jnp.interp(qs, s_traj, delta_tr)

    # taper the planned line back to the centerline over the last metre of
    # the span: the uncovered fallback sits on ey=0, and a hard seam there
    # becomes a heading-reference spike through refs_from_table's slope
    # term — measured r4: a tracker reaching the seam dropped to ~0
    # convergence for the rest of the segment. The horizon tail is the
    # least-trusted part of a receding plan anyway (standard tail discard).
    taper = jnp.minimum(jnp.asarray(1.0, jnp.float32), 0.5 * span)
    w_tail = jnp.clip((s_end - qs) / jnp.maximum(taper, 1e-3), 0.0, 1.0)
    # full-lap plans are cyclic — no seam, no taper (progress >= L)
    w_tail = jnp.where(progress < L32, w_tail, 1.0)
    ey_tab = ey_tab * w_tail

    # fallback for uncovered cells: centerline + velocity profile
    n_cells = track.kappa.shape[0]
    idx = jnp.clip((s_grid / track.ds).astype(jnp.int32), 0, n_cells - 1)
    vx_fb = v_prof[idx]
    dl_fb = jnp.arctan(track.kappa[idx] * (p.lf + p.lr))
    vx_tab = jnp.where(covered, vx_tab, vx_fb)
    ey_tab = jnp.where(covered, ey_tab, 0.0)
    dl_tab = jnp.where(covered, dl_tab, dl_fb)

    return RefTable(
        ds=jnp.asarray(length / n_ref, jnp.float32),
        length=L32,
        vx=vx_tab, ey=ey_tab, delta=dl_tab,
    )


@jax.jit
def _sqp_pass(p, pcfg, track, scfg, X_bar, U_bar, obstacles, warm):
    """One SQP pass: relinearize along the iterate, solve the planner QP."""
    qp = _build_planner_qp(p, pcfg, track, X_bar, U_bar, U_bar[0], obstacles)
    return production_solve(qp, scfg, warm=warm)


def plan_mpp(
    p: VehicleParams,
    pcfg: MPPConfig,
    track: Track,
    scfg: Optional[SolverConfig] = None,
    obstacles: Optional[jnp.ndarray] = None,   # (n_obs, 4): s0, s1, ey_lo, ey_hi
    s0: float = 0.0,
    x0_state: Optional[jnp.ndarray] = None,    # current car state (online mode)
):
    """Run the MPP. Returns (RefTable, MPPDiag).

    Offline (default): plans >=1 lap from the velocity profile and samples
    the last lap. Online (``x0_state`` given): plans a receding horizon
    from the car's actual state; the emitted table covers the planned span
    and falls back to the profile elsewhere (_build_table).
    """
    # long-horizon ADMM needs a bigger budget than the tracker (~400 its at
    # H=512 cold; warm-started SQP passes finish much earlier)
    scfg = scfg or SolverConfig(max_iter=400, riccati="assoc")
    nx = model_nx(pcfg.model)
    s_idx = _s_index(pcfg.model)
    _, ey_i = state_indices(pcfg.model)

    v_prof = velocity_profile(p, track, pcfg.bounds, pcfg.a_lat_frac)
    v0 = None
    if x0_state is not None:
        s0 = x0_state[s_idx]
        v0 = x0_state[0]
    X_bar, U_bar = _initial_trajectory(p, pcfg, track, v_prof, s0, v0)
    if x0_state is not None:
        X_bar = X_bar.at[0].set(x0_state)
    u_prev = U_bar[0]

    convs, iters = [], []
    warm = None
    for _ in range(pcfg.n_sqp):
        # module-level jit: caches across replans (online mode re-plans every
        # few tracker steps; obstacles are a traced argument, so moving
        # corridors do NOT retrace as long as the block count is stable —
        # see planner/opponents.py::pad_blocks)
        sol = _sqp_pass(p, pcfg, track, scfg, X_bar, U_bar, obstacles, warm)
        X_bar = sol.X[:, :nx]
        U_bar = sol.U
        # ADMM state carries over across SQP passes (warm-started SQP)
        warm = (sol.s, sol.lam, sol.X, sol.U)
        convs.append(sol.converged)
        iters.append(sol.iters)

    s_traj = X_bar[:, s_idx]
    table = _build_table(p, pcfg, track, s_traj, X_bar[:, 0], X_bar[:, ey_i],
                         U_bar[:, 0], v_prof)
    length = float(track.length)
    t_idx = jnp.interp(s_traj[0] + length, s_traj, jnp.arange(pcfg.H + 1, dtype=jnp.float32))
    diag = MPPDiag(
        converged=jnp.stack(convs),
        iters=jnp.stack(iters),
        lap_time=t_idx * pcfg.dt,
        progress=s_traj[-1] - s_traj[0],
    )
    return table, diag
