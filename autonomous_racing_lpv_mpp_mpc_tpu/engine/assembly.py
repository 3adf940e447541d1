"""Horizon scheduling + block-structured QP assembly.

Reference parity (SURVEY.md §3.1-§3.2): each control step the reference
evaluates the LPV (A_k, B_k) at N points along the *previous* predicted
trajectory (quasi-LPV successive scheduling), then assembles sparse
P, q, A, l, u for OSQP. Here the assembly is block-structured (never
scipy-sparse): a ``vmap`` over the horizon produces stacked (N, ., .)
stage tensors that feed the Riccati/ADMM solver directly — this is the
layout that maps onto TPU batched einsums (SURVEY.md §7 L3).

Delta-u costs and rate bounds couple consecutive controls; they are made
stage-separable by augmenting the state with the previous control:

    xa_k = (x_k, u_{k-1}),   xa_{k+1} = [[A,0],[0,0]] xa_k + [[B],[I]] u_k

so Delta-u_k = u_k - xa_k[nx:] is a stage-local linear function. Constraint
rows per stage (nc = 6): vx box, e_y corridor, delta box, a box,
Delta-delta box, Delta-a box (SURVEY.md §2 "Tracking MPC").
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..core.config import MPCConfig, VehicleParams
from ..models import discretize, f_model, lpv_ab, ltv_abc, model_nx
from ..models.dynamics import NU
from ..solver.admm import BoxQP
from ..solver.riccati import LQRCost, LQRDynamics
from ..track.track import Track, curvature_at

N_CON = 6  # constraint rows per stage


def state_indices(model: str) -> Tuple[int, int]:
    """(vx_idx, ey_idx) in the model's state vector."""
    if model == "dynamic":
        return 0, 5
    if model == "kinematic":
        return 0, 3
    raise ValueError(model)


def aug_dim(model: str) -> int:
    return model_nx(model) + NU


def shift_schedule(X_prev: jnp.ndarray, U_prev: jnp.ndarray):
    """Shift the previous solution one step (warm scheduling, SURVEY.md §3.2)."""
    X = jnp.concatenate([X_prev[1:], X_prev[-1:]], axis=0)
    U = jnp.concatenate([U_prev[1:], U_prev[-1:]], axis=0)
    return X, U


def initial_schedule(
    p: VehicleParams, cfg: MPCConfig, track: Track, x0: jnp.ndarray, u0: jnp.ndarray
):
    """Constant-input nonlinear rollout used before a first solution exists."""

    def step(x, _):
        kap = curvature_at(track, x[_s_index(cfg.model)])
        xn = x + cfg.dt * f_model(p, x, u0, kap, cfg.model, cfg.tire)
        return xn, xn

    _, Xs = jax.lax.scan(step, x0, None, length=cfg.N)
    X = jnp.concatenate([x0[None], Xs], axis=0)
    U = jnp.tile(u0[None], (cfg.N, 1))
    return X, U


def _s_index(model: str) -> int:
    return 4 if model == "dynamic" else 2


def curvature_speed_limit_table(p: VehicleParams, track: Track, vx_min, vx_max,
                                a_lat_frac: float = 0.85):
    """(n_cells,) friction-circle speed limit v <= sqrt(f*mu*g/|kappa|)."""
    kap = jnp.abs(track.kappa)
    v_lim = jnp.sqrt(a_lat_frac * p.mu * p.g / jnp.maximum(kap, 1e-6))
    return jnp.clip(v_lim, vx_min, vx_max)


def speed_cap_at(p: VehicleParams, track: Track, s, vx_min, vx_max,
                 a_lat_frac: float = 0.85):
    """Speed cap sampled at arc length(s) s (branch-free table gather)."""
    tab = curvature_speed_limit_table(p, track, vx_min, vx_max, a_lat_frac)
    sm = s - track.length * jnp.floor(s / track.length)
    n = track.kappa.shape[0]
    return tab[jnp.clip((sm / track.ds).astype(jnp.int32), 0, n - 1)]


def augment_dynamics(Ad, Bd, cd):
    """(A, B, c) on x -> on xa = (x, u_prev): stage-separable Delta-u form."""
    N, nx, nu = Bd.shape
    na = nx + nu
    f32 = Ad.dtype
    Aa = jnp.zeros((N, na, na), f32).at[:, :nx, :nx].set(Ad)
    Ba = jnp.zeros((N, na, nu), f32).at[:, :nx, :].set(Bd)
    Ba = Ba.at[:, nx:, :].set(jnp.eye(nu, dtype=f32))
    ca = jnp.zeros((N, na), f32).at[:, :nx].set(cd)
    return Aa, Ba, ca


def constraint_rows(model: str, dtype=jnp.float32):
    """The 6 standard rows on (xa, u): vx, e_y, delta, a, Ddelta, Da."""
    nx = model_nx(model)
    na = nx + NU
    vx_i, ey_i = state_indices(model)
    Dx = jnp.zeros((N_CON, na), dtype)
    Du = jnp.zeros((N_CON, NU), dtype)
    Dx = Dx.at[0, vx_i].set(1.0)
    Dx = Dx.at[1, ey_i].set(1.0)
    Du = Du.at[2, 0].set(1.0)
    Du = Du.at[3, 1].set(1.0)
    Dx = Dx.at[4, nx + 0].set(-1.0)
    Du = Du.at[4, 0].set(1.0)
    Dx = Dx.at[5, nx + 1].set(-1.0)
    Du = Du.at[5, 1].set(1.0)
    return Dx, Du


def scheduled_stages(p, cfg, track, X_sched, U_sched):
    """LPV/LTV stage matrices along the scheduling trajectory (vmap over k)."""
    N = X_sched.shape[0] - 1
    nx = model_nx(cfg.model)
    f32 = X_sched.dtype
    s_idx = _s_index(cfg.model)
    kappas = curvature_at(track, X_sched[:N, s_idx])

    if cfg.linearization == "lpv":
        def stage(xk, uk, kap):
            # tire="pacejka" selects the Pacejka-linearized (secant
            # stiffness) LPV — BASELINE.json config 2
            A, B = lpv_ab(p, xk, uk, kap, cfg.model, cfg.tire)
            Ad, Bd = discretize(A, B, cfg.dt, method=cfg.discretization)
            return Ad, Bd, jnp.zeros((nx,), f32)
    else:
        def stage(xk, uk, kap):
            A, B, c = ltv_abc(p, xk, uk, kap, cfg.model, cfg.tire)
            return discretize(A, B, cfg.dt, c, method=cfg.discretization)

    return jax.vmap(stage)(X_sched[:N], U_sched, kappas)


def block_curvatures(track: Track, blocks, n_samples: int = 8):
    """(n_obs,) signed curvature of the sharpest point in each block's CORE
    (inner 60%, sampled); used by :func:`corridor_from_blocks` for the side
    choice.

    Only the core is sampled because blocks are Minkowski-inflated well
    beyond the obstacle (body + ego body + pad + sweep lead): a padded tail
    poking into the next corner must not veto a side that is perfectly
    usable where the ego is actually alongside the obstacle — a mid-pass
    side flip between replans steers the ego straight through the obstacle
    band."""
    from ..track.track import curvature_at

    t = jnp.linspace(0.2, 0.8, n_samples)
    s_samp = blocks[:, 0:1] + t[None, :] * (blocks[:, 1:2] - blocks[:, 0:1])
    kap = curvature_at(track, s_samp)                  # (n_obs, n_samples)
    j = jnp.argmax(jnp.abs(kap), axis=1)
    return jnp.take_along_axis(kap, j[:, None], axis=1)[:, 0]


def steerable_curvature(p: VehicleParams, delta_max, headroom: float = 0.97):
    """Maximum path curvature the car can hold, with a small headroom.

    Used only for the corridor SIDE choice (corridor_from_blocks): a side is
    ruled out when holding a line there would saturate steering outright.
    The headroom is deliberately small — a large one would rule out lines
    the car can in fact hold (tested: e_y = 0.1 inside a kappa = 1 corner at
    delta_max = 0.3, wheelbase 0.25 is fine; e_y = 0.195 is not)."""
    return headroom * jnp.tan(delta_max) / (p.lf + p.lr)


def corridor_from_blocks(sm, ey_lo, ey_hi, blocks, margin, half,
                         kappa_blk=None, kappa_cap=None):
    """Tighten a per-stage lateral corridor around obstacle blocks.

    ``blocks`` is (n_obs, 4) rows ``[s0, s1, ey_blk_lo, ey_blk_hi]`` in
    wrapped arc length (reference RAS-2020 behavior: obstacle-aware corridor
    shifting, SURVEY.md §2 "MPP planner"). For each stage whose (wrapped)
    scheduled ``sm`` lies inside a block, the corridor is moved to one side
    of the obstacle. Dummy/padding rows with ``s0 > s1`` never match
    (see planner/opponents.py::pad_blocks). Shared by the planner QP and the
    obstacle-aware tracker bounds so both pick the SAME side.

    Side choice: widest USABLE side. With ``kappa_blk`` (signed curvature at
    the sharpest point of each block) and ``kappa_cap`` (max steerable path
    curvature, :func:`steerable_curvature`), the inside of a corner is only
    usable out to the offset where the path curvature kappa/(1 - kappa*ey)
    stays steerable — in a tight corner the feasible pass is on the OUTSIDE
    even when the inside gap is geometrically wider (holding the inside line
    would saturate steering and the car would understeer into the obstacle).
    """
    for i in range(blocks.shape[0]):
        o_s0, o_s1, o_lo, o_hi = (blocks[i, j] for j in range(4))
        inside = jnp.logical_and(sm >= o_s0, sm <= o_s1)
        up_lim = half
        dn_lim = half
        if kappa_blk is not None:
            k = kappa_blk[i]
            ak = jnp.maximum(jnp.abs(k), 1e-6)
            # inside-of-corner offset limit: 1 - |k|*ey >= |k|/kappa_cap
            ey_in = jnp.clip((1.0 - ak / kappa_cap) / ak, -half, half)
            up_lim = jnp.where(k > 1e-3, jnp.minimum(half, ey_in), half)
            dn_lim = jnp.where(k < -1e-3, jnp.minimum(half, ey_in), half)
        up_w = up_lim - (o_hi + margin)   # usable width above the obstacle
        dn_w = (o_lo - margin) + dn_lim   # usable width below
        go_up = up_w >= dn_w
        # clamp the moved bound to the track edge so a block that (with
        # margin) reaches the edge can never emit an inverted corridor
        # (ey_lo > ey_hi) — downstream jnp.clip with lb > ub would silently
        # pin to ub and override the side choice (round-2 advisor finding).
        new_lo = jnp.where(go_up, jnp.minimum(o_hi + margin, half), -half)
        new_hi = jnp.where(go_up, half, jnp.maximum(o_lo - margin, -half))
        ey_lo = jnp.where(inside, jnp.maximum(ey_lo, new_lo), ey_lo)
        ey_hi = jnp.where(inside, jnp.minimum(ey_hi, new_hi), ey_hi)
    # overlapping blocks choosing opposite sides can still cross the folds;
    # collapse any residual inversion to the midpoint (zero-width corridor,
    # handled by the soft e_y row) instead of letting clip() pick a side.
    mid = 0.5 * (ey_lo + ey_hi)
    inv = ey_lo > ey_hi
    ey_lo = jnp.where(inv, mid, ey_lo)
    ey_hi = jnp.where(inv, mid, ey_hi)
    return ey_lo, ey_hi


def tracker_bounds(p: VehicleParams, cfg: MPCConfig, track: Track, X_sched,
                   obstacles=None, obs_margin: float = 0.0):
    """(N+1, N_CON) stage bounds for the tracker QP: standard boxes +
    per-stage friction-circle vx caps; stage-0 state rows and terminal
    input/rate rows disabled.

    ``obstacles`` ((n_obs, 4) corridor blocks, same format the planner
    consumes) makes the TRACKER itself obstacle-aware: the e_y corridor row
    is tightened at every stage whose scheduled s falls inside a block, so
    collision avoidance is enforced at tracker rate (30 Hz, soft e_y row)
    and does not rely on the tracker following the planned line without lag.
    """
    N = X_sched.shape[0] - 1
    f32 = X_sched.dtype
    b = cfg.bounds
    lo = jnp.asarray(
        [b.vx_min, -b.ey_max, -b.delta_max, b.a_min, -b.ddelta_max, -b.da_max], f32
    )
    hi = jnp.asarray(
        [b.vx_max, b.ey_max, b.delta_max, b.a_max, b.ddelta_max, b.da_max], f32
    )
    lb = jnp.tile(lo[None], (N + 1, 1))
    ub = jnp.tile(hi[None], (N + 1, 1))
    if cfg.kappa_speed_cap:
        # per-stage vx cap from the friction circle at the scheduled s:
        # makes the tracker brake into corners even when vx_ref is high
        s_idx = _s_index(cfg.model)
        v_cap = speed_cap_at(
            p, track, X_sched[:, s_idx], b.vx_min, b.vx_max, cfg.a_lat_frac
        )
        ub = ub.at[:, 0].set(v_cap)
    if obstacles is not None:
        from ..track.track import wrap_s

        s_idx = _s_index(cfg.model)
        sm = wrap_s(track, X_sched[:, s_idx])
        ey_lo, ey_hi = corridor_from_blocks(
            sm, lb[:, 1], ub[:, 1], obstacles, obs_margin, b.ey_max,
            kappa_blk=block_curvatures(track, obstacles),
            kappa_cap=steerable_curvature(p, b.delta_max),
        )
        lb = lb.at[:, 1].set(ey_lo)
        ub = ub.at[:, 1].set(ey_hi)
    inf = jnp.asarray(jnp.inf, f32)
    # stage 0: state rows are constants (x0 fixed) -> disabled
    lb = lb.at[0, :2].set(-inf)
    ub = ub.at[0, :2].set(inf)
    # terminal: no u_N -> input/rate rows disabled
    lb = lb.at[N, 2:].set(-inf)
    ub = ub.at[N, 2:].set(inf)
    return lb, ub


def build_boxqp(
    p: VehicleParams,
    cfg: MPCConfig,
    track: Track,
    x0: jnp.ndarray,          # (nx,) current (un-augmented) state
    u_prev: jnp.ndarray,      # (nu,) last applied control
    X_sched: jnp.ndarray,     # (N+1, nx) scheduling trajectory
    U_sched: jnp.ndarray,     # (N, nu)
    x_ref: jnp.ndarray,       # (N+1, nx) tracking reference
    stages=None,              # optional precomputed (Ad, Bd, cd) — e.g. from
                              # the horizon-sharded evaluation (parallel/)
    obstacles=None,           # optional (n_obs, 4) corridor blocks
) -> BoxQP:
    """Assemble the block-structured MPC QP on the augmented state."""
    N = cfg.N
    nx = model_nx(cfg.model)
    na = nx + NU
    dt = cfg.dt
    f32 = X_sched.dtype

    # --- scheduled stage matrices (vmap over the horizon = the N model
    # evaluations of SURVEY.md §3.1, batched instead of a Python loop) ---
    Ad, Bd, cd = stages if stages is not None else scheduled_stages(
        p, cfg, track, X_sched, U_sched
    )

    # --- augmentation: xa = (x, u_prev) ---
    Aa, Ba, ca = augment_dynamics(Ad, Bd, cd)

    # --- cost ---
    w = cfg.weights
    if len(w.q) != nx:
        raise ValueError(
            f"MPCWeights.q has {len(w.q)} entries but model {cfg.model!r} has "
            f"{nx} states; use MPCWeights.for_model({cfg.model!r})"
        )
    Qd = jnp.asarray(w.q, f32)[:nx]
    Rd = jnp.diag(jnp.asarray(w.r, f32))
    dR = jnp.diag(jnp.asarray(w.dr, f32))

    Q1 = jnp.zeros((na, na), f32).at[:nx, :nx].set(jnp.diag(Qd))
    Q_stage = Q1.at[nx:, nx:].set(dR)          # + Delta-u quadratic in u_prev
    Q = jnp.tile(Q_stage[None], (N + 1, 1, 1))
    Q = Q.at[N].set(Q1)                        # terminal: tracking only
    R = jnp.tile((Rd + dR)[None], (N, 1, 1))
    M_stage = jnp.zeros((na, NU), f32).at[nx:, :].set(-dR)
    M = jnp.tile(M_stage[None], (N, 1, 1))

    qlin = jnp.zeros((N + 1, na), f32).at[:, :nx].set(-(x_ref * Qd[None, :]))
    rlin = jnp.zeros((N, NU), f32)

    # --- constraint rows ---
    b = cfg.bounds
    Dx, Du = constraint_rows(cfg.model, f32)
    lb, ub = tracker_bounds(p, cfg, track, X_sched, obstacles=obstacles)
    # clamp the vx reference to the per-stage friction cap: a reference
    # pinned above a binding hard bound makes ADMM grind (active-set
    # tug-of-war); clamping restores ~10-iteration convergence on low mu
    x_ref = x_ref.at[:, 0].set(jnp.minimum(x_ref[:, 0], ub[:, 0]))
    qlin = qlin.at[:, :nx].set(-(x_ref * Qd[None, :]))

    # soft e_y corridor (row 1); everything else hard
    soft = jnp.full((N_CON,), jnp.inf, f32).at[1].set(b.ey_soft)

    xa0 = jnp.concatenate([x0, u_prev], axis=0)
    return BoxQP(
        dyn=LQRDynamics(Aa, Ba, ca),
        cost=LQRCost(Q, qlin, R, rlin, M),
        Dx=Dx, Du=Du, lb=lb, ub=ub, x0=xa0, soft=soft,
    )
