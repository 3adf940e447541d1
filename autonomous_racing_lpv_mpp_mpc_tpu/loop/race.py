"""The flagship full-stack race program: every deployment subsystem in ONE
composed loop.

Reference parity (SURVEY.md §3.1): the reference's actual hot loop is the
full composition estimate -> plan -> solve -> apply -> simulate. Round 3
built every stage (EKF/MHE, friction RLS, MPP replanning, ILC lap
learning, tracker, world-frame plant) but only ever ran them in pairwise
programs; this module is the one program that races them all together —
where the state-sharing seams live (mu-hat into the planner's friction
caps, EKF lag vs the replanning cadence, s-unwrap shared by estimator,
planner table and tracker).

Composition per control period (one ``lax.scan`` step):

1. plant truth lives in the WORLD frame at the TRUE friction mu_true
   (global_loop.py::global_plant_step, Pacejka tires);
2. measurement: branch-free global->Frenet conversion windowed around the
   previous unwrapped s (track/track.py), plus Gaussian sensor noise;
3. estimator: EKF predict/update with the CONTROLLER's current model —
   i.e. the LPV plant scheduled at mu-hat, so the adaptation loop closes
   through the filter exactly as it would on the real car;
4. friction: scalar RLS on the filtered state transition
   (loop/friction.py) -> mu-hat;
5. tracker: warm-started LPV-MPC at mu-hat following the current RefTable
   (refs sampled along the scheduled s);
6. plant: fine-Euler sub-steps in the world frame.

Host Python runs ONLY at segment boundaries (every ``replan_every`` steps)
where the MPP planner re-plans a receding horizon from the car's current
ESTIMATED state with the car's current mu-hat — the planner's
curvature-limited speed caps therefore tighten/relax as the estimator
learns the surface. Optionally (``ilc_every``) the between-window ILC
update (loop/lap_learning.py) refines the table from realized driving
instead of replanning, the racing/learning deployment mode.

TPU-first: the per-segment program is one jitted scan (compiled once,
reused every segment); the planner SQP reuses its own jitted passes across
replans; no data-dependent shapes anywhere (obstacle rows padded static).
"""

from __future__ import annotations

from typing import Callable, List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import MPCConfig, MPPConfig, SolverConfig, VehicleParams
from ..planner.mpp import plan_mpp
from ..planner.reftable import RefTable
from ..track.track import Track, frenet_to_global
from .estimator import DEFAULT_EKF_Q, EKFState, ekf_init, ekf_step
from .friction import FrictionState, friction_init, friction_step
from .global_loop import estimate_frenet, global_plant_step
from .lap_learning import (
    LapLearnConfig,
    _memorize_obstacles,
    _wraps_needed,
    learn_from_lap,
)
from .mpc import MPCCarry, mpc_init, mpc_step


class RaceCarry(NamedTuple):
    """Cross-step state of the composed loop (one pytree, scan-carried)."""

    xg: jnp.ndarray        # (6,) world-frame plant state (truth)
    mpc: MPCCarry          # tracker warm start + scheduling trajectory
    ekf: EKFState          # estimator mean/covariance (Frenet, unwrapped s)
    fric: FrictionState    # mu-hat RLS state
    x_prev_f: jnp.ndarray  # (6,) previous filtered state (friction residual)
    u_prev: jnp.ndarray    # (2,) last applied control (EKF predict input)
    key: jnp.ndarray       # PRNG key for the sensor noise stream


class RaceLog(NamedTuple):
    Xg: np.ndarray          # (T, 6) true world states
    Xf: np.ndarray          # (T, 6) filtered Frenet states fed to the MPC
    Z: np.ndarray           # (T, 6) raw (noisy) measurements
    U: np.ndarray           # (T, 2)
    mu_hat: np.ndarray      # (T,)
    converged: np.ndarray   # (T,)
    iters: np.ndarray       # (T,)
    r_prim: np.ndarray      # (T,) solver primal residual (the accepted-
                            # step bound: non-terminated steps are applied
                            # only below scfg.eps_fallback)
    replan_steps: np.ndarray   # step index of each planner/ILC table update
    tables_vx: np.ndarray      # (n_tables, n) vx profile after each update
    tables_ey: np.ndarray      # (n_tables, n) racing line after each update
    lap_steps: np.ndarray      # (n_laps,) step at which each lap completed


def _make_segment(
    p: VehicleParams,
    cfg: MPCConfig,
    scfg: SolverConfig,
    track: Track,
    T_seg: int,
    mu_true: float,
    mu0: float,
    sim_tire: str,
    n_sub: int,
    noise_sigma,
    use_ekf: bool,
    adapt_mu: bool,
    ekf_q,
):
    """One jitted tracking segment of the composed loop (compiled once).

    ``mu_true`` may be overridden per call with a TRACED scalar (the
    batched sweep vmaps it), so the plant friction is a runtime value.
    """
    f32 = jnp.float32
    nx = 6
    Qn = jnp.diag(jnp.asarray(ekf_q, f32))
    Rn = (
        jnp.diag(jnp.asarray(noise_sigma, f32) ** 2)
        if noise_sigma is not None
        else 1e-4 * jnp.eye(nx, dtype=f32)
    )

    @jax.jit
    def run(carry: RaceCarry, table: RefTable, obstacles=None,
            mu_plant=None):
        p_plant = p.replace(
            mu=jnp.asarray(mu_true if mu_plant is None else mu_plant, f32))

        def step(c: RaceCarry, _):
            key, kn = jax.random.split(c.key)
            # 2. measure: world -> Frenet around the previous unwrapped s
            #    (the ESTIMATOR's s, the one shared contract across
            #    subsystems), plus sensor noise
            z = estimate_frenet(track, c.xg, s_hint=c.ekf.x[4])
            if noise_sigma is not None:
                z = z + jnp.asarray(noise_sigma, f32) * jax.random.normal(
                    kn, z.shape, f32)
            # 3./4. estimate + adapt: the EKF runs the controller's model
            #    at the CURRENT mu-hat (adaptation closes through the
            #    filter); the RLS consumes the filtered transition
            mu_ctrl = c.fric.mu if adapt_mu else jnp.asarray(mu0, f32)
            p_hat = p.replace(mu=mu_ctrl)
            if use_ekf:
                ekf2 = ekf_step(p_hat, cfg, track, c.ekf, c.u_prev, z, Qn, Rn)
                xf = ekf2.x
            else:
                ekf2 = EKFState(x=z, P=c.ekf.P)
                xf = z
            fric2 = (
                friction_step(p, c.fric, c.x_prev_f, xf, c.u_prev, cfg.dt)
                if adapt_mu else c.fric
            )
            # 5. track: warm-started MPC at mu-hat on the current table
            u, mpc2, diag = mpc_step(p_hat, cfg, scfg, track, xf, table,
                                     c.mpc, obstacles=obstacles)
            # 6. simulate: world-frame truth at mu_true
            xg2 = global_plant_step(p_plant, cfg, c.xg, u, n_sub=n_sub,
                                    sim_tire=sim_tire)
            c2 = RaceCarry(xg=xg2, mpc=mpc2, ekf=ekf2, fric=fric2,
                           x_prev_f=xf, u_prev=u, key=key)
            out = (xg2, xf, z, u, fric2.mu, diag.converged, diag.iters,
                   diag.r_prim)
            return c2, out

        carry2, outs = jax.lax.scan(step, carry, None, length=T_seg)
        return carry2, outs

    return run


def race_loop(
    p: VehicleParams,
    cfg: MPCConfig,
    scfg: SolverConfig,
    pcfg: MPPConfig,
    track: Track,
    x0: jnp.ndarray,             # (6,) initial TRUE state, Frenet
    T: int,
    mu_true: float,
    mu0: float = 1.0,
    replan_every: int = 60,
    noise_sigma=None,            # (6,) per-state sensor sigma, or None
    key: Optional[jnp.ndarray] = None,
    use_ekf: bool = True,
    adapt_mu: bool = True,
    obstacles_fn: Optional[Callable[[int], Optional[np.ndarray]]] = None,
    max_obstacle_rows: int = 8,
    obs_tracker_lead: float = 0.0,   # ramped line lead-in ahead of blocks
    mu_plan0: Optional[float] = None,   # friction for the FIRST plan only
    ilc_every: int = 0,          # >0: ILC table refinement instead of replans
    ilc_cfg: Optional[LapLearnConfig] = None,
    sim_tire: str = "pacejka",
    n_sub: int = 10,
    plan_scfg: Optional[SolverConfig] = None,
    table0: Optional[RefTable] = None,
    ekf_q=None,              # (6,) per-state EKF process noise variance
    backend: str = "xla",    # "mega": segments on the racestep kernel
    interpret: bool = False,    # mega backend off-TPU (tests)
) -> RaceLog:
    """Race ``T`` control steps with the FULL stack composed.

    Two deployment modes sharing one compiled segment program:

    - **replanning** (default, ``ilc_every=0``): the MPP re-plans a
      receding horizon every ``replan_every`` steps from the car's current
      ESTIMATED state, with the vehicle model at the car's current mu-hat —
      friction adaptation flows into the planner's speed caps, and
      ``obstacles_fn(step)`` corridors reach planner AND tracker.
    - **racing/learning** (``ilc_every > 0``): the table is planned once
      (at mu0) and then refined every ``ilc_every`` segments by the ILC
      update on the realized (filtered) trajectory window, evaluated at
      mu-hat — lap times improve lap over lap while the estimator keeps
      correcting the surface model.

    Returns a :class:`RaceLog` with truth, estimates, raw measurements,
    controls, the mu-hat trace, every table update, and lap completions.

    ``backend="mega"`` runs every segment on the COMPOSED racestep kernel
    (ops/racestep_kernel.py — one Pallas launch per step; PERF.md r5):
    same estimate -> adapt -> solve -> apply -> simulate semantics, host
    Python still only at segment boundaries, and moving ``obstacles_fn``
    corridors update per segment as TRACED padded blocks (no re-tracing).
    The sensor-noise stream is drawn per-step from one key rather than
    the XLA path's per-lane key split, so runs match the XLA backend
    behaviorally, not bitwise.
    """
    if cfg.model != "dynamic":
        raise ValueError("race_loop composes the friction estimator; it "
                         "needs the dynamic model")
    assert cfg.model == pcfg.model, (cfg.model, pcfg.model)
    if key is None:
        key = jax.random.PRNGKey(0)
    f32 = jnp.float32
    x0 = jnp.asarray(x0, f32)
    if ekf_q is None:
        ekf_q = np.asarray(DEFAULT_EKF_Q, np.float32)

    use_mega = backend == "mega"
    if use_mega:
        from ..ops.racestep_kernel import racestep_init

        sig = (np.zeros(6, np.float32) if noise_sigma is None
               else np.asarray(noise_sigma, np.float32))
        has_obs = obstacles_fn is not None
        mega_runner = make_racestep_scan(
            p.replace(mu=jnp.asarray(mu0, f32)), cfg, scfg, track, None,
            replan_every, jnp.full((1,), mu_true, f32), sig,
            use_ekf=use_ekf, adapt_mu=adapt_mu, sim_tire=sim_tire,
            n_sub=n_sub, ekf_q=ekf_q, table_arg=True,
            obstacles_arg=has_obs, interpret=interpret, kap_window=True)
        mcarry = racestep_init(p, cfg, track, jnp.asarray(x0, f32)[None],
                               mu0)
        segment = None
    else:
        segment = _make_segment(
            p, cfg, scfg, track, replan_every, mu_true, mu0, sim_tire,
            n_sub, noise_sigma, use_ekf, adapt_mu, ekf_q,
        )

    # ILC refinement update (jitted once; mu-hat enters as a traced arg)
    wraps = _wraps_needed(
        float(cfg.bounds.vx_max),
        min(float(cfg.bounds.a_max), -float(cfg.bounds.a_min)),
        float(track.length),
    )
    ilc_cfg = ilc_cfg or LapLearnConfig()

    # world-frame truth from the Frenet x0
    Xw, Yw, psiw = frenet_to_global(track, x0[4], x0[5], x0[3])
    xg0 = jnp.stack([x0[0], x0[1], x0[2], Xw, Yw, psiw])
    carry = RaceCarry(
        xg=xg0,
        mpc=mpc_init(p.replace(mu=jnp.asarray(mu0, f32)), cfg, track, x0),
        ekf=ekf_init(x0),
        fric=friction_init(mu0),
        x_prev_f=x0,
        u_prev=jnp.zeros(2, f32),
        key=key,
    )

    def current_mu() -> float:
        if not adapt_mu:
            return float(mu0)
        return (float(mcarry.fr[0, 0]) if use_mega
                else float(carry.fric.mu))

    # consumed by the FIRST plan only (and only when race_loop itself
    # makes it — a caller-provided table0 is that caller's first plan,
    # so the first REPLAN must already use the live mu-hat)
    first_plan_mu = [mu_plan0 if table0 is None else None]

    def plan_now(t: int, x_state) -> RefTable:
        obs = _obstacles_at(obstacles_fn, t, max_obstacle_rows)
        # first-encounter protection (ROADMAP r5 #2): the graze anatomy
        # (measured r5) is FRICTION SATURATION, not a late side choice —
        # a first plan at an optimistic mu0 carries so much corner speed
        # on the true (lower-mu) surface that the tracker has no lateral
        # authority left to hold ANY avoidance line. Corridor lead-ins
        # and ramped line projections were both measured NOT to fix it
        # (conv 0.75 -> 0.44..0.60 with the pass unchanged); planning the
        # FIRST plan for the worst plausible surface does (the same
        # plan-conservative-adapt-up discipline batched_race_sweep
        # documents). ``mu_plan0`` sets that first-plan friction; replans
        # then speed up as mu-hat firms.
        mu_p = (first_plan_mu[0] if first_plan_mu[0] is not None
                else current_mu())
        first_plan_mu[0] = None
        table, _diag = plan_mpp(
            p.replace(mu=jnp.asarray(mu_p, f32)), pcfg, track,
            scfg=plan_scfg, obstacles=obs, x0_state=x_state,
        )
        if obs is not None and obs_tracker_lead > 0.0:
            # OPT-IN ramped line lead-in (the learner's _memorize_obstacles
            # projection applied to the planned line). Measured r5 on the
            # first-encounter graze scenario: does NOT clear the pass and
            # costs convergence (0.75 -> 0.58) — the graze is friction
            # saturation, fixed by mu_plan0 above — so it ships OFF by
            # default; useful where the plan's own corridor needs a
            # pre-positioned line (e.g. very short tracker previews).
            ey_room = float(track.width) / 2.0 - 0.05
            ey2 = _memorize_obstacles(
                p.replace(mu=jnp.asarray(current_mu(), f32)), cfg,
                LapLearnConfig(obs_lead=obs_tracker_lead), track, table,
                table.ey, obs, ey_room)
            table = table.replace(ey=ey2)
        return table

    table = table0 if table0 is not None else plan_now(0, x0)
    from .lap_learning import _curv_stencil

    curv_k = _curv_stencil(table)
    # the ILC update is obstacle-aware too (r4 review finding: without it
    # the learned line converges onto a graze of the block edge and then
    # fights the tracker's corridor every lap); obstacles arrive as a
    # traced fixed-shape padded array so moving corridors never retrace
    ilc_update = jax.jit(
        lambda p_hat, tbl, X, U, conv, obs: learn_from_lap(
            p_hat, cfg, ilc_cfg, track, tbl, X, U, wraps=wraps,
            curv_k=curv_k, converged=conv, obstacles=obs)
    )
    from ..planner.opponents import pad_blocks

    def padded_obstacles(t: int):
        return jnp.asarray(pad_blocks(
            obstacles_fn(t) if obstacles_fn is not None else None,
            max_obstacle_rows))
    segs: List = []
    replan_steps = [0]
    tables_vx = [np.asarray(table.vx)]
    tables_ey = [np.asarray(table.ey)]
    seg_X: List = []   # rolling filtered-state window for the ILC
    seg_U: List = []
    seg_C: List = []

    n_segs = -(-T // replan_every)
    for i in range(n_segs):
        t = i * replan_every
        if use_mega:
            key, kseg = jax.random.split(key)
            if has_obs:
                # moving corridors: the padded blocks are a TRACED run
                # arg, so per-segment obstacle updates never re-trace
                mcarry, outs_bl = mega_runner(
                    mcarry, kseg, table, padded_obstacles(t))
            else:
                mcarry, outs_bl = mega_runner(mcarry, kseg, table)
            xg_b, xf_b, u_b, mu_b, conv_b, z_b, it_b, rp_b = outs_bl
            sq = lambda a: jnp.moveaxis(a, -1, 0)[0]   # drop the B=1 lane
            outs = (sq(xg_b), sq(xf_b), sq(z_b), sq(u_b), mu_b[:, 0],
                    conv_b[:, 0], it_b[:, 0], rp_b[:, 0])
        else:
            obs = _obstacles_at(obstacles_fn, t, max_obstacle_rows)
            carry, outs = segment(carry, table, obs)
        segs.append(outs)
        t_next = t + replan_every
        if t_next >= T:
            break
        if ilc_every > 0:
            seg_X.append(outs[1])   # filtered states
            seg_U.append(outs[3])
            seg_C.append(outs[5])   # solver convergence (learner backoff)
            if (i + 1) % ilc_every == 0:
                Xw_ = jnp.concatenate(seg_X[-ilc_every:], axis=0)
                Uw_ = jnp.concatenate(seg_U[-ilc_every:], axis=0)
                Cw_ = jnp.concatenate(seg_C[-ilc_every:], axis=0)
                p_hat = p.replace(mu=jnp.asarray(current_mu(), f32))
                table = ilc_update(p_hat, table, Xw_, Uw_, Cw_,
                                   padded_obstacles(t_next))
                replan_steps.append(t_next)
                tables_vx.append(np.asarray(table.vx))
                tables_ey.append(np.asarray(table.ey))
                # only the last window is ever read again — drop older
                # segment buffers so long runs don't pin O(T) device
                # memory (r4 review finding)
                del seg_X[:-ilc_every], seg_U[:-ilc_every], seg_C[:-ilc_every]
        else:
            # replan from the current ESTIMATED state at the current mu-hat
            if use_mega:
                x_state = (mcarry.ekx[:, 0] if use_ekf
                           else mcarry.x_prev_f[:, 0])
            else:
                x_state = carry.ekf.x if use_ekf else carry.x_prev_f
            table = plan_now(t_next, x_state)
            replan_steps.append(t_next)
            tables_vx.append(np.asarray(table.vx))
            # keep tables_ey in lockstep with replan_steps in BOTH modes
            # (advisor r4: replan mode used to append only vx, silently
            # desyncing RaceLog.tables_ey from its documented shape)
            tables_ey.append(np.asarray(table.ey))

    cat = jax.tree.map(lambda *ls: np.concatenate(ls, axis=0)[:T], *segs)
    Xg, Xf, Z, U, mu_hat, conv, iters, r_prim = cat

    # lap completions from the estimator's unwrapped s (the shared contract)
    s_traj = Xf[:, 4]
    L = float(track.length)
    s0 = float(x0[4])
    n_laps = int((s_traj[-1] - s0) // L)
    lap_steps = np.asarray([
        int(np.argmax(s_traj - s0 >= (k + 1) * L)) + 1
        for k in range(n_laps)
    ])
    return RaceLog(
        Xg=Xg, Xf=Xf, Z=Z, U=U, mu_hat=mu_hat, converged=conv, iters=iters,
        r_prim=r_prim,
        replan_steps=np.asarray(replan_steps),
        tables_vx=np.stack(tables_vx),
        tables_ey=np.stack(tables_ey),
        lap_steps=lap_steps,
    )


def _obstacles_at(obstacles_fn, t: int, max_rows: int):
    if obstacles_fn is None:
        return None
    obs = obstacles_fn(t)
    if obs is None:
        return None
    from ..planner.opponents import pad_blocks

    return jnp.asarray(pad_blocks(obs, max_rows))


class BatchedRaceLog(NamedTuple):
    Xg: jnp.ndarray         # (B, T, 6) true world states
    Xf: jnp.ndarray         # (B, T, 6) filtered states fed to the MPC
    U: jnp.ndarray          # (B, T, 2)
    mu_hat: jnp.ndarray     # (B, T)
    converged: jnp.ndarray  # (B, T)


def mega_race_sweep(
    p: VehicleParams,
    cfg: MPCConfig,
    scfg: SolverConfig,
    track: Track,
    table: RefTable,             # shared racing line / speed profile
    x0_b: jnp.ndarray,           # (B, 6) initial TRUE states, Frenet
    T: int,
    mu_true_b: jnp.ndarray,      # (B,) per-lane PLANT friction
    mu0: float = 1.0,
    noise_sigma=None,
    key=None,
    use_ekf: bool = True,
    adapt_mu: bool = True,
    sim_tire: str = "pacejka",
    n_sub: int = 10,
    ekf_q=None,
    obstacles=None,              # optional (n_obs, 4) corridor blocks
    interpret: bool = False,
    kap_window: bool = True,     # windowed curvature lookup (bit-exact on
                                 # the closed loop, +5% — PERF.md r5)
) -> BatchedRaceLog:
    """The composed deployment sweep AT KERNEL RATE (VERDICT r4 missing #1):
    same contract as :func:`batched_race_sweep`, but every step — windowed
    global->Frenet measurement, noise, sub-stepped EKF at mu-hat, friction
    RLS, warm-started tracker, world-frame Pacejka plant — is ONE Pallas
    launch (ops/racestep_kernel.py), so the flagship composition runs at
    megastep-class throughput instead of the XLA path's. Per-step XLA work
    is only the table sampling and the noise draw.

    ``obstacles`` threads a static corridor-block set into the tracker's
    per-stage e_y bounds (the kernel's ``eyb`` operand), computed host-side
    by the same engine/assembly.py::corridor_from_blocks the XLA loop uses.
    """
    from ..ops.racestep_kernel import racestep_init

    if cfg.model != "dynamic":
        raise ValueError("the composed sweep needs the dynamic model")
    f32 = jnp.float32
    if key is None:
        key = jax.random.PRNGKey(0)
    sig = (np.zeros(6, np.float32) if noise_sigma is None
           else np.asarray(noise_sigma, np.float32))

    # the params' mu row is the CONTROLLER seed mu0 (it is the scheduling
    # mu whenever adapt_mu=False; with adaptation on, mu-hat overrides it)
    p_nom = p.replace(mu=jnp.asarray(mu0, f32))
    carry0 = racestep_init(p, cfg, track, x0_b, mu0)

    run = make_racestep_scan(
        p_nom, cfg, scfg, track, table, T,
        jnp.asarray(mu_true_b, f32), sig,
        use_ekf=use_ekf, adapt_mu=adapt_mu, sim_tire=sim_tire,
        n_sub=n_sub, ekf_q=ekf_q, obstacles=obstacles, interpret=interpret,
        kap_window=kap_window,
    )
    _, (Xg, Xf, U, mu_hat, conv, _z, _it, _r) = run(carry0, key)
    bf = lambda a: jnp.moveaxis(a, -1, 0)      # (T, ., B) -> (B, T, .)
    return BatchedRaceLog(Xg=bf(Xg), Xf=bf(Xf), U=bf(U),
                          mu_hat=bf(mu_hat), converged=bf(conv))


def make_racestep_scan(
    p: VehicleParams,
    cfg: MPCConfig,
    scfg: SolverConfig,
    track: Track,
    table: RefTable,
    T: int,
    mu_true_b: jnp.ndarray,
    sigma,                          # (6,) noise sigma (zeros = clean)
    use_ekf: bool = True,
    adapt_mu: bool = True,
    sim_tire: str = "pacejka",
    n_sub: int = 10,
    ekf_q=None,
    obstacles=None,
    interpret: bool = False,
    table_arg: bool = False,
    obstacles_arg: bool = False,
    gate_sigma: float = 0.0,     # >0: EKF innovation gating (HIL parity)
    n_sub_ekf: int = 4,          # EKF predict substeps (racestep default)
    kap_window: bool = False,    # block-local windowed curvature lookup
):
    """Build the jitted T-step composed scan ``run(carry0, key)`` once.

    ``mega_race_sweep`` wraps this for the one-shot contract; benchmarks
    and lap-learning outer loops hold the returned runner so repeated
    calls hit the compiled executable instead of re-tracing a T-step scan
    (re-tracing measured ~7 s host time per call at T=500).

    ``table_arg=True`` returns ``run(carry0, key, table)`` instead, so an
    outer learning loop can feed UPDATED (possibly per-lane, leaves
    (B, n)) tables without re-tracing — the kernel samples per-lane
    tables by plain one-hot (ops/racestep_kernel.py per_lane_refs).
    ``obstacles_arg=True`` (with table_arg) additionally takes a padded
    (n_rows, 4) corridor-block array per call —
    ``run(carry0, key, table, blocks)`` — so MOVING obstacles update
    between segments without re-tracing.

    The ``p`` params' mu row is the CONTROLLER seed mu0 (the scheduling
    mu whenever adapt_mu=False)."""
    return _make_racestep_scan_impl(
        p, cfg, scfg, track, table, T, mu_true_b, sigma, use_ekf, adapt_mu,
        sim_tire, n_sub, ekf_q, obstacles, interpret, table_arg,
        obstacles_arg, gate_sigma, n_sub_ekf, kap_window)


class MegaRaceLearnLog(NamedTuple):
    tables_vx: np.ndarray    # (n_windows + 1, B, n) per-lane vx profiles
    mu_hat: np.ndarray       # (n_windows, B, T_window) adaptation traces
    lap_steps: np.ndarray    # (n_windows, B) steps per window-lap (T+1 DNF)
    progress: np.ndarray     # (n_windows, B) arc length covered per window
    Xf_last: np.ndarray      # (B, T_window, 6) last window's states
    converged: np.ndarray    # (n_windows, B)
    table: RefTable          # final per-lane tables (leaves (B, n))


def mega_race_learn(
    p: VehicleParams,
    cfg: MPCConfig,
    scfg: SolverConfig,
    track: Track,
    x0_b: jnp.ndarray,           # (B, 6) initial TRUE states, Frenet
    n_windows: int,
    T_window: int,
    mu_true_b: jnp.ndarray,      # (B,) per-lane PLANT friction
    mu0: float = 1.0,
    noise_sigma=None,
    llcfg=None,
    table0: Optional[RefTable] = None,
    key=None,
    sim_tire: str = "pacejka",
    n_sub: int = 10,
    ekf_q=None,
    obstacles=None,
    interpret: bool = False,
) -> MegaRaceLearnLog:
    """PER-LANE learning in the composed sweep at kernel rate (VERDICT r4
    weak #2): every lane runs the FULL deployment stack (noisy measurement
    -> EKF at mu-hat -> friction RLS -> tracker -> per-lane-mu plant) on
    the racestep kernel following its OWN reference table, and between
    windows the ILC update (loop/lap_learning.py::learn_from_lap, vmapped)
    refines each lane's table AT ITS OWN mu-hat — low-grip lanes learn
    slower profiles than high-grip lanes from the SAME seed, with the
    estimator supplying the per-lane friction the learner caps speed with.

    One compiled runner is reused across windows (the per-lane tables are
    run-time args sampled in-kernel); the ILC update is one vmapped jitted
    program per window.
    """
    from .lap_learning import (
        LapLearnConfig,
        _curv_stencil,
        _wraps_needed,
        initial_table,
        lap_steps,
        learn_from_lap,
    )

    f32 = jnp.float32
    B = x0_b.shape[0]
    if key is None:
        key = jax.random.PRNGKey(0)
    llcfg = llcfg or LapLearnConfig()
    one = table0 if table0 is not None else initial_table(track)
    table_b = jax.tree.map(lambda a: jnp.broadcast_to(a, (B,) + a.shape),
                           one)
    sig = (np.zeros(6, np.float32) if noise_sigma is None
           else np.asarray(noise_sigma, np.float32))
    p_nom = p.replace(mu=jnp.asarray(mu0, f32))
    from ..ops.racestep_kernel import racestep_init

    carry = racestep_init(p, cfg, track, x0_b, mu0)
    run = make_racestep_scan(
        p_nom, cfg, scfg, track, None, T_window,
        jnp.asarray(mu_true_b, f32), sig, sim_tire=sim_tire, n_sub=n_sub,
        ekf_q=ekf_q, obstacles=obstacles, interpret=interpret,
        table_arg=True, kap_window=True,
    )
    wraps = _wraps_needed(
        float(cfg.bounds.vx_max),
        min(float(cfg.bounds.a_max), -float(cfg.bounds.a_min)),
        float(track.length))
    curv_k = _curv_stencil(one)
    pad_obs = None
    if obstacles is not None:
        from ..planner.opponents import pad_blocks

        pad_obs = jnp.asarray(pad_blocks(np.asarray(obstacles), 8))
    update = jax.jit(jax.vmap(
        lambda mu_l, tbl, X, U, conv: learn_from_lap(
            p.replace(mu=mu_l), cfg, llcfg, track, tbl, X, U, wraps=wraps,
            obstacles=pad_obs, curv_k=curv_k, converged=conv)))
    steps_fn = jax.jit(jax.vmap(
        lambda X, s0: lap_steps(cfg, track, X, T_window, s0=s0)))

    bf = lambda a: jnp.moveaxis(a, -1, 0)
    tables_vx = [np.asarray(table_b.vx)]
    mu_traces, laps, convs, progress = [], [], [], []
    Xf = None
    for w in range(n_windows):
        key, kw_ = jax.random.split(key)
        s0_lane = carry.ekx[4]                       # (B,) window start s
        carry, (Xg, Xf_bl, U_bl, mu_bl, conv_bl, _z, _it, _r) = run(
            carry, kw_, table_b)
        Xf = bf(Xf_bl)                               # (B, T, 6)
        U = bf(U_bl)
        conv = bf(conv_bl)
        mu_traces.append(np.asarray(bf(mu_bl)))
        laps.append(np.asarray(steps_fn(Xf, s0_lane)))
        progress.append(np.asarray(Xf[:, -1, 4] - s0_lane))
        convs.append(np.asarray(conv.mean(axis=1)))
        mu_now = carry.fr[0]                         # (B,) current mu-hat
        table_b = update(mu_now, table_b, Xf, U, conv)
        tables_vx.append(np.asarray(table_b.vx))

    return MegaRaceLearnLog(
        tables_vx=np.stack(tables_vx),
        mu_hat=np.stack(mu_traces),
        lap_steps=np.stack(laps),
        progress=np.stack(progress),
        Xf_last=np.asarray(Xf),
        converged=np.stack(convs),
        table=table_b,
    )


def checkpointed_race_sweep(
    p: VehicleParams,
    cfg: MPCConfig,
    scfg: SolverConfig,
    track: Track,
    table: RefTable,
    x0_b: jnp.ndarray,           # (B, 6) initial TRUE states, Frenet
    T: int,
    mu_true_b: jnp.ndarray,      # (B,) per-lane plant friction
    checkpoint_dir: str,
    save_every: int = 50,
    mu0: float = 1.0,
    noise_sigma=None,
    key=None,
    interpret: bool = False,
):
    """Resumable COMPOSED sweep on the racestep kernel (SURVEY §5
    "Checkpoint / resume" applied to the r5 flagship): ``T`` composed
    steps in ``save_every``-step chunks; after each chunk the full sweep
    state (the RaceMegaCarry — truth, EKF mean/covariance, RLS state,
    tracker warm start — plus the PRNG key and metric accumulators) is
    orbax-saved, and a restart latest-resumes to a final state IDENTICAL
    to an uninterrupted run (the chunk runner and key stream align, so
    resume equality is bitwise — pinned in tests/test_racestep.py).

    Single-process scope (the per-chip flagship scale: 32k concurrent
    composed cars fit one chip, PERF.md r5); pod sweeps wrap the same
    chunk runner in ``parallel/scenarios.py::sharded_race_sweep``'s
    shard_map. Returns (metrics dict, steps_run_this_call).
    """
    from ..ops.racestep_kernel import racestep_init
    from ..utils.record import SweepCheckpoint

    if T % save_every != 0:
        raise ValueError(
            f"T={T} must be a multiple of save_every={save_every}")
    f32 = jnp.float32
    B = x0_b.shape[0]
    if key is None:
        key = jax.random.PRNGKey(0)
    sig = (np.zeros(6, np.float32) if noise_sigma is None
           else np.asarray(noise_sigma, np.float32))
    p_nom = p.replace(mu=jnp.asarray(mu0, f32))
    run = make_racestep_scan(p_nom, cfg, scfg, track, table, save_every,
                             jnp.asarray(mu_true_b, f32), sig,
                             interpret=interpret, kap_window=True)

    @jax.jit
    def chunk(carry, k, acc):
        k, kc = jax.random.split(k)
        carry, (_Xg, Xf, _U, _mu, conv, _z, _it, _r) = run(carry, kc)
        acc = {
            "conv": acc["conv"] + jnp.sum(conv, axis=0),        # (B,)
            "ey_sq": acc["ey_sq"] + jnp.sum(Xf[:, 5, :] ** 2, axis=0),
        }
        return carry, k, acc

    ckpt = SweepCheckpoint(checkpoint_dir)
    zeros = jnp.zeros((B,), f32)
    state = {
        "carry": racestep_init(p, cfg, track, x0_b, mu0)._asdict(),
        "key": key,
        "acc": {"conv": zeros, "ey_sq": zeros},
    }
    step = 0
    if ckpt.latest_step() is not None:
        step, state = ckpt.restore(state)
    step0 = step

    from ..ops.racestep_kernel import RaceMegaCarry

    while step < T:
        carry, k, acc = chunk(RaceMegaCarry(**state["carry"]),
                              state["key"], state["acc"])
        state = {"carry": carry._asdict(), "key": k, "acc": acc}
        step += save_every
        ckpt.save(step, state)

    carry = RaceMegaCarry(**state["carry"])
    metrics = {
        "n_scenarios": float(B),
        "converged_frac": float(jnp.mean(state["acc"]["conv"]) / T),
        "ey_rms": float(jnp.mean(
            jnp.sqrt(state["acc"]["ey_sq"] / T))),
        "mu_hat_mean": float(jnp.mean(carry.fr[0])),
        "mean_progress": float(jnp.mean(carry.ekx[4])),
    }
    return metrics, step - step0


def _make_racestep_scan_impl(
    p, cfg, scfg, track, table, T, mu_true_b, sigma, use_ekf, adapt_mu,
    sim_tire, n_sub, ekf_q, obstacles, interpret, table_arg,
    obstacles_arg=False, gate_sigma=0.0, n_sub_ekf=4, kap_window=False,
):
    from ..ops.megastep_kernel import megastep_params
    from ..ops.racestep_kernel import racestep

    f32 = jnp.float32
    B = mu_true_b.shape[0]
    mu_true_b = jnp.asarray(mu_true_b, f32)
    sig = np.asarray(sigma, np.float32)
    if ekf_q is None:
        ekf_q = np.asarray(DEFAULT_EKF_Q, np.float32)
    ekf_r = np.where(sig > 0, sig**2, 1e-4).astype(np.float32)
    prm = megastep_params(p, B)
    s_idx = 4

    if obstacles is not None or obstacles_arg:
        from ..engine.assembly import (
            block_curvatures,
            corridor_from_blocks,
            steerable_curvature,
        )
        from ..track.track import wrap_s

        kc = steerable_curvature(p, cfg.bounds.delta_max)
        half = cfg.bounds.ey_max
        static_blocks = (None if obstacles is None
                         else jnp.asarray(obstacles, f32))

        def eyb_from_sched(s_sched, blocks):
            # `blocks` may be a TRACED padded (n_rows, 4) array (the
            # obstacles_arg path: moving corridors without re-tracing) —
            # block_curvatures/corridor_from_blocks are shape-static over
            # the padded rows, so tracing is clean
            kb = block_curvatures(track, blocks)
            sm = wrap_s(track, s_sched)
            lo = jnp.full(sm.shape, -half, f32)
            hi = jnp.full(sm.shape, half, f32)
            lo, hi = corridor_from_blocks(sm, lo, hi, blocks, 0.0, half,
                                          kappa_blk=kb, kappa_cap=kc)
            return jnp.stack([lo, hi], axis=1)
    else:
        eyb_from_sched = None
        static_blocks = None

    def scan_body(carry, key, tbl, blocks=None):
        def step(c, _):
            car, kk = c
            kk, kn = jax.random.split(kk)
            noise = jnp.asarray(sig)[:, None] * jax.random.normal(
                kn, (6, B), f32)
            if eyb_from_sched is None:
                eyb = None
            else:
                s_sched = jnp.concatenate([
                    car.ekx[s_idx][None],
                    car.X_pred[2:, s_idx],
                    car.X_pred[-1:, s_idx],
                ], axis=0)
                eyb = eyb_from_sched(
                    s_sched,
                    blocks if blocks is not None else static_blocks)
            car2, u0, diag, z = racestep(
                cfg, scfg, track, prm, tbl, car, noise, mu_true_b,
                ekf_q, ekf_r, n_sub=n_sub, n_sub_ekf=n_sub_ekf,
                sim_tire=sim_tire,
                use_ekf=use_ekf, adapt_mu=adapt_mu,
                gate_sigma=gate_sigma, interpret=interpret,
                eyb=eyb, kap_window=kap_window,
            )
            out = (car2.xg, car2.x_prev_f, u0, diag[5], diag[2], z,
                   diag[4], diag[0])
            return (car2, kk), out

        (carry, _), outs = jax.lax.scan(step, (carry, key), None, length=T)
        return carry, outs

    if table_arg and obstacles_arg:
        return jax.jit(scan_body)
    if table_arg:
        return jax.jit(lambda carry, key, tbl: scan_body(carry, key, tbl))
    return jax.jit(lambda carry, key: scan_body(carry, key, table))


def batched_race_sweep(
    p: VehicleParams,
    cfg: MPCConfig,
    scfg: SolverConfig,
    track: Track,
    table: RefTable,             # shared racing line / speed profile
    x0_b: jnp.ndarray,           # (B, 6) initial TRUE states, Frenet
    T: int,
    mu_true_b: jnp.ndarray,      # (B,) per-lane PLANT friction
    mu0: float = 1.0,
    noise_sigma=None,
    key: Optional[jnp.ndarray] = None,
    use_ekf: bool = True,
    adapt_mu: bool = True,
    sim_tire: str = "pacejka",
    n_sub: int = 10,
    ekf_q=None,
) -> BatchedRaceLog:
    """Monte-Carlo of the COMPOSED deployment stack (ROADMAP r5 #1, the
    scenario-batching design of SURVEY §2.2 applied to the FULL loop):
    B independent cars — each with its own plant friction, sensor-noise
    stream, EKF, friction RLS and warm-started tracker — run the whole
    estimate -> adapt -> solve -> apply -> simulate chain as ONE vmapped
    jitted scan following a shared table. Per-lane mu-hat must converge
    to per-lane mu_true: the adaptation pipeline is fully batched.
    """
    if cfg.model != "dynamic":
        raise ValueError("the composed sweep needs the dynamic model")
    f32 = jnp.float32
    B = x0_b.shape[0]
    if key is None:
        key = jax.random.PRNGKey(0)
    keys = jax.random.split(key, B)
    if ekf_q is None:
        ekf_q = np.asarray(DEFAULT_EKF_Q, np.float32)

    segment = _make_segment(
        p, cfg, scfg, track, T, mu0, mu0, sim_tire, n_sub,
        noise_sigma, use_ekf, adapt_mu, ekf_q,
    )
    p_ctrl = p.replace(mu=jnp.asarray(mu0, f32))

    def mk_carry(x0, k):
        Xw, Yw, psiw = frenet_to_global(track, x0[4], x0[5], x0[3])
        xg0 = jnp.stack([x0[0], x0[1], x0[2], Xw, Yw, psiw])
        return RaceCarry(
            xg=xg0, mpc=mpc_init(p_ctrl, cfg, track, x0), ekf=ekf_init(x0),
            fric=friction_init(mu0), x_prev_f=x0,
            u_prev=jnp.zeros(2, f32), key=k,
        )

    carry_b = jax.vmap(mk_carry)(jnp.asarray(x0_b, f32), keys)
    _, outs = jax.vmap(
        lambda c, m: segment(c, table, None, m), in_axes=(0, 0)
    )(carry_b, jnp.asarray(mu_true_b, f32))
    Xg, Xf, _Z, U, mu_hat, conv, _it, _r = outs
    return BatchedRaceLog(Xg=Xg, Xf=Xf, U=U, mu_hat=mu_hat, converged=conv)
