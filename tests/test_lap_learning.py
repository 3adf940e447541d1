"""Lap-over-lap reference learning (loop/lap_learning.py).

Beyond reference parity: the reference lineage's hallmark capability
(learning across laps) on top of the stock closed loop — lap time must
drop lap over lap while the car stays on track.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autonomous_racing_lpv_mpp_mpc_tpu.core import (
    MPCConfig,
    SolverConfig,
    VehicleParams,
)
from autonomous_racing_lpv_mpp_mpc_tpu.loop import (
    LapLearnConfig,
    initial_table,
    iterative_lap_learning,
    lap_steps,
    learn_from_lap,
)
from autonomous_racing_lpv_mpp_mpc_tpu.track import oval_track

P = VehicleParams()
SCFG = SolverConfig(max_iter=50)


@pytest.mark.quick
def test_accel_limit_and_update_properties():
    """The jitted ILC update yields a physically consistent profile."""
    from autonomous_racing_lpv_mpp_mpc_tpu.loop.lap_learning import (
        _accel_limit_circular,
    )

    track = oval_track(ds=0.05)
    cfg = MPCConfig(N=8, model="dynamic")
    llcfg = LapLearnConfig()
    table = initial_table(track, ds=0.05, vx0=1.0)

    # synthetic clean lap trace at the reference speed on the centerline
    T = 300
    dt = cfg.dt
    s = jnp.cumsum(jnp.full((T,), 1.0 * dt))
    X = jnp.zeros((T, 6)).at[:, 0].set(1.0).at[:, 4].set(s)
    U = jnp.zeros((T, 2))
    new = jax.jit(
        lambda tbl: learn_from_lap(P, cfg, llcfg, track, tbl, X, U)
    )(table)

    v = np.asarray(new.vx)
    # learner raises the reference somewhere (headroom existed everywhere)
    assert v.max() > 1.05
    assert v.min() >= llcfg.v_floor - 1e-6
    assert v.max() <= cfg.bounds.vx_max + 1e-6
    # longitudinal consistency: v^2 differences respect the accel limits
    ds = float(new.ds)
    v2 = v * v
    dv2 = np.roll(v2, -1) - v2
    assert (dv2 <= 2 * cfg.bounds.a_max * ds + 1e-4).all()
    assert (-dv2 <= 2 * (-cfg.bounds.a_min) * ds + 1e-4).all()

    # the filter alone: a spike gets pulled down to a consistent profile
    vs = jnp.full((40,), 2.0).at[10].set(4.0)
    vf = np.asarray(_accel_limit_circular(vs, 0.05, 3.0, 2.0))
    assert vf.max() < 2.4


def test_lap_time_drops_over_laps():
    """Four learned laps on the oval: every lap completes, lap time falls
    >=15% from the conservative seed, and the car stays in the corridor."""
    cfg = MPCConfig(N=12, model="dynamic")
    track = oval_track(ds=0.05)
    x0 = jnp.array([1.0, 0.0, 0.0, 0.0, 0.0, 0.0])
    out = iterative_lap_learning(
        P, cfg, SCFG, track, x0, n_laps=4, T_lap=400,
        table0=initial_table(track, ds=0.05, vx0=1.0),
    )
    laps = out.lap_steps
    assert (laps < 400).all(), laps                      # every lap completed
    assert laps[-1] <= laps.min() + 5                    # no late regression
    assert laps[-1] < 0.85 * laps[0], laps               # >=15% faster
    X = np.asarray(out.last_log.X)
    assert np.abs(X[:, 5]).max() < 0.4                   # corridor kept
    assert np.asarray(out.last_log.converged).mean() > 0.9
    # the learned profile slows for the corners and speeds on straights
    vx_prof = out.tables_vx[-1]
    assert vx_prof.max() - vx_prof.min() > 0.4


@pytest.mark.quick
def test_lap_steps_detection():
    cfg = MPCConfig(N=8, model="kinematic")
    track = oval_track(ds=0.05)
    T = 50
    s = jnp.linspace(0.0, 2.0 * float(track.length), T)
    X = jnp.zeros((T, 4)).at[:, 2].set(s)
    t = int(lap_steps(cfg, track, X, T))
    assert 0 < t < T
    X_dnf = jnp.zeros((T, 4))
    assert int(lap_steps(cfg, track, X_dnf, T)) == T


def test_batched_learning_mu_ordering():
    """vmapped friction sweep: each lane learns its own profile, and more
    grip must mean a faster learned lap (monotone in mu)."""
    import dataclasses

    from autonomous_racing_lpv_mpp_mpc_tpu.loop.lap_learning import (
        batched_lap_learning,
    )

    mus = np.array([0.5, 0.8, 1.1], np.float32)
    B = mus.shape[0]
    p_b = jax.tree.map(
        lambda a: jnp.broadcast_to(jnp.asarray(a, jnp.float32), (B,)),
        VehicleParams(),
    )
    p_b = dataclasses.replace(p_b, mu=jnp.asarray(mus))
    # Pacejka plant AND Pacejka-aware (secant-stiffness) controller: the
    # low-grip lane must actually saturate for mu to order the outcomes
    cfg = MPCConfig(N=10, model="dynamic", tire="pacejka")
    track = oval_track(ds=0.05)
    x0_b = jnp.zeros((B, 6)).at[:, 0].set(1.0)
    out = batched_lap_learning(
        p_b, cfg, SCFG, track, x0_b, n_laps=6, T_lap=400,
        llcfg=LapLearnConfig(gain=0.7, dv_max=0.8, a_lat_frac=0.8),
        table0=initial_table(track, ds=0.05, vx0=1.0),
        sim_tire="pacejka",
    )
    laps = out.lap_steps                       # (n_laps, B)
    assert laps.shape == (6, B)
    assert (laps < 400).all(), laps
    final = laps[-1]
    # every lane improved a lot on its own seed lap, and grip orders the
    # learned laps: more mu -> strictly faster
    assert (final < 0.75 * laps[0]).all(), laps
    assert final[2] < final[1] < final[0], final
    # learned peak speed grows with grip
    peaks = out.tables_vx[-1].max(axis=1)
    assert peaks[0] < peaks[1] < peaks[2] + 1e-6, peaks
    X = np.asarray(out.last_log.X)             # (B, T, 6)
    assert np.abs(X[..., 5]).max() < 0.4


def test_kinematic_lap_learning():
    """Model-generic learner: the kinematic bicycle (config 1) learns too."""
    from autonomous_racing_lpv_mpp_mpc_tpu.core import MPCWeights

    cfg = MPCConfig(N=10, model="kinematic",
                    weights=MPCWeights.for_model("kinematic"))
    track = oval_track(ds=0.05)
    x0 = jnp.array([1.0, 0.0, 0.0, 0.0])
    out = iterative_lap_learning(
        P, cfg, SCFG, track, x0, n_laps=3, T_lap=400,
        table0=initial_table(track, ds=0.05, vx0=1.0),
    )
    laps = out.lap_steps
    assert (laps < 400).all(), laps
    assert laps[-1] < 0.93 * laps[0], laps
    X = np.asarray(out.last_log.X)
    assert np.abs(X[:, 3]).max() < 0.4
