"""Global-frame simulation path (reference parity: plant in world frame,
Frenet state via getLocalPosition each step — SURVEY.md §2, §3.4)."""

import jax
import jax.numpy as jnp
import numpy as np

from autonomous_racing_lpv_mpp_mpc_tpu.core import (
    MPCConfig,
    SolverConfig,
    VehicleParams,
)
from autonomous_racing_lpv_mpp_mpc_tpu.loop import (
    closed_loop,
    closed_loop_global,
    constant_refs,
    f_global,
)
from autonomous_racing_lpv_mpp_mpc_tpu.models import f_dynamic
from autonomous_racing_lpv_mpp_mpc_tpu.track import oval_track, racetrack

P = VehicleParams()
CFG = MPCConfig(N=16, model="dynamic")
SCFG = SolverConfig(max_iter=40, rho_interval=0)


def test_global_ode_consistent_with_frenet_ode():
    """On a straight (kappa=0, aligned), vx/vy/wz dynamics must coincide."""
    x_f = jnp.array([1.5, 0.1, 0.4, 0.0, 0.0, 0.0])
    x_g = jnp.array([1.5, 0.1, 0.4, 0.0, 0.0, 0.0])
    u = jnp.array([0.1, 0.8])
    df = f_dynamic(P, x_f, u, jnp.asarray(0.0))
    dg = f_global(P, x_g, u)
    np.testing.assert_allclose(np.asarray(df[:3]), np.asarray(dg[:3]), atol=1e-6)
    # s-dot == X-dot, ey-dot == Y-dot in the aligned frame
    np.testing.assert_allclose(float(df[4]), float(dg[3]), atol=1e-6)
    np.testing.assert_allclose(float(df[5]), float(dg[4]), atol=1e-6)


def test_global_loop_matches_frenet_loop():
    track = racetrack()
    x0 = jnp.array([1.0, 0.0, 0.0, 0.0, 0.0, 0.05])
    refs = constant_refs(CFG, 1.8)
    T = 250
    logF = closed_loop(P, CFG, SCFG, track, x0, refs, T=T)
    logG = closed_loop_global(P, CFG, SCFG, track, x0, refs, T=T)
    XF = np.asarray(logF.X)
    XG = np.asarray(logG.Xf)
    assert XG[-1, 4] > 10.0                          # progressed
    assert np.abs(XF[:, 4] - XG[:, 4]).max() < 0.15  # same s trajectory
    assert np.abs(XF[:, 5] - XG[:, 5]).max() < 0.02  # same lateral behavior
    assert np.asarray(logG.converged).mean() > 0.95


def test_global_loop_with_measurement_noise():
    track = oval_track()
    x0 = jnp.array([1.0, 0.0, 0.0, 0.0, 0.0, 0.0])
    refs = constant_refs(CFG, 1.5)
    sigma = jnp.array([0.02, 0.01, 0.02, 0.01, 0.01, 0.005])
    log = closed_loop_global(
        P, CFG, SCFG, track, x0, refs, T=250,
        noise_sigma=sigma, key=jax.random.PRNGKey(3),
    )
    Xf = np.asarray(log.Xf)
    assert Xf[-1, 4] > float(track.length)           # completes a lap anyway
    assert np.abs(Xf[:, 5]).max() < 0.2
    assert np.asarray(log.converged).mean() > 0.9


def test_global_loop_multilap_unwrap():
    """s must stay monotone (unwrapped) across the start line."""
    track = oval_track()
    x0 = jnp.array([1.5, 0.0, 0.0, 0.0, 0.0, 0.0])
    refs = constant_refs(CFG, 1.8)
    log = closed_loop_global(P, CFG, SCFG, track, x0, refs, T=400)
    s = np.asarray(log.Xf)[:, 4]
    assert s[-1] > 1.5 * float(track.length)
    assert np.all(np.diff(s) > -0.05)                # no wrap glitches
