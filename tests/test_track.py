"""Track geometry unit tests (SURVEY.md §4.1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autonomous_racing_lpv_mpp_mpc_tpu.track import (
    compile_track,
    curvature_at,
    centerline_pose,
    frenet_to_global,
    global_to_frenet,
    oval_track,
    racetrack,
    wrap_s,
)


pytestmark = pytest.mark.quick  # smoke tier: see pyproject markers


@pytest.fixture(scope="module", params=["oval", "racetrack"])
def track(request):
    return oval_track() if request.param == "oval" else racetrack()


def test_track_closes(track):
    # last node pose == first node pose (heading modulo 2*pi)
    assert np.isclose(float(track.X[-1]), float(track.X[0]), atol=1e-3)
    assert np.isclose(float(track.Y[-1]), float(track.Y[0]), atol=1e-3)
    dpsi = float(track.psi[-1] - track.psi[0])
    assert np.isclose(dpsi % (2 * np.pi), 0.0, atol=1e-3) or np.isclose(
        dpsi % (2 * np.pi), 2 * np.pi, atol=1e-3
    )


def test_curvature_lookup_piecewise(track):
    # curvature at cell centers matches the stored table
    n = track.kappa.shape[0]
    s = (jnp.arange(n) + 0.5) * track.ds
    np.testing.assert_allclose(curvature_at(track, s), track.kappa, rtol=1e-6)


def test_wrap_s(track):
    L = float(track.length)
    s = jnp.array([0.0, L, L + 0.5, -0.3, 3 * L + 0.1])
    w = np.asarray(wrap_s(track, s))
    assert np.all((w >= 0) & (w < L + 1e-6))
    np.testing.assert_allclose(w[1], 0.0, atol=1e-5)
    np.testing.assert_allclose(w[2], 0.5, atol=1e-4)


def test_frenet_global_roundtrip(track):
    # getLocal(getGlobal(s, e_y)) == (s, e_y)  over a grid (SURVEY.md §4.1)
    L = float(track.length)
    s = jnp.linspace(0.01, L - 0.01, 83)
    for ey_val in (-0.25, 0.0, 0.3):
        ey = jnp.full_like(s, ey_val)
        epsi = jnp.full_like(s, 0.1)
        X, Y, psi = jax.vmap(lambda a, b, c: frenet_to_global(track, a, b, c))(s, ey, epsi)
        s2, ey2, epsi2 = jax.vmap(lambda a, b, c: global_to_frenet(track, a, b, c))(X, Y, psi)
        # wrap-around distance for s
        ds_err = np.minimum(np.abs(np.asarray(s2 - s)), L - np.abs(np.asarray(s2 - s)))
        assert ds_err.max() < 0.03
        np.testing.assert_allclose(ey2, ey, atol=0.01)
        np.testing.assert_allclose(epsi2, epsi, atol=0.02)


def test_centerline_pose_continuous(track):
    # psi is unwrapped => interpolation never jumps; check continuity at joints
    L = float(track.length)
    # stop short of s = L: wrap_s maps it back to 0 (psi drops by 2*pi there
    # by design — unwrapped within a lap, not across laps)
    s = jnp.linspace(0.0, 0.999 * L, 2000)
    _, _, psi = jax.vmap(lambda a: centerline_pose(track, a))(s)
    dpsi = np.abs(np.diff(np.asarray(psi)))
    assert dpsi.max() < 0.1  # no 2*pi jumps


def test_transforms_jit_and_vmap(track):
    f = jax.jit(jax.vmap(lambda s: frenet_to_global(track, s, 0.1, 0.0)))
    X, Y, psi = f(jnp.linspace(0.0, 1.0, 16))
    assert X.shape == (16,)


def test_track_from_centerline_roundtrip():
    """Building a track from recorded centerline XY reproduces the analytic
    one (length, curvature, transforms) and is drivable."""
    from autonomous_racing_lpv_mpp_mpc_tpu.track import track_from_centerline

    ref = oval_track()
    xy = np.stack([np.asarray(ref.X), np.asarray(ref.Y)], axis=1)
    t2 = track_from_centerline(xy, width=0.8, ds=0.02)
    assert abs(float(t2.length) - float(ref.length)) < 0.05
    # curvature plateaus match (straight ~0, corner ~1/R = 1.0)
    k = np.asarray(t2.kappa)
    assert abs(np.median(k[np.abs(k) < 0.3])) < 0.05
    corner = k[k > 0.5]
    assert corner.size > 0 and abs(np.median(corner) - 1.0) < 0.1
    # roundtrip transforms still work
    s = jnp.linspace(0.3, float(t2.length) - 0.3, 31)
    X, Y, psi = jax.vmap(lambda a: frenet_to_global(t2, a, 0.1, 0.0))(s)
    s2, ey2, _ = jax.vmap(lambda a, b, c: global_to_frenet(t2, a, b, c))(X, Y, psi)
    np.testing.assert_allclose(np.asarray(ey2), 0.1, atol=0.02)


def test_drive_on_centerline_track():
    """Closed loop completes a lap on an XY-imported track."""
    from autonomous_racing_lpv_mpp_mpc_tpu.core import (
        MPCConfig, MPCWeights, SolverConfig, VehicleParams,
    )
    from autonomous_racing_lpv_mpp_mpc_tpu.loop import closed_loop, constant_refs
    from autonomous_racing_lpv_mpp_mpc_tpu.track import track_from_centerline

    ref = oval_track()
    xy = np.stack([np.asarray(ref.X), np.asarray(ref.Y)], axis=1)
    t2 = track_from_centerline(xy, width=0.8, ds=0.02)
    cfg = MPCConfig(N=10, model="kinematic",
                    weights=MPCWeights.for_model("kinematic"))
    log = closed_loop(VehicleParams(), cfg, SolverConfig(max_iter=40), t2,
                      jnp.array([0.5, 0.0, 0.0, 0.0]),
                      constant_refs(cfg, 1.5), T=300)
    X = np.asarray(log.X)
    assert X[-1, 2] > float(t2.length)
    assert np.abs(X[:, 3]).max() < 0.1


def test_tab_chicane_nets_zero():
    # the _tab block is equivalent to a straight of 4r (specs.py docstring)
    from autonomous_racing_lpv_mpp_mpc_tpu.track.specs import _tab

    t = compile_track([(1.0, 0.0)] + _tab(0.5) + [(1.0, 0.0)], ds=0.01)
    assert np.isclose(float(t.psi[-1]), 0.0, atol=1e-3)
    assert np.isclose(float(t.Y[-1]), 0.0, atol=1e-3)
    assert np.isclose(float(t.X[-1]), 1.0 + 4 * 0.5 + 1.0, atol=1e-3)


def test_global_to_frenet_windowed_matches_dense():
    """Hint-windowed conversion == dense argmin whenever the hint is near
    (the closed-loop invariant); exercises wrap-around at s=0/L."""
    import numpy as np
    from autonomous_racing_lpv_mpp_mpc_tpu.track import racetrack
    from autonomous_racing_lpv_mpp_mpc_tpu.track.track import (
        global_to_frenet_windowed,
    )

    track = racetrack()
    L = float(track.length)
    s_true = jnp.asarray([0.05, 1.3, L / 2, L - 0.04, 0.0])
    ey = jnp.asarray([0.05, -0.12, 0.0, 0.1, -0.07])
    ep = jnp.asarray([0.1, -0.2, 0.05, 0.0, 0.15])
    X, Y, psi = jax.vmap(lambda a, b, c: frenet_to_global(track, a, b, c))(
        s_true, ey, ep)
    # hint = true s perturbed by up to 1.5 m (several control steps of lag)
    hints = s_true + jnp.asarray([0.4, -1.2, 0.9, 1.4, -0.3])
    sd, eyd, epd = jax.vmap(lambda a, b, c: global_to_frenet(track, a, b, c))(
        X, Y, psi)
    sw, eyw, epw = jax.jit(jax.vmap(
        lambda a, b, c, h: global_to_frenet_windowed(track, a, b, c, h)
    ))(X, Y, psi, hints)
    np.testing.assert_allclose(np.asarray(sw), np.asarray(sd), atol=1e-5)
    np.testing.assert_allclose(np.asarray(eyw), np.asarray(eyd), atol=1e-5)
    np.testing.assert_allclose(np.asarray(epw), np.asarray(epd), atol=1e-5)


def test_global_to_frenet_windowed_falls_back_on_bad_hint():
    """A hint wrong by more than the window (nearest windowed node farther
    than window_m from the query) must fall back to the dense hint-free
    conversion instead of silently locking onto the wrong segment (round-2
    advisor finding)."""
    import numpy as np
    from autonomous_racing_lpv_mpp_mpc_tpu.track import racetrack
    from autonomous_racing_lpv_mpp_mpc_tpu.track.track import (
        global_to_frenet_windowed,
    )

    track = racetrack()
    L = float(track.length)
    s_true = jnp.asarray([0.3, L / 3, 0.8 * L])
    ey = jnp.asarray([0.05, -0.1, 0.08])
    ep = jnp.asarray([0.0, 0.1, -0.05])
    X, Y, psi = jax.vmap(lambda a, b, c: frenet_to_global(track, a, b, c))(
        s_true, ey, ep)
    # hints on the OPPOSITE side of the track: wrong by >> window_m
    hints = (s_true + L / 2) % L
    sd, eyd, epd = jax.vmap(lambda a, b, c: global_to_frenet(track, a, b, c))(
        X, Y, psi)
    sw, eyw, epw = jax.jit(jax.vmap(
        lambda a, b, c, h: global_to_frenet_windowed(track, a, b, c, h)
    ))(X, Y, psi, hints)
    np.testing.assert_allclose(np.asarray(sw), np.asarray(sd), atol=1e-5)
    np.testing.assert_allclose(np.asarray(eyw), np.asarray(eyd), atol=1e-5)
    np.testing.assert_allclose(np.asarray(epw), np.asarray(epd), atol=1e-5)
