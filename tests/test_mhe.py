"""Moving-horizon estimation tests (loop/mhe.py): MHE as LQR-in-the-noise
on the Riccati machinery, sequentially-linearized LPV updates."""

import jax
import jax.numpy as jnp
import numpy as np

from autonomous_racing_lpv_mpp_mpc_tpu.core import MPCConfig, VehicleParams
from autonomous_racing_lpv_mpp_mpc_tpu.loop import (
    MHEConfig,
    mhe_init,
    mhe_step,
    plant_step,
)
from autonomous_racing_lpv_mpp_mpc_tpu.track import oval_track

P = VehicleParams()
CFG = MPCConfig(N=12, model="dynamic")
NX = 6


def drive_inputs(T):
    t = jnp.arange(T, dtype=jnp.float32)
    delta = 0.08 * jnp.sin(2 * jnp.pi * t / 40.0)
    a = 0.3 + 0.2 * jnp.cos(2 * jnp.pi * t / 60.0)
    return jnp.stack([delta, a], axis=1)


def simulate_truth(x0, U, n_sub=4):
    track = oval_track()

    def step(x, u):
        xn = plant_step(P, CFG, track, x, u, n_sub=n_sub)
        return xn, xn

    _, X = jax.lax.scan(step, x0, U)
    return X  # (T, nx) states AFTER each input


def run_filter(mcfg, H, Qw, Rv, P0, Z, U, x0_guess):
    track = oval_track()
    st = mhe_init(CFG, mcfg, x0_guess, H)

    @jax.jit
    def scan_all(st):
        def step(st, inp):
            u, z = inp
            st, x_hat = mhe_step(P, CFG, mcfg, track, st, u, z, P0, H, Qw, Rv)
            return st, x_hat

        return jax.lax.scan(step, st, (U, Z))

    _, X_hat = scan_all(st)
    return X_hat


def test_mhe_noise_free_recovers_truth():
    T = 30
    U = drive_inputs(T)
    x0 = jnp.array([1.2, 0.0, 0.0, 0.0, 0.0, 0.05])
    X_true = simulate_truth(x0, U)
    H = jnp.eye(NX)
    Z = X_true @ H.T
    mcfg = MHEConfig(W=6, n_gn=2)
    X_hat = run_filter(
        mcfg, H, Qw=1e-4 * jnp.eye(NX), Rv=1e-6 * jnp.eye(NX),
        P0=0.1 * jnp.eye(NX), Z=Z, U=U, x0_guess=x0,
    )
    err = np.abs(np.asarray(X_hat[mcfg.W:]) - np.asarray(X_true[mcfg.W:])).max()
    assert err < 2e-3


def test_mhe_smooths_noisy_measurements():
    T = 90
    U = drive_inputs(T)
    x0 = jnp.array([1.2, 0.0, 0.0, 0.0, 0.0, 0.05])
    X_true = simulate_truth(x0, U)
    sigma = jnp.array([0.05, 0.02, 0.05, 0.02, 0.02, 0.02])
    Z = X_true + sigma * jax.random.normal(jax.random.PRNGKey(0), X_true.shape)
    H = jnp.eye(NX)
    mcfg = MHEConfig(W=8, n_gn=2)
    X_hat = run_filter(
        mcfg, H, Qw=1e-4 * jnp.eye(NX), Rv=jnp.diag(sigma**2),
        P0=0.1 * jnp.eye(NX), Z=Z, U=U, x0_guess=x0,
    )
    w = mcfg.W
    rmse_meas = float(jnp.sqrt(jnp.mean((Z[w:] - X_true[w:]) ** 2)))
    rmse_mhe = float(jnp.sqrt(jnp.mean((X_hat[w:] - X_true[w:]) ** 2)))
    # the smoother must beat the raw sensor by a clear margin
    assert rmse_mhe < 0.6 * rmse_meas


def test_mhe_recovers_unmeasured_vy():
    """vy is not measured at all; the dynamics fusion must reconstruct it."""
    T = 80
    U = drive_inputs(T)
    x0 = jnp.array([1.5, 0.0, 0.0, 0.0, 0.0, 0.0])
    X_true = simulate_truth(x0, U)
    # measure (vx, wz, e_psi, s, e_y) — drop vy (index 1)
    H = jnp.eye(NX)[jnp.array([0, 2, 3, 4, 5])]
    sigma = jnp.array([0.02, 0.02, 0.01, 0.01, 0.01])
    Z = X_true @ H.T + sigma * jax.random.normal(
        jax.random.PRNGKey(1), (T, 5)
    )
    mcfg = MHEConfig(W=8, n_gn=2)
    X_hat = run_filter(
        mcfg, H, Qw=1e-4 * jnp.eye(NX), Rv=jnp.diag(sigma**2),
        P0=0.1 * jnp.eye(NX), Z=Z, U=U, x0_guess=x0,
    )
    w = 2 * mcfg.W
    vy_err = float(jnp.abs(X_hat[w:, 1] - X_true[w:, 1]).max())
    vy_scale = float(jnp.abs(X_true[w:, 1]).max())
    assert vy_scale > 0.005  # the maneuver actually excites vy
    assert vy_err < 0.5 * vy_scale + 0.01


def test_mhe_poor_initial_guess_converges():
    """MHE recovers from a biased cold start within ~W steps (the EKF-vs-MHE
    transient-robustness argument)."""
    T = 40
    U = drive_inputs(T)
    x0 = jnp.array([1.2, 0.0, 0.0, 0.0, 0.0, 0.05])
    X_true = simulate_truth(x0, U)
    H = jnp.eye(NX)
    Z = X_true @ H.T
    x0_bad = x0 + jnp.array([0.4, 0.05, 0.1, 0.05, 0.0, -0.15])
    mcfg = MHEConfig(W=6, n_gn=2)
    X_hat = run_filter(
        mcfg, H, Qw=1e-3 * jnp.eye(NX), Rv=1e-5 * jnp.eye(NX),
        P0=0.5 * jnp.eye(NX), Z=Z, U=U, x0_guess=x0_bad,
    )
    err_late = np.abs(np.asarray(X_hat[2 * mcfg.W:]) - np.asarray(X_true[2 * mcfg.W:])).max()
    assert err_late < 5e-3


def test_mhe_single_s_outlier_does_not_wrap_subsequent_laps():
    """One outlier s measurement (error > L/2) must NOT poison the unwrap
    reference: the reference is the smoothed estimate H @ X_est[-1], not
    the previous raw measurement (round-2 advisor finding, loop/mhe.py).
    With a raw-measurement reference, every measurement AFTER the outlier
    would be wrapped onto the wrong lap (s error ~ L forever)."""
    track = oval_track()
    L = float(track.length)
    T = 60
    U = drive_inputs(T)
    x0 = jnp.array([1.2, 0.0, 0.0, 0.0, 0.0, 0.05])
    X_true = simulate_truth(x0, U)
    H = jnp.eye(NX)
    Z = X_true @ H.T
    # one corrupted s sample mid-run, off by 0.6 L (> L/2)
    k = 25
    Z = Z.at[k, 4].add(0.6 * L)
    mcfg = MHEConfig(W=6, n_gn=2)
    X_hat = run_filter(
        mcfg, H, Qw=1e-4 * jnp.eye(NX), Rv=1e-4 * jnp.eye(NX),
        P0=0.1 * jnp.eye(NX), Z=Z, U=U, x0_guess=x0,
    )
    s_err = np.abs(np.asarray(X_hat[:, 4]) - np.asarray(X_true[:, 4]))
    # transient while the outlier is inside the window is allowed, but the
    # estimate must stay on the CORRECT lap throughout...
    assert s_err.max() < L / 4, s_err.max()
    # ...and once the outlier leaves the window, full accuracy returns
    assert s_err[k + mcfg.W + 2:].max() < 5e-3, s_err[k + mcfg.W + 2:].max()
