"""Moving-horizon estimation (MHE) over the LPV bicycle model.

Alternative to the EKF (loop/estimator.py) for the reference lineage's
state-estimation role (SURVEY.md §2 "State estimator"): instead of one
linearization per step, MHE solves a small smoothing problem over a sliding
window of the last W measurements — robust to transients and to poor
priors, and the natural home for the sequentially-linearized LPV updates of
PAPERS.md ("LPV Updates for Sequentially Linearized Moving Horizon
Estimation": re-evaluating A(theta) along the estimate trajectory instead
of re-deriving Jacobians).

TPU-native design: MHE *is* an LQR problem in the process noise. Over the
window,

    min  ||x_start - x_prior||^2_{P0^-1}
       + sum_j ||w_j||^2_{Qw^-1} + sum_j ||z_j - H x_j||^2_{Rv^-1}
    s.t. x_{j+1} = A_j x_j + (B_j u_j + c_j) + w_j

is exactly the equality-constrained QP the Riccati sweep factorizes
(solver/riccati.py), with the process noise w as the "control": B_lqr = I,
R_lqr = Qw^-1, Q_lqr = H'Rv^-1 H, q_lqr = -H'Rv^-1 z. The arrival cost is a
virtual leading stage x_1 = x_0 + w_0 with x_0 = x_prior fixed and
R_0 = P0^-1. Each Gauss-Newton pass re-evaluates the scheduled stage
matrices along the current estimate (the LPV update) and re-solves — a
fixed small number of Riccati sweeps, fully inside jit, vmappable across a
scenario batch.

Caveat: the s (arc-length) component is treated as unwrapped within a
window; windows spanning the start/finish line need the caller to unwrap
measurements (W*dt*v is ~10 cm of track — wraps are a per-lap event).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from ..core.config import MPCConfig, VehicleParams
from ..engine.assembly import scheduled_stages
from ..models import model_nx
from ..solver.riccati import LQRCost, LQRDynamics, lqr_solve
from ..track.track import Track


@struct.dataclass
class MHEConfig:
    W: int = struct.field(pytree_node=False, default=8)      # window length
    n_gn: int = struct.field(pytree_node=False, default=2)   # Gauss-Newton passes
    riccati: str = struct.field(pytree_node=False, default="scan")


def mhe_solve(
    p: VehicleParams,
    cfg: MPCConfig,
    mcfg: MHEConfig,
    track: Track,
    z_hist: jnp.ndarray,       # (W+1, m) measurements, oldest first
    u_hist: jnp.ndarray,       # (W, nu) applied inputs between them
    X_guess: jnp.ndarray,      # (W+1, nx) linearization trajectory
    x_prior: jnp.ndarray,      # (nx,) arrival mean
    P0: jnp.ndarray,           # (nx, nx) arrival covariance
    H: jnp.ndarray,            # (m, nx) measurement matrix
    Qw: jnp.ndarray,           # (nx, nx) process-noise covariance
    Rv: jnp.ndarray,           # (m, m) measurement-noise covariance
) -> jnp.ndarray:
    """Solve one MHE window; returns the smoothed trajectory (W+1, nx)."""
    W = mcfg.W
    nx = model_nx(cfg.model)
    f = z_hist.dtype
    I = jnp.eye(nx, dtype=f)

    P0_inv = jnp.linalg.inv(P0)
    Qw_inv = jnp.linalg.inv(Qw)
    Rv_inv = jnp.linalg.inv(Rv)
    HtRH = H.T @ Rv_inv @ H
    q_meas = -(z_hist @ Rv_inv @ H)              # (W+1, nx)

    # LQR cost over horizon N = W+1 (stage 0 = virtual arrival stage)
    Q = jnp.concatenate([jnp.zeros((1, nx, nx), f),
                         jnp.broadcast_to(HtRH, (W + 1, nx, nx))])
    qlin = jnp.concatenate([jnp.zeros((1, nx), f), q_meas])
    R = jnp.concatenate([P0_inv[None],
                         jnp.broadcast_to(Qw_inv, (W, nx, nx))])
    cost = LQRCost(
        Q=Q, q=qlin, R=R, r=jnp.zeros((W + 1, nx), f),
        M=jnp.zeros((W + 1, nx, nx), f),
    )
    B_noise = jnp.broadcast_to(I, (W + 1, nx, nx))

    def gn_pass(X_est, _):
        # LPV/LTV stage matrices along the current estimate (the
        # "sequentially linearized LPV update")
        Ad, Bd, cd = scheduled_stages(p, cfg, track, X_est, u_hist)
        c_eff = jnp.einsum("kij,kj->ki", Bd, u_hist) + cd
        A = jnp.concatenate([I[None], Ad])
        c = jnp.concatenate([jnp.zeros((1, nx), f), c_eff])
        dyn = LQRDynamics(A=A, B=B_noise, c=c)
        X, _ = lqr_solve(dyn, cost, x_prior, mcfg.riccati)
        return X[1:], None                        # drop the virtual stage

    X_est, _ = jax.lax.scan(gn_pass, X_guess, None, length=mcfg.n_gn)
    return X_est


class MHEState(NamedTuple):
    z_hist: jnp.ndarray     # (W+1, m) rolling measurements
    u_hist: jnp.ndarray     # (W, nu) rolling inputs
    X_est: jnp.ndarray      # (W+1, nx) last smoothed trajectory
    x_prior: jnp.ndarray    # (nx,) arrival mean for the next window


def mhe_init(cfg: MPCConfig, mcfg: MHEConfig, x0: jnp.ndarray,
             H: jnp.ndarray, nu: int = 2) -> MHEState:
    """Cold start: the window is filled as if the car sat at x0; estimates
    are trustworthy after the first W steps."""
    W = mcfg.W
    z0 = H @ x0
    return MHEState(
        z_hist=jnp.broadcast_to(z0, (W + 1,) + z0.shape),
        u_hist=jnp.zeros((W, nu), x0.dtype),
        X_est=jnp.broadcast_to(x0, (W + 1,) + x0.shape),
        x_prior=x0,
    )


def mhe_step(
    p: VehicleParams,
    cfg: MPCConfig,
    mcfg: MHEConfig,
    track: Track,
    st: MHEState,
    u: jnp.ndarray,            # input applied since the last measurement
    z: jnp.ndarray,            # new measurement
    P0: jnp.ndarray,
    H: jnp.ndarray,
    Qw: jnp.ndarray,
    Rv: jnp.ndarray,
) -> Tuple[MHEState, jnp.ndarray]:
    """Receding-horizon filter update; returns (state, x_hat at time t).

    The arrival prior for the shifted window is the previous window's
    smoothed estimate of its second state (the standard smoothed-arrival
    approximation; P0 held fixed as a tuning matrix). Fully jittable —
    run it inside ``lax.scan`` for whole-lap estimation.
    """
    # unwrap any measured arc-length components against the window so a
    # start/finish-line crossing (wrapped s jumping by ~-L) cannot corrupt
    # the whole window: rows of H that read s (state index s_idx) identify
    # which measurement components carry s.
    s_idx = 4 if cfg.model == "dynamic" else 2
    measures_s = jnp.abs(H[:, s_idx]) > 0.5          # (m,) static-shape mask
    # unwrap against the SMOOTHED estimate (H @ X_est[-1]), not the previous
    # raw measurement: one outlier s measurement (error > L/2) in z_hist
    # would otherwise corrupt the reference and wrap every subsequent
    # measurement onto the wrong lap (round-2 advisor finding).
    ref = H @ st.X_est[-1]
    L = track.length
    z_un = z + L * jnp.round((ref - z) / L)
    z = jnp.where(measures_s, z_un, z)
    z_hist = jnp.roll(st.z_hist, -1, axis=0).at[-1].set(z)
    u_hist = jnp.roll(st.u_hist, -1, axis=0).at[-1].set(u)
    x_prior = st.X_est[1]
    # shifted warm start: previous smoothed trajectory, last state propagated
    X_guess = jnp.roll(st.X_est, -1, axis=0).at[-1].set(st.X_est[-1])
    X_est = mhe_solve(p, cfg, mcfg, track, z_hist, u_hist, X_guess,
                      x_prior, P0, H, Qw, Rv)
    return MHEState(z_hist, u_hist, X_est, x_prior), X_est[-1]
