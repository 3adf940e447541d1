"""State estimation (SURVEY.md §2 "State estimator").

Reference parity: in simulation the estimator is a pass-through of the
simulator state, optionally with measurement noise; the real-car lineage
carries an EKF over IMU + encoder measurements. Both are provided:

- ``passthrough`` / ``noisy_measurement``: the sim-loop behavior.
- ``EKF``: discrete extended Kalman filter over the nonlinear Frenet
  bicycle model, using the exact JAX Jacobian of the plant step. Pure
  functions over an :class:`EKFState` pytree — jit/vmap/scan friendly.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..core.config import MPCConfig, VehicleParams
from ..models import f_model, model_nx
from ..track.track import Track, curvature_at


# model-mismatch-aware process-noise default for the dynamic (nx=6) model:
# the velocity channels carry the force-model error (unknown mu scales the
# tire forces -> vy_dot/wz_dot bias), so they get ~10x the variance of the
# kinematic pose channels. Measured r4: a uniformly-confident Q made the
# EKF trust the wrong-mu yaw model enough to DEGRADE wz below the raw
# measurement. Shared by loop/race.py and io/realtime.py.
DEFAULT_EKF_Q = (1e-3, 1e-3, 5e-3, 1e-4, 1e-4, 1e-4)


def passthrough(x: jnp.ndarray) -> jnp.ndarray:
    return x


def noisy_measurement(key, x: jnp.ndarray, sigma: jnp.ndarray) -> jnp.ndarray:
    """Simulated sensor: state + Gaussian noise with per-state sigma."""
    return x + sigma * jax.random.normal(key, x.shape, x.dtype)


class EKFState(NamedTuple):
    x: jnp.ndarray    # (nx,) mean
    P: jnp.ndarray    # (nx, nx) covariance


def ekf_init(x0: jnp.ndarray, p0: float = 0.1) -> EKFState:
    n = x0.shape[0]
    return EKFState(x=x0, P=p0 * jnp.eye(n, dtype=x0.dtype))


def ekf_step(
    p: VehicleParams,
    cfg: MPCConfig,
    track: Track,
    st: EKFState,
    u: jnp.ndarray,
    z: jnp.ndarray,              # measurement (H @ x_true + noise)
    Q: jnp.ndarray,              # (nx, nx) process noise cov
    R: jnp.ndarray,              # (m, m) measurement noise cov
    H: Optional[jnp.ndarray] = None,   # (m, nx) measurement matrix; default I
    n_sub: int = 4,
    gate_sigma: float = 0.0,           # >0: per-channel innovation gate
) -> EKFState:
    """One predict+update cycle at the control period.

    The predict integrates the plant model at ``dt / n_sub`` (fine Euler,
    same scheme as the plant itself): the lateral dynamics' time constant
    (~m·vx/(Cf+Cr), ~25 ms for the 1:10 car) is SHORTER than the 33 ms
    control period, so a single Euler step is badly damped and the filter
    would inject model error every frame (measured r4: single-step predict
    made the EKF *worse* than raw measurements in the HIL loop). The
    Jacobian is ``jacfwd`` of the full sub-stepped map.

    ``gate_sigma > 0`` enables per-channel innovation gating (standard
    sensor-glitch rejection): a measurement channel whose innovation
    exceeds ``gate_sigma * sqrt(S_ii)`` has its R inflated so it barely
    updates that cycle. Without it a one-frame camera misdetection is
    SPREAD by the filter over the next several frames — measured r4: the
    MPC's rate penalties shrug off a one-frame raw spike, but react to
    the filter's multi-frame smeared version, so an ungated EKF was worse
    than raw feeding under impulsive glitches.
    """
    nx = model_nx(cfg.model)
    s_idx = 4 if cfg.model == "dynamic" else 2
    if H is None:
        H = jnp.eye(nx, dtype=st.x.dtype)
    h = cfg.dt / n_sub

    def step_fn(x):
        def sub(x_i, _):
            kap = curvature_at(track, x_i[s_idx])
            return x_i + h * f_model(p, x_i, u, kap, cfg.model, cfg.tire), None

        x_out, _ = jax.lax.scan(sub, x, None, length=n_sub)
        return x_out

    # predict: exact Jacobian of the discrete step by jacfwd
    F = jax.jacfwd(step_fn)(st.x)
    x_pred = step_fn(st.x)
    P_pred = F @ st.P @ F.T + Q

    # update (with optional innovation gating)
    nu = z - H @ x_pred
    if gate_sigma > 0.0:
        S0 = H @ P_pred @ H.T + R
        outlier = jnp.abs(nu) > gate_sigma * jnp.sqrt(jnp.diag(S0))
        R = R + jnp.diag(jnp.where(outlier, 1e6 * jnp.diag(S0), 0.0))
    S = H @ P_pred @ H.T + R
    K = jnp.linalg.solve(S.T, (P_pred @ H.T).T).T
    x_new = x_pred + K @ nu
    P_new = (jnp.eye(nx, dtype=st.x.dtype) - K @ H) @ P_pred
    return EKFState(x=x_new, P=0.5 * (P_new + P_new.T))
