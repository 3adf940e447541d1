"""Real-time tracking loop over the IO bridge: the deployment shape.

Reference parity: the reference's real-car loop (SURVEY.md §3.1 at 30 Hz —
estimate -> solve -> apply) with the ROS layer replaced by the native
shared-memory bridge. The controller process holds the jitted single-solve
MPC (compiled once, warm-started across frames); the car process — real
hardware or the lockstep plant simulator below — publishes states and
consumes controls.

Two timing modes:

- free-running (``lockstep=False``): the controller waits for a FRESH state
  frame, solves, publishes; a real car integrates continuously. Deadline
  misses (solve wall time > dt) are counted per frame.
- lockstep (``lockstep=True`` on the car side): the car blocks until the
  control frame matching its state frame arrives before integrating. This
  makes hardware-in-the-loop runs bit-deterministic — CI asserts closed-loop
  behavior through the REAL bridge path without wall-clock flakiness.
"""

from __future__ import annotations

import time
from typing import NamedTuple, Optional

import numpy as np

from ..core.config import MPCConfig, SolverConfig, VehicleParams
from ..models import model_nx
from ..track.track import Track
from .bridge import CarBridge, monotonic

NU = 2


class RealtimeLog(NamedTuple):
    X: np.ndarray            # (T, nx) states as received (raw frames)
    U: np.ndarray            # (T, nu) controls as published
    solve_s: np.ndarray      # (T,) per-frame solve wall time
    missed: np.ndarray       # (T,) solve exceeded the deadline
    frame_counts: np.ndarray  # (T,) state frame numbers consumed
    converged: np.ndarray    # (T,)
    X_est: np.ndarray = None  # (T, nx) states actually FED to the MPC
    #                           (== X when use_ekf=False)


def realtime_tracking_loop(
    p: VehicleParams,
    cfg: MPCConfig,
    scfg: SolverConfig,
    track: Track,
    x_ref,
    bridge: CarBridge,
    T: int,
    deadline_s: Optional[float] = None,
    timeout_s: float = 30.0,
    poll_s: float = 2e-4,
    use_ekf: bool = False,
    ekf_q=None,              # (nx,) process-noise variance per state
    ekf_r=None,              # (nx,) measurement-noise variance per state
    ekf_gate_sigma: float = 3.0,   # innovation gate (sensor-glitch reject)
) -> RealtimeLog:
    """Run ``T`` control frames against a car publishing on ``bridge``.

    Per frame: block (poll) until a state frame NEWER than the last consumed
    one appears, solve the warm-started MPC, publish the control stamped
    with the consumed frame's count + 1 (the lockstep handshake key). The
    jitted step is compiled before the first frame so compilation never
    eats the first deadline.

    ``use_ekf=True`` filters each received frame through the EKF
    (loop/estimator.py) before the solve — the deployment shape with a real
    observer in the chain (SURVEY.md §3.1: the reference's real-car loop is
    estimate -> solve -> apply; raw sensor frames are NOT the estimate).
    ``ekf_r`` should match the car's sensor noise; ``ekf_q`` defaults to
    the model-mismatch-aware split used by loop/race.py.
    """
    import jax
    import jax.numpy as jnp
    import numpy as _np

    from ..loop.estimator import DEFAULT_EKF_Q, ekf_init, ekf_step
    from ..loop.mpc import mpc_init, mpc_step

    nx = model_nx(cfg.model)
    deadline = float(deadline_s if deadline_s is not None else cfg.dt)
    if ekf_q is None:
        ekf_q = (_np.asarray(DEFAULT_EKF_Q) if nx == 6
                 else _np.full(nx, 1e-3))
    if ekf_r is None:
        ekf_r = _np.full(nx, 1e-4)
    Qn = jnp.diag(jnp.asarray(ekf_q, jnp.float32))
    Rn = jnp.diag(jnp.asarray(ekf_r, jnp.float32))

    @jax.jit
    def step(x, carry):
        u, carry2, diag = mpc_step(p, cfg, scfg, track, x, x_ref, carry)
        return u, carry2, diag.converged

    @jax.jit
    def filt(ekf, u_prev, z):
        return ekf_step(p, cfg, track, ekf, u_prev, z, Qn, Rn,
                        gate_sigma=ekf_gate_sigma)

    # wait for the car's first state frame, then warm the executable
    t_end = monotonic() + timeout_s
    while True:
        cnt, t_frame, x_np = bridge.read_state(nx)
        if cnt > 0:
            break
        if monotonic() > t_end:
            raise TimeoutError("no state frame from the car")
        time.sleep(poll_s)
    carry = mpc_init(p, cfg, track, jnp.asarray(x_np))
    ekf = ekf_init(jnp.asarray(x_np, jnp.float32))
    u_prev = jnp.zeros(NU, jnp.float32)
    # compile-warm the executables; DISCARD the result carry so frame 0
    # solves from the pristine warm start (bit-parity with closed_loop)
    u, _carry_warm, _ = step(jnp.asarray(x_np), carry)
    u.block_until_ready()
    if use_ekf:
        filt(ekf, u_prev, jnp.asarray(x_np)).x.block_until_ready()

    X = np.zeros((T, nx), np.float32)
    X_est = np.zeros((T, nx), np.float32)
    U = np.zeros((T, NU), np.float32)
    solve_s = np.zeros(T, np.float32)
    missed = np.zeros(T, bool)
    counts = np.zeros(T, np.int64)
    conv = np.zeros(T, bool)

    last = 0
    for k in range(T):
        t_end = monotonic() + timeout_s
        while True:
            cnt, t_frame, x_np = bridge.read_state(nx)
            if cnt > last:
                break
            if monotonic() > t_end:
                raise TimeoutError(f"car stopped publishing at frame {k}")
            time.sleep(poll_s)
        last = cnt

        t0 = monotonic()
        x_in = jnp.asarray(x_np)
        if use_ekf:
            ekf = filt(ekf, u_prev, x_in)
            x_in = ekf.x
        u, carry, ok = step(x_in, carry)
        u_np = np.asarray(u, np.float32)
        u_prev = u
        dt_solve = monotonic() - t0

        bridge.write_control(t_frame, u_np)
        X[k], U[k] = x_np, u_np
        X_est[k] = np.asarray(x_in, np.float32)
        solve_s[k] = dt_solve
        missed[k] = dt_solve > deadline
        counts[k] = cnt
        conv[k] = bool(ok)
    return RealtimeLog(X, U, solve_s, missed, counts, conv, X_est)


def lockstep_car(
    bridge_name: str,
    p: VehicleParams,
    cfg: MPCConfig,
    track: Track,
    x0,
    T: int,
    sim_tire: Optional[str] = None,
    timeout_s: float = 60.0,
    poll_s: float = 2e-4,
    bridge=None,
    noise_sigma=None,
    noise_seed: int = 0,
    return_traj: bool = False,
) -> np.ndarray:
    """Plant-simulator car process: creates the bridge, publishes state
    frame k, BLOCKS until control frame k arrives, integrates, repeats.
    Returns the final state. Run this in a separate process (it owns the
    shm segment); the controller side runs :func:`realtime_tracking_loop`.
    Pass ``bridge`` (e.g. a car-role :class:`..bridge.UDPBridge`) to use a
    transport other than the default shm segment named ``bridge_name``.

    ``noise_sigma`` ((nx,) per-state sigma) simulates real sensors: the
    PUBLISHED frame is the true state plus Gaussian noise (deterministic in
    ``noise_seed`` for lockstep reproducibility) while the plant integrates
    the true state — the controller side should then filter
    (``realtime_tracking_loop(use_ekf=True)``). ``return_traj=True``
    returns the (T, nx) TRUE trajectory instead of just the final state,
    so tests can score true tracking performance under sensor noise.
    """
    import jax
    import jax.numpy as jnp

    from ..loop.closed_loop import plant_step

    step = jax.jit(lambda x, u: plant_step(p, cfg, track, x, u,
                                           sim_tire=sim_tire))
    x = jnp.asarray(x0, jnp.float32)
    _ = step(x, jnp.zeros(NU)).block_until_ready()
    rng = np.random.default_rng(noise_seed)
    traj = []

    def published(x_true):
        z = np.asarray(x_true, np.float32)
        if noise_sigma is not None:
            z = z + (rng.standard_normal(z.shape)
                     * np.asarray(noise_sigma)).astype(np.float32)
        return z

    with (bridge if bridge is not None
          else CarBridge(bridge_name, create=True)) as br:
        for k in range(T):
            br.write_state(monotonic(), published(x))
            t_end = monotonic() + timeout_s
            while True:
                cnt, _t, u_np = br.read_control(NU)
                if cnt > k:
                    break
                if monotonic() > t_end:
                    raise TimeoutError(f"no control for frame {k + 1}")
                time.sleep(poll_s)
            x = step(x, jnp.asarray(u_np))
            if return_traj:
                traj.append(np.asarray(x))
        x_final = np.asarray(x)
        # hold the final frame so the controller's last read never races
        # the segment teardown
        br.write_state(monotonic(), published(x_final))
        time.sleep(0.2)
    return np.stack(traj) if return_traj else x_final
