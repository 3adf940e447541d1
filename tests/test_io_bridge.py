"""Native IO bridge (native/io_bridge.cpp + io/): seqlock integrity under
concurrent writes, UDP freshest-frame semantics, and a REAL two-process
hardware-in-the-loop run — plant simulator in a child process, controller
in this one, closed loop entirely through the shm bridge (ROADMAP
"real-car IO bridge"; SURVEY.md §3.1's 30 Hz deployment loop)."""

import json
import os
import subprocess
import sys
import threading
import time

import numpy as np
import pytest

from autonomous_racing_lpv_mpp_mpc_tpu.io import bridge_available

pytestmark = pytest.mark.skipif(
    not bridge_available(), reason="native io bridge not buildable")


def test_seqlock_survives_concurrent_writes():
    """Writer thread spams frames whose 8 lanes all equal the frame number;
    any torn read would surface as a non-uniform payload."""
    from autonomous_racing_lpv_mpp_mpc_tpu.io import CarBridge

    with CarBridge("/arl_test_seqlock", create=True) as w, \
            CarBridge("/arl_test_seqlock") as r:
        stop = threading.Event()

        def writer():
            k = 0
            while not stop.is_set():
                k += 1
                w.write_state(float(k), np.full(8, float(k), np.float32))

        th = threading.Thread(target=writer, daemon=True)
        th.start()
        reads = torn = 0
        t_end = time.monotonic() + 1.0
        last = 0
        while time.monotonic() < t_end:
            cnt, t, x = r.read_state(8)
            if cnt <= 0:
                continue
            reads += 1
            if not np.all(x == x[0]):
                torn += 1
            last = max(last, cnt)
        stop.set()
        th.join(timeout=2.0)
        assert reads > 100
        assert torn == 0, f"{torn}/{reads} torn reads"
        assert last > 100  # writer actually progressed


def test_udp_latest_frame_wins():
    from autonomous_racing_lpv_mpp_mpc_tpu.io import UDPLink

    with UDPLink(0 if False else 47311) as rx, UDPLink(47312) as tx:
        # out-of-order counts: the drain must keep the NEWEST frame
        for count, val in ((1, 10.0), (3, 30.0), (2, 20.0)):
            assert tx.send("127.0.0.1", 47311, count, float(count),
                           np.full(4, val, np.float32))
        time.sleep(0.05)
        cnt, t, data = rx.recv_latest(4)
        assert cnt == 3
        assert t == 3.0
        assert np.all(data == 30.0)
        # drained: a second read reports empty
        cnt, _, _ = rx.recv_latest(4)
        assert cnt == -1


def test_two_process_hardware_in_the_loop():
    """Child = plant simulator publishing states on the shm bridge;
    parent = jitted warm-started MPC consuming them. The car must track
    (e_y decays from 0.1 m), every frame must be consumed exactly once
    (lockstep), and the final child state must equal the last state the
    controller would predict — the loop really closed over the bridge."""
    import jax.numpy as jnp

    from autonomous_racing_lpv_mpp_mpc_tpu.core import (
        MPCConfig,
        SolverConfig,
        VehicleParams,
    )
    from autonomous_racing_lpv_mpp_mpc_tpu.io import (
        CarBridge,
        realtime_tracking_loop,
    )
    from autonomous_racing_lpv_mpp_mpc_tpu.loop import constant_refs
    from autonomous_racing_lpv_mpp_mpc_tpu.track import oval_track

    T = 60
    name = f"/arl_test_hil_{os.getpid()}"
    worker = os.path.join(os.path.dirname(__file__), "_car_worker.py")
    child = subprocess.Popen(
        [sys.executable, worker, name, str(T)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    try:
        # the child owns the segment; poll-open it
        br = None
        t_end = time.monotonic() + 60.0
        while br is None:
            try:
                br = CarBridge(name)
            except Exception:
                if time.monotonic() > t_end:
                    raise
                time.sleep(0.05)

        p = VehicleParams()
        cfg = MPCConfig(N=10, model="dynamic")
        scfg = SolverConfig(max_iter=30, rho_interval=10)
        log = realtime_tracking_loop(
            p, cfg, scfg, oval_track(), constant_refs(cfg, 1.5), br, T)
        br.close()
        out, err = child.communicate(timeout=60)
        assert child.returncode == 0, err[-2000:]
    finally:
        if child.poll() is None:
            child.kill()
            child.communicate()

    x_final = np.asarray(json.loads(out.strip().splitlines()[-1])["x_final"])
    # lockstep: frame counts are exactly 1..T (no drops, no reuse)
    assert np.array_equal(log.frame_counts, np.arange(1, T + 1))
    # car accelerated toward the 1.5 m/s reference and converged
    assert x_final[0] > 1.2
    assert float(np.mean(log.converged)) > 0.9

    # the loop over the bridge must reproduce the in-process closed loop:
    # same plant, same MPC, lockstep timing -> same trajectory
    from autonomous_racing_lpv_mpp_mpc_tpu.loop import closed_loop

    ref = closed_loop(p, cfg, scfg, oval_track(),
                      jnp.array([1.0, 0.0, 0.0, 0.0, 0.0, 0.1]),
                      constant_refs(cfg, 1.5), T=T)
    np.testing.assert_allclose(x_final, np.asarray(ref.X[-1]),
                               rtol=0, atol=1e-3)
    np.testing.assert_allclose(log.U, np.asarray(ref.U), rtol=0, atol=1e-3)


def test_udp_lockstep_loop_matches_shm_semantics():
    """Off-host deployment shape: the same realtime_tracking_loop +
    lockstep_car pair runs over the UDP transport (car thread, controller
    main thread) and must reproduce the in-process closed loop."""
    import jax.numpy as jnp

    from autonomous_racing_lpv_mpp_mpc_tpu.core import (
        MPCConfig,
        SolverConfig,
        VehicleParams,
    )
    from autonomous_racing_lpv_mpp_mpc_tpu.io import (
        UDPBridge,
        lockstep_car,
        realtime_tracking_loop,
    )
    from autonomous_racing_lpv_mpp_mpc_tpu.loop import (
        closed_loop,
        constant_refs,
    )
    from autonomous_racing_lpv_mpp_mpc_tpu.track import oval_track

    T = 40
    p = VehicleParams()
    cfg = MPCConfig(N=10, model="dynamic")
    scfg = SolverConfig(max_iter=30, rho_interval=10)
    track = oval_track()
    x0 = jnp.array([1.0, 0.0, 0.0, 0.0, 0.0, 0.1])
    x_ref = constant_refs(cfg, 1.5)

    sp, cp = 47421, 47422
    result = {}

    def car():
        with UDPBridge("car", state_port=sp, control_port=cp) as br:
            result["x_final"] = lockstep_car(
                "", p, cfg, track, x0, T, bridge=br)

    th = threading.Thread(target=car, daemon=True)
    ctrl = UDPBridge("controller", state_port=sp, control_port=cp)
    th.start()
    try:
        log = realtime_tracking_loop(p, cfg, scfg, track, x_ref, ctrl, T)
    finally:
        ctrl.close()
        th.join(timeout=60)
    assert not th.is_alive()
    assert np.array_equal(log.frame_counts, np.arange(1, T + 1))

    ref = closed_loop(p, cfg, scfg, track, x0, x_ref, T=T)
    np.testing.assert_allclose(result["x_final"], np.asarray(ref.X[-1]),
                               rtol=0, atol=1e-3)
    np.testing.assert_allclose(log.U, np.asarray(ref.U), rtol=0, atol=1e-3)


def test_hil_noisy_sensors_ekf_beats_raw():
    """Deployment-with-estimator HIL (VERDICT r3 next #8): the lockstep car
    publishes NOISY + GLITCHY sensor frames (white noise plus periodic
    camera-misdetection jumps on e_psi/e_y) while integrating its true
    state; the controller runs once raw and once with the gated EKF in the
    chain. Asserts, against the car's ground-truth trajectory:

    - the EKF's fed-to-MPC state estimates beat the raw frames decisively
      on the glitched channels (the estimator's job);
    - BOTH runs still track (the warm-started MPC's rate penalties make it
      robust to raw one-frame spikes — measured r4, an honest finding: on
      closed-loop e_y RMS alone raw and filtered are statistically tied,
      because ungated filtering SPREADS impulses and gated filtering
      restores clean-sensor behavior; the estimator's decisive win is
      estimate quality, which is what downstream consumers — planner
      replans, friction RLS, lap learning — actually consume)."""
    from autonomous_racing_lpv_mpp_mpc_tpu.core import (
        MPCConfig,
        SolverConfig,
        VehicleParams,
    )
    from autonomous_racing_lpv_mpp_mpc_tpu.io import (
        CarBridge,
        realtime_tracking_loop,
    )
    from autonomous_racing_lpv_mpp_mpc_tpu.loop import constant_refs
    from autonomous_racing_lpv_mpp_mpc_tpu.track import oval_track
    from tests._car_worker import NOISE_SIGMA

    T = 120
    worker = os.path.join(os.path.dirname(__file__), "_car_worker.py")
    p = VehicleParams()
    cfg = MPCConfig(N=10, model="dynamic")
    scfg = SolverConfig(max_iter=30, rho_interval=10)

    def one_run(tag, use_ekf):
        name = f"/arl_test_hiln_{tag}_{os.getpid()}"
        child = subprocess.Popen(
            [sys.executable, worker, name, str(T), "shm", "noise"],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env={**os.environ, "JAX_PLATFORMS": "cpu"},
        )
        try:
            br = None
            t_end = time.monotonic() + 60.0
            while br is None:
                try:
                    br = CarBridge(name)
                except Exception:
                    if time.monotonic() > t_end:
                        raise
                    time.sleep(0.05)
            log = realtime_tracking_loop(
                p, cfg, scfg, oval_track(), constant_refs(cfg, 1.5), br, T,
                use_ekf=use_ekf,
                ekf_r=np.asarray(NOISE_SIGMA) ** 2,
            )
            br.close()
            out, err = child.communicate(timeout=120)
            assert child.returncode == 0, err[-2000:]
        finally:
            if child.poll() is None:
                child.kill()
                child.communicate()
        res = json.loads(out.strip().splitlines()[-1])
        return res, log

    raw, log_raw = one_run("raw", use_ekf=False)
    ekf, log_ekf = one_run("ekf", use_ekf=True)
    # both runs complete the lockstep protocol, accelerate, and track
    for res, log in ((raw, log_raw), (ekf, log_ekf)):
        assert np.array_equal(log.frame_counts, np.arange(1, T + 1))
        assert res["x_final"][0] > 1.2
        assert res["ey_rms_true"] < 0.12, res

    # estimate quality vs ground truth: X_est[k] estimates the state the
    # car PUBLISHED at frame k = true state after step k-1 (traj_true[k-1];
    # frame 0 is the initial state, which traj_true does not include)
    def est_rms(res, log, i):
        truth = np.asarray(res["traj_true"], np.float32)[: T - 1, i]
        return np.sqrt(np.mean((log.X_est[1:, i] - truth) ** 2))

    for i in (3, 5):   # the glitched channels (e_psi, e_y)
        e_ekf, e_raw = est_rms(ekf, log_ekf, i), est_rms(raw, log_raw, i)
        assert e_ekf < 0.5 * e_raw, (i, e_ekf, e_raw)
