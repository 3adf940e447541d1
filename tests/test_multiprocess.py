"""Multi-process runtime test (VERDICT r1 missing #4 / SURVEY.md §5
"Distributed communication backend"): two REAL OS processes form a JAX
distributed runtime over localhost (the CI stand-in for a pod's DCN),
drive ``multihost_init`` + a mesh spanning both processes, and the psum'd
sweep metrics must (a) agree between the processes and (b) equal the
single-process fake-8 run of the same sweep."""

import os
import socket
import subprocess
import sys

import jax
import numpy as np
import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "_mp_worker.py")


@pytest.mark.slow
def test_two_process_mesh_matches_single_process():
    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update(
            XLA_FLAGS="--xla_force_host_platform_device_count=4",
            JAX_COORDINATOR_ADDRESS=f"localhost:{port}",
            JAX_NUM_PROCESSES="2",
            JAX_PROCESS_ID=str(pid),
            PYTHONPATH=REPO,
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, WORKER],
                env=env,
                cwd=REPO,
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
                text=True,
            )
        )
    outs = []
    for pr in procs:
        out, err = pr.communicate(timeout=420)
        assert pr.returncode == 0, f"worker failed:\n{out}\n{err}"
        lines = [ln for ln in out.splitlines() if ln.startswith("MPOK")]
        assert lines, f"no MPOK line:\n{out}\n{err}"
        outs.append(lines[0].split()[1:])

    # both processes saw the same replicated psum'd metrics
    assert outs[0] == outs[1], outs
    n, conv, ey, prog = (float(v) for v in outs[0])
    assert n == 8.0

    # single-process fake-8 reference of the SAME sweep
    from autonomous_racing_lpv_mpp_mpc_tpu.core import (
        MPCConfig,
        SolverConfig,
        VehicleParams,
    )
    from autonomous_racing_lpv_mpp_mpc_tpu.loop import constant_refs
    from autonomous_racing_lpv_mpp_mpc_tpu.parallel import make_mesh
    from autonomous_racing_lpv_mpp_mpc_tpu.parallel.scenarios import (
        make_scenario_grid,
        sharded_closed_loop,
    )
    from autonomous_racing_lpv_mpp_mpc_tpu.track import oval_track

    p = VehicleParams()
    cfg = MPCConfig(N=8, model="dynamic")
    scfg = SolverConfig(max_iter=15, rho_interval=0)
    track = oval_track()
    scen = make_scenario_grid(p, cfg, n_ey=8, n_mu=1, vx0=1.0)
    _, m = jax.jit(
        lambda s: sharded_closed_loop(
            make_mesh(), s, cfg, scfg, track, constant_refs(cfg, 1.4), T=5
        )
    )(scen)
    np.testing.assert_allclose(conv, float(m.converged_frac), atol=1e-5)
    np.testing.assert_allclose(ey, float(m.ey_rms), atol=1e-5)
    np.testing.assert_allclose(prog, float(m.mean_progress), atol=1e-4)
