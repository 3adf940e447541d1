"""Subprocess worker: the simulated car side of the IO-bridge test.

Creates the shm bridge, publishes states, lockstep-consumes controls,
integrates the nonlinear plant. CPU-forced (the controller process owns
whatever accelerator exists). Prints the final state as JSON.

Usage: python _car_worker.py <bridge_name> <T>
"""

import json
import os
import sys

import numpy as np

os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp  # noqa: E402

from autonomous_racing_lpv_mpp_mpc_tpu.core import (  # noqa: E402
    MPCConfig,
    VehicleParams,
)
from autonomous_racing_lpv_mpp_mpc_tpu.io import lockstep_car  # noqa: E402
from autonomous_racing_lpv_mpp_mpc_tpu.track import oval_track  # noqa: E402


NOISE_SIGMA = [0.03, 0.01, 0.02, 0.01, 0.02, 0.015]


class _GlitchBridge:
    """Publishes camera-misdetection glitches on top of the car's frames:
    every 8th frame gets an alternating-sign jump on (e_psi, e_y) — the
    reference lineage's real sensor failure mode. Pure test shim; the
    library's lockstep_car/bridge stay glitch-free."""

    def __init__(self, inner):
        self._inner = inner
        self._k = 0

    def write_state(self, t, x):
        z = np.array(x, np.float32, copy=True)
        if self._k % 8 == 7:
            sgn = 1.0 if (self._k // 8) % 2 == 0 else -1.0
            z[5] += 0.5 * sgn
            z[3] -= 0.3 * sgn
        self._k += 1
        return self._inner.write_state(t, z)

    def __getattr__(self, name):
        return getattr(self._inner, name)

    def __enter__(self):
        self._inner.__enter__()
        return self

    def __exit__(self, *a):
        return self._inner.__exit__(*a)


def main():
    name = sys.argv[1]
    T = int(sys.argv[2])
    transport = sys.argv[3] if len(sys.argv) > 3 else "shm"
    noisy = len(sys.argv) > 4 and sys.argv[4] == "noise"
    p = VehicleParams()
    cfg = MPCConfig(N=10, model="dynamic")
    track = oval_track()
    x0 = jnp.array([1.0, 0.0, 0.0, 0.0, 0.0, 0.1])
    kw = {}
    if noisy:
        kw = dict(noise_sigma=NOISE_SIGMA, noise_seed=7, return_traj=True)
    if transport == "udp":
        from autonomous_racing_lpv_mpp_mpc_tpu.io import UDPBridge

        sp, cp = (int(v) for v in name.split(":"))  # "stateport:ctrlport"
        with UDPBridge("car", state_port=sp, control_port=cp) as br:
            out = lockstep_car("", p, cfg, track, x0, T, bridge=br,
                               timeout_s=300, **kw)
    else:
        from autonomous_racing_lpv_mpp_mpc_tpu.io import CarBridge

        br = _GlitchBridge(CarBridge(name, create=True)) if noisy else None
        out = lockstep_car(name, p, cfg, track, x0, T, bridge=br, **kw)
    if noisy:
        # report the TRUE trajectory so the controller-side test can score
        # estimate quality and tracking against ground truth
        print(json.dumps({
            "ey_rms_true": float(np.sqrt(np.mean(out[:, 5] ** 2))),
            "ey_max_true": float(np.abs(out[:, 5]).max()),
            "traj_true": np.asarray(out, np.float32).tolist(),
            "x_final": [float(v) for v in out[-1]],
        }))
    else:
        print(json.dumps({"x_final": [float(v) for v in out]}))


if __name__ == "__main__":
    main()
