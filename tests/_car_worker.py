"""Subprocess worker: the simulated car side of the IO-bridge test.

Creates the shm bridge, publishes states, lockstep-consumes controls,
integrates the nonlinear plant. CPU-forced (the controller process owns
whatever accelerator exists). Prints the final state as JSON.

Usage: python _car_worker.py <bridge_name> <T>
"""

import json
import os
import sys

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


def main():
    name = sys.argv[1]
    T = int(sys.argv[2])
    transport = sys.argv[3] if len(sys.argv) > 3 else "shm"
    p = VehicleParams()
    cfg = MPCConfig(N=10, model="dynamic")
    track = oval_track()
    x0 = jnp.array([1.0, 0.0, 0.0, 0.0, 0.0, 0.1])
    if transport == "udp":
        from autonomous_racing_lpv_mpp_mpc_tpu.io import UDPBridge

        sp, cp = (int(v) for v in name.split(":"))  # "stateport:ctrlport"
        with UDPBridge("car", state_port=sp, control_port=cp) as br:
            x_final = lockstep_car("", p, cfg, track, x0, T, bridge=br,
                                   timeout_s=300)
    else:
        x_final = lockstep_car(name, p, cfg, track, x0, T)
    print(json.dumps({"x_final": [float(v) for v in x_final]}))


if __name__ == "__main__":
    main()
