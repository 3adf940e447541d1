"""Worker for tests/test_multiprocess.py — one of two cooperating
processes forming a DCN-style multi-process JAX runtime on CPU.

Each process exposes 4 fake devices (8 global); the worker drives the
EXACT production path a pod host would: ``multihost_init()`` (env-driven),
a global mesh over all processes' devices, per-process scenario shards
assembled via ``host_local_to_global``, a mesh-wide sharded closed loop,
and psum'd SweepMetrics. It prints one machine-readable line the parent
asserts on.
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")

from autonomous_racing_lpv_mpp_mpc_tpu.parallel import (  # noqa: E402
    host_local_to_global,
    make_mesh,
    multihost_init,
)


def main() -> None:
    multihost_init()  # JAX_COORDINATOR_ADDRESS / _NUM_PROCESSES / _PROCESS_ID
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 8, len(jax.devices())
    assert len(jax.local_devices()) == 4

    import jax.numpy as jnp

    from autonomous_racing_lpv_mpp_mpc_tpu.core import (
        MPCConfig,
        SolverConfig,
        VehicleParams,
    )
    from autonomous_racing_lpv_mpp_mpc_tpu.loop import constant_refs
    from autonomous_racing_lpv_mpp_mpc_tpu.parallel.scenarios import (
        make_scenario_grid,
        sharded_closed_loop,
    )
    from autonomous_racing_lpv_mpp_mpc_tpu.track import oval_track

    p = VehicleParams()
    cfg = MPCConfig(N=8, model="dynamic")
    scfg = SolverConfig(max_iter=15, rho_interval=0)
    track = oval_track()
    x_ref = constant_refs(cfg, 1.4)

    # the full 8-scenario grid, identical in every process; each process
    # contributes its own half as the host-local shard
    scen_all = make_scenario_grid(p, cfg, n_ey=8, n_mu=1, vx0=1.0)
    pid = jax.process_index()
    local = jax.tree.map(lambda a: a[4 * pid: 4 * (pid + 1)], scen_all)

    mesh = make_mesh()
    scen_g = host_local_to_global(mesh, local)

    _, metrics = jax.jit(
        lambda s: sharded_closed_loop(
            mesh, s, cfg, scfg, track, x_ref, T=5
        )
    )(scen_g)
    print(
        "MPOK"
        f" {int(metrics.n_scenarios)}"
        f" {float(metrics.converged_frac):.6f}"
        f" {float(metrics.ey_rms):.6f}"
        f" {float(metrics.mean_progress):.6f}",
        flush=True,
    )


if __name__ == "__main__":
    sys.exit(main())
