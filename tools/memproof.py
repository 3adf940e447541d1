"""Pod-scale memory proof (VERDICT r2 next-round #9 / BASELINE configs 4-5).

Runs a CHECKPOINTED closed-loop sweep at BASELINE-config-5 scale and
records fit + peak memory + kill/resume equality:

- ``cpu`` mode: fake-8 mesh, per_device=4096 -> 32,768 concurrent
  scenarios (the 100k-class pod sweep scaled to one host's device count),
  checkpointed every chunk, then latest-resumed. Peak host RSS recorded.
- ``tpu`` mode: the real chip at per_device=4096, same sweep, peak device
  HBM from ``device.memory_stats()``.

Prints one JSON line consumed by PERF.md's pod-scale section.

Usage: python tools/memproof.py cpu|tpu [per_device] [T] [save_every]
"""

import json
import os
import resource
import sys
import tempfile

mode = sys.argv[1] if len(sys.argv) > 1 else "tpu"
if mode == "cpu":
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    )

import jax
import jax.numpy as jnp

if mode == "cpu":
    jax.config.update("jax_platforms", "cpu")
else:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from autonomous_racing_lpv_mpp_mpc_tpu.core import (
        MPCConfig,
        SolverConfig,
        VehicleParams,
    )
    from autonomous_racing_lpv_mpp_mpc_tpu.loop import constant_refs
    from autonomous_racing_lpv_mpp_mpc_tpu.parallel import (
        make_mesh,
        make_scenario_grid,
    )
    from autonomous_racing_lpv_mpp_mpc_tpu.parallel.scenarios import (
        checkpointed_sweep,
    )
    from autonomous_racing_lpv_mpp_mpc_tpu.track import racetrack

    per_device = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    T = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    save_every = int(sys.argv[4]) if len(sys.argv) > 4 else 4

    p = VehicleParams()
    cfg = MPCConfig(N=14, model="dynamic")
    scfg = SolverConfig(max_iter=15, rho_interval=0)
    track = racetrack()
    x_ref = constant_refs(cfg, 1.5)
    mesh = make_mesh()
    n_dev = len(jax.devices())
    B = per_device * n_dev
    scen = make_scenario_grid(p, cfg, n_ey=min(64, B), n_mu=max(1, B // 64),
                              vx0=1.5)
    B = scen.batch

    with tempfile.TemporaryDirectory() as ckdir:
        # run the first part, "die", then resume to completion
        m1, s1 = checkpointed_sweep(mesh, scen, cfg, scfg, track, x_ref,
                                    T=save_every, checkpoint_dir=ckdir,
                                    save_every=save_every)
        m2, s2 = checkpointed_sweep(mesh, scen, cfg, scfg, track, x_ref,
                                    T=T, checkpoint_dir=ckdir,
                                    save_every=save_every)
        assert s1 == save_every and s2 == T - save_every, (s1, s2)

    out = {
        "mode": mode,
        "devices": n_dev,
        "per_device": B // n_dev,
        "scenarios": B,
        "T": T,
        "resumed_ok": True,
        "converged_frac": round(float(m2.converged_frac), 4),
        "ey_rms_m": round(float(m2.ey_rms), 4),
        "peak_host_rss_gb": round(
            resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6, 2),
    }
    if mode == "tpu":
        st = jax.local_devices()[0].memory_stats()
        if st:
            out["peak_hbm_gb"] = round(st["peak_bytes_in_use"] / 2**30, 3)
            out["hbm_limit_gb"] = round(st["bytes_limit"] / 2**30, 3)
        else:
            # axon tunnel: runtime memory_stats unavailable -> use XLA's
            # compile-time accounting of the sweep-chunk executable (the
            # exact HBM the chunk needs: args + outputs + temps).
            from autonomous_racing_lpv_mpp_mpc_tpu.loop.mpc import mpc_init
            from autonomous_racing_lpv_mpp_mpc_tpu.parallel.scenarios import (
                sweep_chunk_fn,
            )

            fn = sweep_chunk_fn(mesh, cfg, scfg, track, x_ref, save_every)
            carries = jax.vmap(lambda x0, pp: mpc_init(pp, cfg, track, x0))(
                scen.x0, scen.params)
            zeros = jnp.zeros((B,), jnp.float32)
            acc = {"conv": zeros, "ey_sq": zeros, "iters": zeros}
            ma = fn.lower(scen.x0, scen.params, carries, acc)\
                   .compile().memory_analysis()
            hbm = (ma.argument_size_in_bytes + ma.output_size_in_bytes
                   + ma.temp_size_in_bytes)
            out["xla_exec_hbm_gb"] = round(hbm / 2**30, 4)
            out["xla_temp_mb"] = round(ma.temp_size_in_bytes / 2**20, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
