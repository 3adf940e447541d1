"""Megastep FIXED-PART per-stage cost attribution on the chip.

The r4/r5 decompositions bound the fixed (non-iteration) part of an
early-exit step at ~0.95 ms (~65%) but could only attribute the expm
(~0.2 ms, tools/expmcost.py). This tool drives the `probe` statics
(ops/megastep_kernel.py::_mpc_core) that drop exactly ONE fixed stage —
curvature lookups, LPV+Van Loan build, q0 rows, warm-start shift,
Riccati factor, plant substeps — and reports the wall-time delta per
probe at max_iter=0 (the pure fixed part; no ADMM iterations at all).

Probe outputs are GARBAGE by design; timing stays valid because every
remaining op is branch-free with static shapes (early exit stays off and
the iteration count is pinned at zero, so nothing is data-dependent).

Usage: python tools/fixedcost.py [B] [K]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    from autonomous_racing_lpv_mpp_mpc_tpu.core import (
        MPCConfig,
        SolverConfig,
        VehicleParams,
    )
    from autonomous_racing_lpv_mpp_mpc_tpu.loop import constant_refs
    from autonomous_racing_lpv_mpp_mpc_tpu.ops.megastep_kernel import (
        megastep,
        megastep_init,
        megastep_params,
    )
    from autonomous_racing_lpv_mpp_mpc_tpu.parallel import make_scenario_grid
    from autonomous_racing_lpv_mpp_mpc_tpu.track import racetrack

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 200

    p = VehicleParams()
    cfg = MPCConfig(N=20, model="dynamic")
    scfg = SolverConfig(max_iter=0, rho_interval=0, early_exit=False,
                        check_termination=5)
    track = racetrack()
    x_ref = constant_refs(cfg, 1.8)
    scen = make_scenario_grid(p, cfg, n_ey=min(64, B),
                              n_mu=max(1, B // 64), vx0=1.5)
    B = scen.batch
    prm = megastep_params(scen.params, B)
    carry0 = megastep_init(scen.params, cfg, track, scen.x0)

    log(f"device={jax.devices()[0]} B={B} K={K} max_iter=0 (fixed part only)")
    base_ms = None
    for probe in ("", "lookups", "build", "q0", "warm", "factor", "plant"):
        @jax.jit
        def k_steps(car, _probe=probe):
            def body(c, _):
                c2, _u0, diag = megastep(cfg, scfg, track, prm, x_ref, c,
                                         n_sub=4, probe=_probe)
                return c2, diag[0]
            car, _ = jax.lax.scan(body, car, None, length=K)
            return car

        t0 = time.perf_counter()
        car = k_steps(carry0)
        jax.block_until_ready(car.x)
        log(f"  probe={probe or 'NONE'}: compile+first "
            f"{time.perf_counter()-t0:.1f}s")
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            car2 = k_steps(carry0)       # fresh carry: probe runs corrupt it
            jax.block_until_ready(car2.x)
            best = min(best, time.perf_counter() - t0)
        ms = best / K * 1e3
        if base_ms is None:
            base_ms = ms
        print(f"probe={probe or 'NONE':8s} {ms:7.3f} ms/batched-step  "
              f"stage cost {base_ms - ms:+7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
