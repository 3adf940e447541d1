"""Build-stage sensitivity: megastep wall time vs Van Loan expm settings.

The r4/r5 decompositions put the fixed (build+factor+lookup) part at
~65% of an early-exit step; the expm is ~180 of the 235 kFLOP/solve
(order-6 Taylor + 4 squarings = 9 (na,na,B) matmuls per stage x N
stages). This tool maps how the wall time actually responds to the
series/squaring knobs at a PINNED iteration count — if removing 3 of 9
matmuls barely moves the needle, the build is issue-latency-bound, not
flop-bound, and restructuring (fewer-but-larger ops) beats trimming.

Usage: python tools/expmcost.py [B] [K] [max_iter]
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
    max_iter = int(sys.argv[3]) if len(sys.argv) > 3 else 4

    p = VehicleParams()
    cfg = MPCConfig(N=20, model="dynamic")
    scfg = SolverConfig(max_iter=max_iter, rho_interval=0, early_exit=False,
                        check_termination=5)
    track = racetrack()
    x_ref = constant_refs(cfg, 1.8)
    scen = make_scenario_grid(p, cfg, n_ey=min(64, B),
                              n_mu=max(1, B // 64), vx0=1.5)
    B = scen.batch
    prm = megastep_params(scen.params, B)
    carry0 = megastep_init(scen.params, cfg, track, scen.x0)

    log(f"device={jax.devices()[0]} B={B} K={K} fixed max_iter={max_iter}")
    base_ms = None
    for sq, order in ((4, 6), (2, 6), (1, 4), (0, 2)):
        @jax.jit
        def k_steps(car, _sq=sq, _order=order):
            def body(c, _):
                c2, _u0, diag = megastep(cfg, scfg, track, prm, x_ref, c,
                                         n_sub=4, squarings=_sq,
                                         order=_order)
                return c2, jnp.mean(diag[2])
            car, convs = jax.lax.scan(body, car, None, length=K)
            return car, convs

        t0 = time.perf_counter()
        car, convs = k_steps(carry0)
        jax.block_until_ready(car.x)
        log(f"  sq={sq} order={order}: compile+first "
            f"{time.perf_counter()-t0:.1f}s")
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            car2, convs = k_steps(car)
            jax.block_until_ready(car2.x)
            best = min(best, time.perf_counter() - t0)
        ms = best / K * 1e3
        if base_ms is None:
            base_ms = ms
        print(f"sq={sq} order={order}  {ms:7.3f} ms/batched-step  "
              f"delta {ms - base_ms:+7.3f} ms  "
              f"conv_last {float(convs[-1]):.3f}", flush=True)


if __name__ == "__main__":
    main()
