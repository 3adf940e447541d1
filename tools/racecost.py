"""Composed-step STAGE cost decomposition on the chip (racestep kernel).

Times the racestep scan with individual composed stages dialed down
(fixed ADMM iteration count pins the solver work so deltas attribute to
the stage under test):

  base    n_sub_ekf=4, n_sub=10, use_ekf, adapt_mu  (production statics)
  ekf2/1  fewer EKF predict substeps (Jacobian + F-product work scales
          linearly in substeps)
  noekf   use_ekf=False (measurement window still runs; EKF block gone)
  norls   adapt_mu=False (friction RLS gone; mu_ctrl = params row)
  plant5  n_sub=5 world-plant substeps

Usage: python tools/racecost.py [B] [K] [max_iter]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    from autonomous_racing_lpv_mpp_mpc_tpu.core import (
        MPCConfig,
        SolverConfig,
        VehicleParams,
    )
    from autonomous_racing_lpv_mpp_mpc_tpu.loop.lap_learning import (
        initial_table,
    )
    from autonomous_racing_lpv_mpp_mpc_tpu.loop.race import make_racestep_scan
    from autonomous_racing_lpv_mpp_mpc_tpu.ops.racestep_kernel import (
        racestep_init,
    )
    from autonomous_racing_lpv_mpp_mpc_tpu.track import racetrack

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    max_iter = int(sys.argv[3]) if len(sys.argv) > 3 else 4

    p = VehicleParams()
    cfg = MPCConfig(N=20, model="dynamic", tire="pacejka")
    scfg = SolverConfig(max_iter=max_iter, rho_interval=0, early_exit=False,
                        check_termination=5)
    track = racetrack()
    table = initial_table(track, ds=0.05, vx0=1.5)
    mu_b = jnp.asarray(np.linspace(0.5, 1.2, B), jnp.float32)
    x0 = jnp.zeros((B, 6), jnp.float32).at[:, 0].set(1.5)
    x0 = x0.at[:, 4].set(jnp.asarray(
        np.linspace(0.0, float(track.length), B, endpoint=False),
        jnp.float32))
    sigma = np.array([0.03, 0.01, 0.02, 0.01, 0.02, 0.01], np.float32)
    p_nom = p.replace(mu=jnp.asarray(0.85, jnp.float32))
    carry0 = racestep_init(p, cfg, track, x0, 0.85)

    variants = [
        ("base", dict()),
        ("ekf2", dict(n_sub_ekf=2)),
        ("ekf1", dict(n_sub_ekf=1)),
        ("noekf", dict(use_ekf=False)),
        ("norls", dict(adapt_mu=False)),
        ("plant5", dict(n_sub=5)),
    ]
    log(f"device={jax.devices()[0]} B={B} K={K} fixed max_iter={max_iter}")
    base_ms = None
    for name, kw in variants:
        run = make_racestep_scan(p_nom, cfg, scfg, track, table, K,
                                 mu_b, sigma, **kw)
        t0 = time.perf_counter()
        carry, _ = run(carry0, jax.random.PRNGKey(0))
        jax.block_until_ready(carry.xg)
        log(f"  {name}: compile+first {time.perf_counter()-t0:.1f}s")
        best = float("inf")
        for i in range(3):
            t0 = time.perf_counter()
            carry2, _ = run(carry, jax.random.PRNGKey(i + 1))
            jax.block_until_ready(carry2.xg)
            best = min(best, time.perf_counter() - t0)
        ms = best / K * 1e3
        if base_ms is None:
            base_ms = ms
        print(f"{name:8s} {ms:7.3f} ms/batched-step   "
              f"delta_vs_base {ms - base_ms:+7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
