"""On-chip throughput of the COMPOSED deployment stack (racestep kernel).

Protocol mirrors bench.py (K steps fused per dispatch, best-of-N wall), but
every step is the FULL composition: windowed global->Frenet measurement +
sensor noise -> sub-stepped EKF at mu-hat -> friction RLS -> warm-started
tracker -> world-frame Pacejka plant at per-lane mu-true. Compare against
the tracker-only megastep headline (PERF.md) and the XLA composed sweep
(~11k composed solves/s measured r4).

Usage: python tools/racebench.py [B] [K] [backend: mega|xla] [ee=0|1]
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
    from autonomous_racing_lpv_mpp_mpc_tpu.loop.race import (
        batched_race_sweep,

    )
    from autonomous_racing_lpv_mpp_mpc_tpu.track import racetrack

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 500
    backend = sys.argv[3] if len(sys.argv) > 3 else "mega"
    ee = not (len(sys.argv) > 4 and sys.argv[4] == "ee=0")

    p = VehicleParams()
    cfg = MPCConfig(N=20, model="dynamic", tire="pacejka")
    scfg = SolverConfig(max_iter=20, rho_interval=0, early_exit=ee,
                        check_termination=2 if ee else 5)
    track = racetrack()
    table = initial_table(track, ds=0.05, vx0=1.5)
    mu_b = jnp.asarray(np.linspace(0.5, 1.2, B), jnp.float32)
    x0 = jnp.zeros((B, 6), jnp.float32).at[:, 0].set(1.5)
    x0 = x0.at[:, 4].set(jnp.asarray(
        np.linspace(0.0, float(track.length), B, endpoint=False), jnp.float32))
    sigma = np.array([0.03, 0.01, 0.02, 0.01, 0.02, 0.01], np.float32)

    log(f"device={jax.devices()[0]} B={B} K={K} backend={backend} "
        f"early_exit={ee}")
    if backend == "mega":
        # hold ONE compiled runner and time repeated calls: re-tracing a
        # K=500 scan costs ~7 s of host time per call (measured), which is
        # protocol noise, not chip time
        from autonomous_racing_lpv_mpp_mpc_tpu.loop.race import (
            make_racestep_scan,
        )
        from autonomous_racing_lpv_mpp_mpc_tpu.ops.racestep_kernel import (
            racestep_init,
        )

        p_nom = p.replace(mu=jnp.asarray(0.85, jnp.float32))
        carry0 = racestep_init(p, cfg, track, x0, 0.85)
        run = make_racestep_scan(p_nom, cfg, scfg, track, table, K,
                                 mu_b, sigma, kap_window=True)
        t0 = time.perf_counter()
        carry, outs = run(carry0, jax.random.PRNGKey(0))
        jax.block_until_ready(carry.xg)
        log(f"compile+first {K} steps: {time.perf_counter()-t0:.1f}s")
        best = float("inf")
        for i in range(5):
            t0 = time.perf_counter()
            carry, outs = run(carry, jax.random.PRNGKey(i + 1))
            jax.block_until_ready(carry.xg)
            best = min(best, time.perf_counter() - t0)

        class _O(object):
            pass

        out = _O()
        bf = lambda a: jnp.moveaxis(a, -1, 0)
        out.Xf = bf(outs[1])
        out.mu_hat = bf(outs[3])
        out.converged = bf(outs[4])
    else:
        kw = dict(T=K, mu_true_b=mu_b, mu0=0.85, noise_sigma=sigma)
        t0 = time.perf_counter()
        out = batched_race_sweep(p, cfg, scfg, track, table, x0, **kw)
        jax.block_until_ready(out.mu_hat)
        log(f"compile+first {K} steps: {time.perf_counter()-t0:.1f}s")
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            out = batched_race_sweep(p, cfg, scfg, track, table, x0, **kw)
            jax.block_until_ready(out.mu_hat)
            best = min(best, time.perf_counter() - t0)
    mu_fin = np.asarray(out.mu_hat[:, -1])
    corr = float(np.corrcoef(mu_fin, np.asarray(mu_b))[0, 1])
    ey = np.abs(np.asarray(out.Xf[..., 5]))
    log(f"best: {best*1e3:.1f} ms for {K} x {B} composed steps")
    print(
        f"composed_solves_per_s={B*K/best:,.0f} ms_per_batched_step="
        f"{best/K*1e3:.3f} converged={float(np.asarray(out.converged).mean()):.3f} "
        f"mu_corr={corr:.3f} ey_p99={float(np.percentile(ey, 99)):.3f} "
        f"ey_max={float(ey.max()):.3f}"
    )


if __name__ == "__main__":
    main()
