"""Capture an on-chip jax.profiler trace of the COMPOSED racestep scan
(round 5; SURVEY.md §5 "Tracing / profiling" applied to the flagship
composition).

Runs the tools/racebench.py protocol (B=4096, N=20, noisy sensors, early
exit, K steps fused in one lax.scan dispatch) on the real TPU, records a
Perfetto/TensorBoard trace of warm steady-state dispatches plus XLA's
cost_analysis of the compiled runner (the per-step HBM/flop figures the
PERF.md composed section cites; the racestep custom call itself is opaque
to cost analysis, same as the megastep).

Usage:  python tools/capture_race_trace.py [outdir] [B] [K]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np


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
        make_racestep_scan,
    )
    from autonomous_racing_lpv_mpp_mpc_tpu.ops.racestep_kernel import (
        racestep_init,
    )
    from autonomous_racing_lpv_mpp_mpc_tpu.track import racetrack
    from autonomous_racing_lpv_mpp_mpc_tpu.utils.profiling import trace_to

    outdir = sys.argv[1] if len(sys.argv) > 1 else "artifacts/trace_r5_race"
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    K = int(sys.argv[3]) if len(sys.argv) > 3 else 500

    p = VehicleParams()
    cfg = MPCConfig(N=20, model="dynamic", tire="pacejka")
    scfg = SolverConfig(max_iter=20, rho_interval=0, early_exit=True,
                        check_termination=2)
    track = racetrack()
    table = initial_table(track, ds=0.05, vx0=1.5)
    mu_b = jnp.asarray(np.linspace(0.5, 1.2, B), jnp.float32)
    x0 = jnp.zeros((B, 6), jnp.float32).at[:, 0].set(1.5)
    x0 = x0.at[:, 4].set(jnp.asarray(
        np.linspace(0.0, float(track.length), B, endpoint=False),
        jnp.float32))
    sigma = np.array([0.03, 0.01, 0.02, 0.01, 0.02, 0.01], np.float32)
    p_nom = p.replace(mu=jnp.asarray(0.85, jnp.float32))

    carry = racestep_init(p, cfg, track, x0, 0.85)
    run = make_racestep_scan(p_nom, cfg, scfg, track, table, K, mu_b, sigma)
    t0 = time.perf_counter()
    carry, _ = run(carry, jax.random.PRNGKey(0))
    jax.block_until_ready(carry.xg)
    print(f"compile+first: {time.perf_counter()-t0:.1f}s", file=sys.stderr)

    with trace_to(outdir):
        carry, _ = run(carry, jax.random.PRNGKey(1))
        jax.block_until_ready(carry.xg)
    # the wall is timed OUTSIDE the trace context: over the tunnel the
    # profiler session skews in-context timers (trace collection itself
    # took ~220 s); the honest in-trace figure is the device duration of
    # the jit dispatch in the captured trace (r5: 1.784 s for K=500 =
    # 1.148 M composed solves/s on-device, custom call = 99.4% of it)
    t0 = time.perf_counter()
    carry, _ = run(carry, jax.random.PRNGKey(2))
    jax.block_until_ready(carry.xg)
    wall = time.perf_counter() - t0

    # cost analysis of the compiled runner (AOT path)
    lowered = jax.jit(run._fun if hasattr(run, "_fun") else run).lower(
        carry, jax.random.PRNGKey(3))
    cost = lowered.compile().cost_analysis()
    cost = cost[0] if isinstance(cost, (list, tuple)) else cost
    ba = float(cost.get("bytes accessed", 0.0)) if cost else 0.0
    print(json.dumps({
        "trace_dir": outdir,
        "B": B, "K": K,
        "post_trace_wall_s": round(wall, 3),
        "post_trace_composed_solves_per_s": round(B * K / wall, 1),
        "bytes_accessed_per_dispatch": ba,
        "bytes_per_composed_solve": round(ba / (B * K), 1) if ba else None,
    }))


if __name__ == "__main__":
    main()
