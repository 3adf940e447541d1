"""Capture an on-chip jax.profiler trace of the flagship megastep scan
(VERDICT r2 next-round #8 / SURVEY.md §5 "Tracing / profiling").

Runs the exact bench.py protocol (B=4096, N=20, backend="mega", K steps
fused in one lax.scan dispatch) on the real TPU, records:

- a Perfetto/TensorBoard trace directory (``artifacts/trace_r3/``) of the
  warm steady-state dispatches, and
- XLA's own cost_analysis (FLOPs / bytes accessed) for the compiled
  k_steps executable, printed as one JSON line — the numbers PERF.md's
  roofline section cites.

Usage:  python tools/capture_trace.py [outdir] [B] [K]
"""

import json
import os
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


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
    from autonomous_racing_lpv_mpp_mpc_tpu.utils.profiling import (
        cost_analysis,
        trace_to,
    )

    outdir = sys.argv[1] if len(sys.argv) > 1 else "artifacts/trace_r4"
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    K = int(sys.argv[3]) if len(sys.argv) > 3 else 500
    # ee=0 as argv[4] forces the fixed-iteration-count protocol (bench.py
    # parity: early exit is the default headline protocol since r4)
    early_exit = (sys.argv[4] != "ee=0") if len(sys.argv) > 4 else True

    p = VehicleParams()
    cfg = MPCConfig(N=20, model="dynamic")
    scfg = SolverConfig(max_iter=20, rho_interval=0, backend="mega",
                        early_exit=early_exit)
    track = racetrack()
    x_ref = constant_refs(cfg, 1.8)
    scen = make_scenario_grid(p, cfg, n_ey=min(64, B), n_mu=max(1, B // 64),
                              vx0=1.5)
    B = scen.batch
    prm = megastep_params(scen.params, B)

    @jax.jit
    def k_steps(carries):
        def body(car_i, _):
            car2, _u0, diag = megastep(cfg, scfg, track, prm, x_ref, car_i,
                                       n_sub=4)
            return car2, jnp.mean(diag[2])

        return jax.lax.scan(body, carries, None, length=K)

    carries = megastep_init(scen.params, cfg, track, scen.x0)
    # warm: compile + one dispatch outside the trace
    carries, _ = jax.block_until_ready(k_steps(carries))

    with trace_to(outdir):
        t0 = time.perf_counter()
        carries, convs = jax.block_until_ready(k_steps(carries))
        dt = time.perf_counter() - t0

    ca = cost_analysis(k_steps, carries)
    flops = ca.get("flops", 0.0)
    bytes_acc = ca.get("bytes accessed", 0.0)
    print(json.dumps({
        "trace_dir": outdir,
        "device": str(jax.devices()[0]),
        "batch": B,
        "k_steps": K,
        "wall_s_traced_dispatch": round(dt, 4),
        "solves_per_s": round(B * K / dt, 1),
        "xla_flops_per_dispatch": flops,
        "xla_bytes_accessed_per_dispatch": bytes_acc,
        "flops_per_solve": round(flops / (B * K), 1) if flops else None,
        "bytes_per_solve": round(bytes_acc / (B * K), 1) if bytes_acc else None,
        "converged": round(float(convs[-1]), 4),
    }))


if __name__ == "__main__":
    main()
