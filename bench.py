"""Benchmark: MPC solves/s/chip (BASELINE.json headline metric).

Protocol (BASELINE config 4 shape): B scenarios of the flagship dynamic-
bicycle LPV-MPC (N=20, dt=1/30) run warm-started receding-horizon steps on
one chip; every step = quasi-LPV scheduling + QP assembly + fixed-iteration
ADMM/Riccati solve + plant integration for every scenario. K steps are fused
into one dispatch (lax.scan) so tunnel/dispatch latency doesn't pollute the
kernel measurement.

Prints ONE JSON line:
  value       = solves/s/chip
  vs_baseline = value / 625  (the BASELINE.json north star is >=10,000
                solves/s aggregate on a v5e-16, i.e. 625 solves/s/chip;
                no reference-published numbers exist — BASELINE.md)
Extra diagnostics go to stderr.
"""

import json
import sys
import time

import jax

# persistent compilation cache: first compile over the axon tunnel is slow
# (minutes); subsequent bench invocations start in seconds
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
    from autonomous_racing_lpv_mpp_mpc_tpu.loop import (
        constant_refs,
        mpc_init,
        mpc_step_batched,
        plant_step,
    )
    from autonomous_racing_lpv_mpp_mpc_tpu.parallel import make_scenario_grid
    from autonomous_racing_lpv_mpp_mpc_tpu.track import racetrack

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    backend = sys.argv[2] if len(sys.argv) > 2 else "mega"
    # steps fused per timed dispatch: the tunnel adds a fixed ~25-30 ms RTT
    # per dispatch, so larger K amortizes it toward the on-device rate
    # (production runs whole laps as one jitted scan — loop/closed_loop.py)
    K = int(sys.argv[3]) if len(sys.argv) > 3 else 500
    # remaining args are key=value knobs, validated (advisor r4: a mistyped
    # positional knob used to silently change the benchmark protocol):
    #   ee=0|1     chunk-level all-lanes early exit on the mega backend
    #              (OSQP's early-termination semantics, PERF.md r4)
    #   check=N    termination-check cadence override
    #   cache=0|1  build-stage discretization caching (PERF.md r5)
    #   kapw=0|1   block-local windowed curvature lookup (PERF.md r5
    #              fixed-part map; bit-exact to the default lookup on the
    #              closed loop — tests/test_megastep.py)
    knobs = {}
    for arg in sys.argv[4:]:
        if "=" not in arg:
            raise SystemExit(f"bench.py: expected key=value, got {arg!r}")
        k, v = arg.split("=", 1)
        if k not in ("ee", "check", "cache", "kapw"):
            raise SystemExit(f"bench.py: unknown knob {k!r} "
                             "(have: ee, check, cache, kapw)")
        knobs[k] = int(v)
    early_exit = bool(knobs.get("ee", 1))
    # default cadence: 2 with early exit (finer exit granularity, +3%
    # measured), 5 for the fixed-count control (r1-r3 protocol parity —
    # more checks only cost there)
    check = knobs.get("check", 2 if early_exit else 5)
    # discretization caching (shift-reuse of the LPV+Van Loan build with a
    # drift trigger, PERF.md r5) — mega backend only
    cache_build = bool(knobs.get("cache", 0))
    # windowed lookup default ON: bit-exact to the default lookup on the
    # closed loop (tested), +16% measured (PERF.md r5 fixed-part map)
    kap_window = bool(knobs.get("kapw", 1))

    p = VehicleParams()
    cfg = MPCConfig(N=20, model="dynamic")
    track = racetrack()
    x_ref = constant_refs(cfg, 1.8)

    n_mu = max(1, B // 64)
    scen = make_scenario_grid(p, cfg, n_ey=min(64, B), n_mu=n_mu, vx0=1.5)
    B = scen.batch

    def make_k_steps(scfg):
        if scfg.backend == "mega":
            # megastep: the ENTIRE receding-horizon step (schedule shift,
            # curvature windows, LPV+Van Loan, Riccati, ADMM, fallback,
            # plant sub-steps) is one Pallas launch; the carry lives
            # batch-last across the scan (ops/megastep_kernel.py).
            from autonomous_racing_lpv_mpp_mpc_tpu.ops.megastep_kernel import (
                megastep,
                megastep_params,
            )

            prm = megastep_params(scen.params, B)

            if scfg.cache_build:
                @jax.jit
                def k_steps(xs, carries):
                    del xs
                    car0, cache0 = carries

                    def body(c, _):
                        car_i, cache_i = c
                        car2, _u0, diag, cache2 = megastep(
                            cfg, scfg, track, prm, x_ref, car_i, n_sub=4,
                            cache=cache_i, kap_window=kap_window,
                        )
                        # cache.age row 0: >0 means the build was reused
                        return (car2, cache2), (
                            jnp.mean(diag[2]), jnp.mean(diag[4]),
                            jnp.mean((cache2.age[0] > 0).astype(jnp.float32)),
                        )

                    carries, (convs, iters, reuse) = jax.lax.scan(
                        body, (car0, cache0), None, length=K)
                    return carries[0].x, carries, (convs, iters, reuse)

                return k_steps

            @jax.jit
            def k_steps(xs, carries):
                del xs
                def body(car_i, _):
                    car2, _u0, diag = megastep(
                        cfg, scfg, track, prm, x_ref, car_i, n_sub=4,
                        kap_window=kap_window,
                    )
                    return car2, (jnp.mean(diag[2]), jnp.mean(diag[4]))

                # convs drives the headline check; iters (mean done-at)
                # shows warm-start health / early-exit effectiveness
                carries, (convs, iters) = jax.lax.scan(
                    body, carries, None, length=K)
                return carries.x, carries, (convs, iters)

            return k_steps

        @jax.jit
        def k_steps(xs, carries):
            def body(c, _):
                xs_i, car_i = c
                u_b, car2, diag = mpc_step_batched(
                    scen.params, cfg, scfg, track, xs_i, x_ref, car_i
                )
                xs2 = jax.vmap(
                    lambda pp, x, u: plant_step(pp, cfg, track, x, u, n_sub=4)
                )(scen.params, xs_i, u_b)
                return (xs2, car2), (
                    jnp.mean(diag.converged.astype(jnp.float32)),
                    jnp.mean(diag.iters.astype(jnp.float32)),
                )

            (xs, carries), (convs, iters) = jax.lax.scan(
                body, (xs, carries), None, length=K)
            return xs, carries, (convs, iters)

        return k_steps

    def make_carries(scfg):
        if scfg.backend == "mega":
            from autonomous_racing_lpv_mpp_mpc_tpu.ops.megastep_kernel import (
                megacache_init,
                megastep_init,
            )

            car = megastep_init(scen.params, cfg, track, scen.x0)
            if scfg.cache_build:
                return car, megacache_init(cfg, scfg, B)
            return car
        return jax.vmap(lambda x0, pp: mpc_init(pp, cfg, track, x0))(
            scen.x0, scen.params
        )

    xs = scen.x0

    # rho_interval=0 + carried rho => exactly one Riccati factorization per
    # solve; 20 warm-started iterations hold >99% convergence in closed loop.
    # backend="mega": whole step in one kernel (ops/megastep_kernel.py);
    # "fused": fused assembly+solver kernel with XLA prepare/plant;
    # "pallas": solver-only kernel; "xla": scans.
    scfg = SolverConfig(max_iter=20, rho_interval=0, backend=backend,
                        early_exit=(early_exit and backend == "mega"),
                        check_termination=check,
                        cache_build=(cache_build and backend == "mega"))
    log(f"device={jax.devices()[0]} batch={B} N={cfg.N} iters={scfg.max_iter} "
        f"backend={backend} early_exit={scfg.early_exit} check={check} "
        f"cache_build={scfg.cache_build}")

    # warmup: compile + reach warm-started steady state; fall back down the
    # backend ladder if a kernel fails to compile on this stack
    t0 = time.perf_counter()
    ladder = {"mega": "fused", "fused": "pallas"}
    while True:
        k_steps = make_k_steps(scfg)
        carries = make_carries(scfg)
        try:
            xs, carries, stats = k_steps(xs, carries)
            convs, iters = stats[0], stats[1]
            jax.block_until_ready(xs)
            break
        except Exception as e:
            nxt = ladder.get(scfg.backend)
            if nxt is None:
                raise
            log(f"{scfg.backend} backend failed ({type(e).__name__}); "
                f"falling back to {nxt}")
            scfg = scfg.replace(backend=nxt)
    log(f"compile+first {K} steps: {time.perf_counter()-t0:.1f}s "
        f"converged={float(convs.mean()):.3f} "
        f"mean_done_at={float(iters.mean()):.1f}/{scfg.max_iter}"
        + (f" build_reuse={float(stats[2].mean()):.2f}"
           if len(stats) > 2 else ""))

    # timed runs: best-of-7 — each dispatch rides the tunnel, whose RTT
    # noise spans ~±8%; more trials tighten the max-performance estimate
    # without changing the metric (PERF.md "Bench protocol")
    best = float("inf")
    for _ in range(7):
        t0 = time.perf_counter()
        xs, carries, stats = k_steps(xs, carries)
        convs, iters = stats[0], stats[1]
        jax.block_until_ready(xs)
        best = min(best, time.perf_counter() - t0)
    solves_s = B * K / best
    step_ms = best / K * 1e3
    log(f"best: {best*1e3:.1f} ms for {K} steps x {B} scenarios "
        f"-> {solves_s:,.0f} solves/s, {step_ms:.2f} ms/batched-step, "
        f"converged={float(convs.mean()):.3f}")

    print(json.dumps({
        "metric": "MPC solves/s/chip (dynamic bicycle N=20, batched receding-horizon steps)",
        "value": round(solves_s, 1),
        "unit": "solves/s/chip",
        "vs_baseline": round(solves_s / 625.0, 3),
    }))


if __name__ == "__main__":
    main()
