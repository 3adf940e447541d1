"""Kilometre-scale track proof on the real chip (VERDICT r3 next #7).

Builds a >= 1 km, >= 20k-cell track via ``track_from_centerline``, drives
the megastep kernel on it at batch 4096, and reports: cells, VMEM-visible
table size, compile time, ms/batched-step and solves/s vs the ~1.1k-cell
racetrack baseline, plus XLA's executable memory accounting. The
two-level in-kernel lookup (chunk select on the MXU, cell-within-chunk on
the VPU) is what makes the table-size-proportional cost a matmul instead
of O(n) VPU time — this measures its real scaling price.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_km_track(ds=0.05):
    from autonomous_racing_lpv_mpp_mpc_tpu.track.track import (
        track_from_centerline,
    )

    th = np.linspace(0.0, 2 * np.pi, 4000, endpoint=False)
    R = 160.0 + 30.0 * np.sin(3 * th)
    xy = np.stack([R * np.cos(th), R * np.sin(th)], axis=1)
    return track_from_centerline(xy, width=0.8, ds=ds)


def measure(track, B=4096, K=100, label=""):
    from autonomous_racing_lpv_mpp_mpc_tpu.core import (
        MPCConfig, SolverConfig, VehicleParams,
    )
    from autonomous_racing_lpv_mpp_mpc_tpu.loop import constant_refs
    from autonomous_racing_lpv_mpp_mpc_tpu.ops.megastep_kernel import (
        megastep, megastep_init, megastep_params,
    )
    from autonomous_racing_lpv_mpp_mpc_tpu.parallel import make_scenario_grid

    p = VehicleParams()
    cfg = MPCConfig(N=20, model="dynamic")
    scfg = SolverConfig(max_iter=20, rho_interval=0, early_exit=True)
    x_ref = constant_refs(cfg, 1.8)
    scen = make_scenario_grid(p, cfg, n_ey=64, n_mu=B // 64, vx0=1.5)
    B = scen.batch
    # spread scenarios around the whole track
    L = float(track.length)
    s0 = jnp.linspace(0.0, 0.95 * L, B)
    s_idx = 4
    x0 = scen.x0.at[:, s_idx].set(s0)
    prm = megastep_params(scen.params, B)

    @jax.jit
    def k_steps(car):
        def body(c, _):
            c2, _u, d = megastep(cfg, scfg, track, prm, x_ref, c, n_sub=4)
            return c2, jnp.mean(d[2])
        return jax.lax.scan(body, car, None, length=K)

    car = megastep_init(scen.params, cfg, track, x0)
    t0 = time.perf_counter()
    lowered = k_steps.lower(car)
    compiled = lowered.compile()
    t_compile = time.perf_counter() - t0
    mem = compiled.memory_analysis()
    car2, convs = jax.block_until_ready(compiled(car))
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        car2, convs = jax.block_until_ready(compiled(car2))
        best = min(best, time.perf_counter() - t0)
    out = {
        "label": label,
        "cells": int(track.kappa.shape[0]),
        "track_m": round(L, 1),
        "table_kb": round(track.kappa.shape[0] * 4 / 1024, 1),
        "compile_s": round(t_compile, 1),
        "ms_per_batched_step": round(best / K * 1e3, 3),
        "solves_per_s": round(B * K / best, 1),
        "converged": round(float(np.mean(convs)), 3),
        "hbm_argument_mb": round(
            getattr(mem, "argument_size_in_bytes", 0) / 2**20, 1),
        "hbm_temp_mb": round(
            getattr(mem, "temp_size_in_bytes", 0) / 2**20, 1),
    }
    return out


def main():
    from autonomous_racing_lpv_mpp_mpc_tpu.track import racetrack

    log(f"device={jax.devices()[0]}")
    base = measure(racetrack(), label="racetrack_1.1k_cells")
    print(json.dumps(base))
    km = measure(make_km_track(), label="km_track")
    print(json.dumps(km))
    print(json.dumps({
        "lookup_cost_ratio": round(
            km["ms_per_batched_step"] / base["ms_per_batched_step"], 3),
    }))


if __name__ == "__main__":
    main()
