"""Render artifacts/race_learn_perlane.png: per-lane composed learning at
kernel rate (loop/race.py::mega_race_learn, PERF.md r5).

Left: each lane's LEARNED corner speed vs its true surface friction —
the per-lane ILC (at per-lane mu-hat from per-lane EKF+RLS chains) must
separate corner pace by grip from one shared seed table.
Right: median per-window progress — the fleet's pace improving as the
tables learn.

Usage: python tools/make_race_learn_plot.py [batch] [windows] [out.png]
"""

import os
import sys

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
    from autonomous_racing_lpv_mpp_mpc_tpu.loop import (
        LapLearnConfig,
        initial_table,
        mega_race_learn,
    )
    from autonomous_racing_lpv_mpp_mpc_tpu.track import racetrack
    from autonomous_racing_lpv_mpp_mpc_tpu.utils import plotting  # noqa: F401
    import matplotlib.pyplot as plt

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    W = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    out = sys.argv[3] if len(sys.argv) > 3 else "artifacts/race_learn_perlane.png"

    p = VehicleParams()
    cfg = MPCConfig(N=12, model="dynamic", tire="pacejka")
    scfg = SolverConfig(max_iter=40, rho_interval=0, early_exit=True,
                        check_termination=2)
    track = racetrack()
    mu_b = jnp.asarray(np.linspace(0.45, 1.2, B), jnp.float32)
    x0 = jnp.zeros((B, 6), jnp.float32).at[:, 0].set(1.0)
    x0 = x0.at[:, 4].set(jnp.asarray(
        np.linspace(0.0, float(track.length), B, endpoint=False),
        jnp.float32))
    sigma = np.array([0.03, 0.01, 0.02, 0.01, 0.02, 0.01], np.float32)
    log = mega_race_learn(
        p, cfg, scfg, track, x0, n_windows=W, T_window=300,
        mu_true_b=mu_b, mu0=0.8, noise_sigma=sigma,
        llcfg=LapLearnConfig(gain=0.5, dv_max=0.5),
        table0=initial_table(track, ds=0.05, vx0=1.2),
    )

    kap = np.abs(np.asarray(track.kappa))
    ds_t = float(np.reshape(np.asarray(log.table.ds), (-1,))[0])
    n = log.tables_vx.shape[-1]
    node_kap = kap[np.clip(((np.arange(n) * ds_t) / float(track.ds)
                            ).astype(int), 0, kap.size - 1)]
    corner = node_kap > 0.5 * kap.max()
    cv = log.tables_vx[-1][:, corner].mean(axis=1)
    mu = np.asarray(mu_b)
    prog = log.progress                              # (W, B)

    BLUE, ORANGE = "#3c74d6", "#d66a27"
    fig, (ax0, ax1) = plt.subplots(1, 2, figsize=(10.5, 3.8))
    ax0.scatter(mu, cv, s=7, alpha=0.45, color=BLUE, edgecolors="none")
    # binned trend (direct-labeled; no legend needed for one series +
    # its summary line)
    edges = np.linspace(mu.min(), mu.max(), 9)
    mids = 0.5 * (edges[:-1] + edges[1:])
    med = [np.median(cv[(mu >= a) & (mu < b)]) for a, b in
           zip(edges[:-1], edges[1:])]
    ax0.plot(mids, med, color=ORANGE, lw=2)
    ax0.annotate("binned median", (mids[-3], med[-3]),
                 textcoords="offset points", xytext=(6, -12),
                 color=ORANGE, fontsize=9)
    r = np.corrcoef(mu, cv)[0, 1]
    ax0.set_xlabel("true surface friction mu (per lane)")
    ax0.set_ylabel("learned corner speed [m/s]")
    ax0.set_title(f"each lane learns ITS surface (r = {r:.2f}, B = {len(mu)})",
                  fontsize=10)
    ax0.grid(alpha=0.25, lw=0.5)

    w = np.arange(1, prog.shape[0] + 1)
    p50 = np.median(prog, axis=1)
    p25 = np.percentile(prog, 25, axis=1)
    p75 = np.percentile(prog, 75, axis=1)
    ax1.fill_between(w, p25, p75, color=BLUE, alpha=0.18, lw=0)
    ax1.plot(w, p50, color=BLUE, lw=2)
    ax1.annotate(f"{p50[-1]:.1f} m", (w[-1], p50[-1]),
                 textcoords="offset points", xytext=(-28, 6),
                 color=BLUE, fontsize=9)
    ax1.annotate(f"{p50[0]:.1f} m", (w[0], p50[0]),
                 textcoords="offset points", xytext=(4, -12),
                 color=BLUE, fontsize=9)
    ax1.set_xlabel("learning window")
    ax1.set_ylabel("progress per 10 s window [m]")
    ax1.set_title("fleet pace, median + IQR", fontsize=10)
    ax1.grid(alpha=0.25, lw=0.5)

    fig.suptitle(
        "Per-lane composed learning at kernel rate "
        "(measurement  → EKF → friction RLS → tracker → "
        "plant + per-lane ILC)", fontsize=10)
    fig.tight_layout(rect=(0, 0, 1, 0.93))
    fig.savefig(out, dpi=120)
    print(f"wrote {out}: corner-vx-vs-mu r={r:.3f}, progress "
          f"{p50[0]:.1f} -> {p50[-1]:.1f} m/window")


if __name__ == "__main__":
    main()
