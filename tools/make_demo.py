"""Demo artifacts: overtake animation + friction-adaptation plot.

Produces (into artifacts/):
- overtake.gif       — ego (red) overtaking a slow opponent (black) on the
                       oval, replanned corridors routing the pass
                       (planner/opponents.py; the test scenario of
                       tests/test_opponents.py rendered)
- overtake_pass.png  — the same run as a static trajectory figure
- friction_adaptation.png — mu-hat convergence + tracking error vs the
                       frozen-mu ablation (loop/friction.py)
- lap_learning.png   — lap-over-lap ILC: lap-time trajectory + learned
                       velocity profile (loop/lap_learning.py, via the
                       'learn' CLI preset)

CPU-forced: rendering needs no accelerator. Run: python tools/make_demo.py
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import matplotlib

matplotlib.use("Agg")

import functools

import jax.numpy as jnp
import matplotlib.animation as animation
import matplotlib.pyplot as plt
import numpy as np

ART = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "artifacts")


def overtake_demo():
    from autonomous_racing_lpv_mpp_mpc_tpu.core import (
        MPCConfig,
        MPPConfig,
        SolverConfig,
        VehicleParams,
    )
    from autonomous_racing_lpv_mpp_mpc_tpu.planner import (
        opponents,
        opponents_obstacle_fn,
        replanning_loop,
    )
    from autonomous_racing_lpv_mpp_mpc_tpu.track import oval_track
    from autonomous_racing_lpv_mpp_mpc_tpu.track.track import frenet_to_global
    from autonomous_racing_lpv_mpp_mpc_tpu.utils.plotting import plot_track

    p = VehicleParams()
    track = oval_track()
    cfg = MPCConfig(N=16, model="dynamic")
    scfg = SolverConfig(max_iter=80, rho_interval=20)
    pcfg = MPPConfig(H=192, n_sqp=2)
    x0 = jnp.array([1.0, 0.0, 0.0, 0.0, 0.0, 0.0])
    dt, replan_every = cfg.dt, 30

    opp = opponents(s0=[2.5], e_y=[0.0], v=[0.55])
    obs_fn = opponents_obstacle_fn(
        track, opp, dt, replan_every, car_length=0.3, car_width=0.15,
        pad=0.05)
    res = replanning_loop(p, cfg, scfg, pcfg, track, x0, T=210,
                          replan_every=replan_every, obstacles_fn=obs_fn)
    X = np.asarray(res.log.X)
    T = X.shape[0]

    to_xy = jax.jit(jax.vmap(lambda s, e: frenet_to_global(track, s, e, 0.0)))
    ex, ey_g, _ = (np.asarray(a) for a in to_xy(
        jnp.asarray(X[:, 4]), jnp.asarray(X[:, 5])))
    s_opp = (2.5 + 0.55 * dt * np.arange(T)) % float(track.length)
    ox, oy, _ = (np.asarray(a) for a in to_xy(
        jnp.asarray(s_opp, jnp.float32), jnp.zeros(T, jnp.float32)))

    # static figure
    fig, ax = plt.subplots(figsize=(7, 6))
    plot_track(track, ax)
    ax.plot(ex, ey_g, "-", lw=1.4, color="tab:red", label="ego (replanned)")
    ax.plot(ox, oy, "--", lw=1.2, color="black", label="opponent (0.55 m/s)")
    rel = X[:, 4] - (2.5 + 0.55 * dt * np.arange(T))
    k_pass = int(np.argmin(np.abs(rel)))
    ax.plot([ex[k_pass]], [ey_g[k_pass]], "o", ms=8, color="tab:red")
    ax.plot([ox[k_pass]], [oy[k_pass]], "s", ms=8, color="black")
    ax.legend(loc="upper right")
    ax.set_title("MPP replanning: overtake without collision")
    fig.savefig(os.path.join(ART, "overtake_pass.png"), dpi=110,
                bbox_inches="tight")
    plt.close(fig)

    # animation
    fig, ax = plt.subplots(figsize=(7, 6))
    plot_track(track, ax)
    trail, = ax.plot([], [], "-", lw=1.0, color="tab:red")
    ego, = ax.plot([], [], "o", ms=7, color="tab:red")
    other, = ax.plot([], [], "s", ms=7, color="black")
    ax.set_title("overtake (planner/opponents.py)")
    idx = np.arange(0, T, 3)

    def frame(i):
        k = idx[i]
        trail.set_data(ex[:k + 1], ey_g[:k + 1])
        ego.set_data([ex[k]], [ey_g[k]])
        other.set_data([ox[k]], [oy[k]])
        return trail, ego, other

    ani = animation.FuncAnimation(fig, frame, frames=len(idx), blit=True)
    out = os.path.join(ART, "overtake.gif")
    ani.save(out, writer=animation.PillowWriter(fps=20))
    plt.close(fig)
    print("wrote", out)


def friction_demo():
    from autonomous_racing_lpv_mpp_mpc_tpu.core import (
        MPCConfig,
        SolverConfig,
        VehicleParams,
    )
    from autonomous_racing_lpv_mpp_mpc_tpu.loop import constant_refs
    from autonomous_racing_lpv_mpp_mpc_tpu.loop.friction import (
        adaptive_closed_loop,
    )
    from autonomous_racing_lpv_mpp_mpc_tpu.track import racetrack

    p = VehicleParams()
    cfg = MPCConfig(N=12, model="dynamic", tire="pacejka")
    scfg = SolverConfig(max_iter=40, rho_interval=10)
    track = racetrack()
    x0 = jnp.array([1.2, 0.0, 0.0, 0.0, 0.0, 0.0])
    x_ref = constant_refs(cfg, 2.6)
    T, mu_true = 400, 0.5

    run = lambda adapt: jax.jit(functools.partial(
        adaptive_closed_loop, T=T, mu_true=mu_true, mu0=1.0,
        adapt=adapt))(p, cfg, scfg, track, x0, x_ref)
    on, off = run(True), run(False)

    t = np.arange(T) * cfg.dt
    fig, (a1, a2) = plt.subplots(2, 1, figsize=(7, 6), sharex=True)
    a1.plot(t, np.asarray(on.mu_hat), color="tab:red", label="mu-hat (RLS)")
    a1.axhline(mu_true, ls="--", color="black", lw=1.0,
               label=f"plant mu = {mu_true}")
    a1.axhline(1.0, ls=":", color="gray", lw=1.0, label="controller prior")
    a1.set_ylabel("friction mu")
    a1.legend(loc="upper right")
    a1.set_title("online friction adaptation (loop/friction.py)")
    a2.plot(t, np.abs(np.asarray(off.X[:, 5])), color="gray",
            label="|e_y| frozen mu0=1.0")
    a2.plot(t, np.abs(np.asarray(on.X[:, 5])), color="tab:red",
            label="|e_y| adapted")
    a2.set_xlabel("time [s]")
    a2.set_ylabel("|e_y| [m]")
    a2.legend(loc="upper right")
    out = os.path.join(ART, "friction_adaptation.png")
    fig.savefig(out, dpi=110, bbox_inches="tight")
    plt.close(fig)
    print("wrote", out)


def lap_learning_demo():
    from autonomous_racing_lpv_mpp_mpc_tpu.bench.presets import run_preset

    out = os.path.join(ART, "lap_learning.png")
    res = run_preset("learn", n_laps=6, plot=out)
    print("wrote", out, "| lap_times_s:", res["lap_times_s"])


if __name__ == "__main__":
    os.makedirs(ART, exist_ok=True)
    overtake_demo()
    friction_demo()
    lap_learning_demo()
