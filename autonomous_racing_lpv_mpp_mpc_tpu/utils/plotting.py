"""Track/trajectory plotting (SURVEY.md §2 "Plot / logging" — L0 parity).

Reproduces the reference's matplotlib outputs: track map with boundaries and
the driven line, car animation over the track, and state/input trace plots.
Headless-safe (Agg backend); every function returns the Figure and can save
to a path.
"""

from __future__ import annotations

from typing import Optional

import matplotlib

matplotlib.use("Agg")
import matplotlib.animation as animation
import matplotlib.pyplot as plt
import numpy as np

import jax
import jax.numpy as jnp

from ..core.config import MPCConfig
from ..loop.closed_loop import ClosedLoopLog
from ..track.track import Track, frenet_to_global


def _track_outline(track: Track, n: int = 600):
    s = jnp.linspace(0.0, float(track.length) * 0.9999, n)
    half = float(track.width) / 2
    cx, cy, _ = jax.vmap(lambda a: frenet_to_global(track, a, 0.0, 0.0))(s)
    lx, ly, _ = jax.vmap(lambda a: frenet_to_global(track, a, half, 0.0))(s)
    rx, ry, _ = jax.vmap(lambda a: frenet_to_global(track, a, -half, 0.0))(s)
    return map(np.asarray, (cx, cy, lx, ly, rx, ry))


def plot_track(track: Track, ax=None):
    if ax is None:
        _, ax = plt.subplots(figsize=(7, 6))
    cx, cy, lx, ly, rx, ry = _track_outline(track)
    ax.plot(cx, cy, "--", lw=0.7, color="0.6", label="centerline")
    ax.plot(lx, ly, "-", lw=1.2, color="0.2")
    ax.plot(rx, ry, "-", lw=1.2, color="0.2")
    ax.set_aspect("equal")
    return ax


def plot_run(cfg: MPCConfig, track: Track, log: ClosedLoopLog,
             path: Optional[str] = None):
    """Track map + driven line colored by speed, plus trace subplots."""
    X = np.asarray(log.X)
    U = np.asarray(log.U)
    s_i = 4 if cfg.model == "dynamic" else 2
    ey_i = 5 if cfg.model == "dynamic" else 3

    gx, gy, _ = jax.vmap(
        lambda s, e: frenet_to_global(track, s, e, 0.0)
    )(jnp.asarray(X[:, s_i]), jnp.asarray(X[:, ey_i]))
    gx, gy = np.asarray(gx), np.asarray(gy)

    fig = plt.figure(figsize=(13, 8))
    ax0 = fig.add_subplot(2, 2, (1, 3))
    plot_track(track, ax0)
    sc = ax0.scatter(gx, gy, c=X[:, 0], s=3, cmap="viridis")
    fig.colorbar(sc, ax=ax0, label="vx [m/s]")
    ax0.set_title("driven line")

    t = np.arange(X.shape[0]) * cfg.dt
    ax1 = fig.add_subplot(2, 2, 2)
    ax1.plot(t, X[:, 0], label="vx")
    ax1.plot(t, X[:, ey_i], label="e_y")
    ax1.legend(); ax1.grid(alpha=0.3); ax1.set_xlabel("t [s]")

    ax2 = fig.add_subplot(2, 2, 4)
    ax2.plot(t, U[:, 0], label="delta")
    ax2.plot(t, U[:, 1], label="a")
    ax2.step(t, np.asarray(log.converged), lw=0.5, alpha=0.5, label="converged")
    ax2.legend(); ax2.grid(alpha=0.3); ax2.set_xlabel("t [s]")

    fig.tight_layout()
    if path:
        fig.savefig(path, dpi=110)
    return fig


def plot_predictions(cfg: MPCConfig, track: Track, log,
                     steps=None, path: Optional[str] = None):
    """Predicted vs closed-loop traces (reference parity plot).

    ``log`` must come from ``closed_loop(..., log_predictions=True)``.
    Overlays the N-step predictions made at selected steps on the actual
    closed-loop vx and e_y histories.
    """
    X = np.asarray(log.X)
    P_ = np.asarray(log.X_pred)                    # (T, N+1, nx)
    T, N1, _ = P_.shape
    ey_i = 5 if cfg.model == "dynamic" else 3
    if steps is None:
        steps = list(range(0, T - 1, max(1, T // 8)))
    t = np.arange(T) * cfg.dt

    fig, (ax1, ax2) = plt.subplots(2, 1, figsize=(10, 6), sharex=True)
    ax1.plot(t, X[:, 0], "k-", lw=1.5, label="closed loop vx")
    ax2.plot(t, X[:, ey_i], "k-", lw=1.5, label="closed loop e_y")
    for s0 in steps:
        tp = (s0 + np.arange(N1)) * cfg.dt
        ax1.plot(tp, P_[s0, :, 0], "--", lw=0.9, alpha=0.7)
        ax2.plot(tp, P_[s0, :, ey_i], "--", lw=0.9, alpha=0.7)
    ax1.set_ylabel("vx [m/s]"); ax1.legend(); ax1.grid(alpha=0.3)
    ax2.set_ylabel("e_y [m]"); ax2.set_xlabel("t [s]")
    ax2.legend(); ax2.grid(alpha=0.3)
    fig.suptitle("MPC predictions (dashed) vs closed loop (solid)")
    fig.tight_layout()
    if path:
        fig.savefig(path, dpi=110)
    return fig


def animate_run(cfg: MPCConfig, track: Track, log: ClosedLoopLog,
                path: str, stride: int = 3, fps: int = 20):
    """Car-on-track animation (reference's signature output). Saves a GIF."""
    X = np.asarray(log.X)
    s_i = 4 if cfg.model == "dynamic" else 2
    ey_i = 5 if cfg.model == "dynamic" else 3
    gx, gy, psi = jax.vmap(
        lambda s, e: frenet_to_global(track, s, e, 0.0)
    )(jnp.asarray(X[:, s_i]), jnp.asarray(X[:, ey_i]))
    gx, gy = np.asarray(gx), np.asarray(gy)

    fig, ax = plt.subplots(figsize=(7, 6))
    plot_track(track, ax)
    trail, = ax.plot([], [], "-", lw=1.0, color="tab:blue")
    car, = ax.plot([], [], "o", ms=6, color="tab:red")

    idx = np.arange(0, X.shape[0], stride)

    def frame(i):
        k = idx[i]
        trail.set_data(gx[:k + 1], gy[:k + 1])
        car.set_data([gx[k]], [gy[k]])
        return trail, car

    ani = animation.FuncAnimation(fig, frame, frames=len(idx), blit=True)
    ani.save(path, writer=animation.PillowWriter(fps=fps))
    plt.close(fig)
    return path
