"""Lap statistics and structured per-step records.

Reference parity (SURVEY.md §2 "Plot / logging", §5 "Metrics"): lateral
error RMS, vx tracking error, solve iterations/residuals, lap times.
Host-side numpy over fetched ClosedLoopLog arrays.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import numpy as np

from ..core.config import MPCConfig
from ..loop.closed_loop import ClosedLoopLog


@dataclasses.dataclass
class LapStats:
    n_laps: int
    lap_times: List[float]          # [s] per completed lap
    ey_rms: float                   # lateral error RMS over the run [m]
    ey_max: float
    vx_mean: float
    vx_err_rms: Optional[float]     # vs a constant reference if given
    converged_frac: float
    mean_iters: float
    steps: int


def lap_stats(cfg: MPCConfig, log: ClosedLoopLog, track_length: float,
              vx_ref: Optional[float] = None, dt: Optional[float] = None) -> LapStats:
    X = np.asarray(log.X)
    dt = dt or cfg.dt
    s_i = 4 if cfg.model == "dynamic" else 2
    ey_i = 5 if cfg.model == "dynamic" else 3
    s = X[:, s_i]
    ey = X[:, ey_i]
    vx = X[:, 0]

    crossings = np.floor(s / track_length).astype(int)
    lap_times = []
    for lap in range(1, crossings.max() + 1):
        idx = np.argmax(crossings >= lap)
        prev = np.argmax(crossings >= lap - 1) if lap > 1 else 0
        if idx > prev:
            lap_times.append((idx - prev) * dt)

    return LapStats(
        n_laps=int(crossings.max()),
        lap_times=[round(t, 3) for t in lap_times],
        ey_rms=float(np.sqrt((ey**2).mean())),
        ey_max=float(np.abs(ey).max()),
        vx_mean=float(vx.mean()),
        vx_err_rms=(float(np.sqrt(((vx - vx_ref) ** 2).mean()))
                    if vx_ref is not None else None),
        converged_frac=float(np.asarray(log.converged).mean()),
        mean_iters=float(np.asarray(log.iters).mean()),
        steps=int(X.shape[0]),
    )
