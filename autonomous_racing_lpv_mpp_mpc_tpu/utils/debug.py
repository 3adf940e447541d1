"""Numerical-safety tooling (SURVEY.md §5 "Race detection / sanitizers").

The JAX-level equivalents of sanitizers for this framework:
- ``enable_nan_debugging``: jax_debug_nans/infs — fail fast at the op that
  produced the first non-finite value.
- ``checked_closed_loop``: ``checkify`` wrapper over the closed loop with
  explicit finite-state and on-track assertions inside jitted code; returns
  (error, log) so batched sweeps can report which scenario tripped.

Cross-device determinism (the only concurrency in the system) is covered by
the sharded-vs-unsharded equivalence test in tests/test_parallel.py.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import checkify

from ..core.config import MPCConfig, SolverConfig, VehicleParams
from ..loop.closed_loop import closed_loop
from ..track.track import Track


def enable_nan_debugging(enable: bool = True) -> None:
    jax.config.update("jax_debug_nans", enable)
    jax.config.update("jax_debug_infs", enable)


def checked_closed_loop(
    p: VehicleParams,
    cfg: MPCConfig,
    scfg: SolverConfig,
    track: Track,
    x0: jnp.ndarray,
    x_ref,
    T: int,
    ey_limit: Optional[float] = None,
    **kw,
):
    """closed_loop with in-graph checks. Returns (checkify.Error, log)."""
    ey_i = 5 if cfg.model == "dynamic" else 3
    limit = ey_limit if ey_limit is not None else 5.0 * float(track.width)

    def run(x0_):
        log = closed_loop(p, cfg, scfg, track, x0_, x_ref, T, **kw)
        checkify.check(
            jnp.all(jnp.isfinite(log.X)), "non-finite state in closed loop"
        )
        checkify.check(
            jnp.max(jnp.abs(log.X[:, ey_i])) < limit,
            "vehicle left the track neighborhood (|e_y| exceeded {l})",
            l=jnp.asarray(limit),
        )
        return log

    checked = checkify.checkify(run, errors=checkify.user_checks)
    return checked(x0)
