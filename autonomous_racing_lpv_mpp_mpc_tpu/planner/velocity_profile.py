"""Friction-limited velocity profile along the track centerline.

The classic racing velocity planner, as two O(n) passes (SURVEY.md §3.3
"objective: maximize progress"):

1. curvature speed limit   v_lim(s) = sqrt(a_lat_frac * mu * g / |kappa(s)|)
2. forward pass            v[i+1] <= sqrt(v[i]^2 + 2 a_max ds)   (accel)
3. backward pass           v[i]   <= sqrt(v[i+1]^2 + 2 |a_min| ds) (braking)

Each pass is a ``lax.scan`` over the dense track table; the profile is made
periodic by scanning two laps and keeping the second. Used both as the MPP
planner's initial guess and as a standalone fast reference generator.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.config import MPCBounds, VehicleParams
from ..track.track import Track


def curvature_speed_limit(
    p: VehicleParams, track: Track, bounds: MPCBounds, a_lat_frac: float = 0.85
) -> jnp.ndarray:
    """(n,) per-cell speed limit from the friction circle."""
    from ..engine.assembly import curvature_speed_limit_table

    return curvature_speed_limit_table(
        p, track, bounds.vx_min, bounds.vx_max, a_lat_frac
    )


def velocity_profile(
    p: VehicleParams,
    track: Track,
    bounds: MPCBounds,
    a_lat_frac: float = 0.85,
    a_long_frac: float = 0.9,
) -> jnp.ndarray:
    """(n,) periodic friction/accel-limited velocity profile on the track grid."""
    v_lim = curvature_speed_limit(p, track, bounds, a_lat_frac)
    ds = track.ds
    a_acc = a_long_frac * bounds.a_max
    a_brk = a_long_frac * jnp.abs(bounds.a_min)

    def fwd(v_prev, v_cap):
        v = jnp.minimum(v_cap, jnp.sqrt(v_prev**2 + 2 * a_acc * ds))
        return v, v

    def bwd(v_next, v_cap):
        v = jnp.minimum(v_cap, jnp.sqrt(v_next**2 + 2 * a_brk * ds))
        return v, v

    # two laps for periodicity; keep the second
    v2 = jnp.concatenate([v_lim, v_lim])
    _, vf = jax.lax.scan(fwd, v2[-1], v2)
    _, vb = jax.lax.scan(bwd, vf[0], jnp.minimum(v2, vf), reverse=True)
    _, vf2 = jax.lax.scan(fwd, vb[-1], jnp.minimum(v2, vb))
    _, vb2 = jax.lax.scan(bwd, vf2[0], jnp.minimum(v2, vf2), reverse=True)
    n = track.kappa.shape[0]
    return vb2[n:]
