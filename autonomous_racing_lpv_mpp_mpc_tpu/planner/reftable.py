"""Reference tables: planner output consumed by the tracking MPC.

Reference parity (SURVEY.md §3.3): "output refs tables indexed by s:
vx_ref(s), e_y_ref(s), delta_ff(s)". Uniform-grid tables so lookups inside
``scan``/``vmap`` are branch-free index arithmetic (same design as the track
table).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from ..core.config import MPCConfig
from ..models import model_nx


@struct.dataclass
class RefTable:
    ds: jnp.ndarray        # scalar grid pitch [m]
    length: jnp.ndarray    # scalar track length [m]
    vx: jnp.ndarray        # (n,) velocity reference
    ey: jnp.ndarray        # (n,) lateral-offset reference (racing line)
    delta: jnp.ndarray     # (n,) steering feed-forward

    def lookup(self, s: jnp.ndarray):
        """Linear-interpolated (vx_ref, ey_ref, delta_ff) at arc length s."""
        sm = s - self.length * jnp.floor(s / self.length)
        n = self.vx.shape[0]
        f = sm / self.ds
        i0 = jnp.clip(f.astype(jnp.int32), 0, n - 1)
        i1 = (i0 + 1) % n
        t = f - i0.astype(f.dtype)
        interp = lambda a: a[i0] * (1 - t) + a[i1] * t
        return interp(self.vx), interp(self.ey), interp(self.delta)


def refs_from_table(cfg: MPCConfig, table: RefTable, s_sched: jnp.ndarray,
                    slope_probe: float = 0.15):
    """(N+1, nx) tracking reference evaluated at the scheduled s trajectory.

    The e_psi reference is the racing line's own heading
    ``atan(d e_y/ds)`` (central difference over ``slope_probe`` metres):
    with it at 0 the tracker FIGHTS every commanded lateral ramp — the
    heading weight pulls back to the track tangent while the e_y weight
    pulls onto the line, roughly doubling the lateral settling distance
    (measured r4: 0.18 m step reached only ~0.15 after 1.5 s). On a
    constant-offset section the slope is 0 and the behavior is unchanged.
    """
    nx = model_nx(cfg.model)
    vx_r, ey_r, _ = table.lookup(s_sched)
    ey_p = table.lookup(s_sched + slope_probe)[1]
    ey_m = table.lookup(s_sched - slope_probe)[1]
    epsi_r = jnp.arctan2(ey_p - ey_m, 2.0 * slope_probe)
    # a table DISCONTINUITY is not a commanded heading: an online plan
    # longer than one lap overlaps itself when sampled onto the periodic
    # grid (plan-start vs plan-end lines at the same s), and that seam
    # reads as a ~0.5 rad slope spike that collapsed tracker convergence
    # for the ~1 m of horizon that saw it (measured r4). Real racing-line
    # slopes in this domain are <= ~0.15 rad; larger means artifact ->
    # fall back to the track-tangent reference.
    epsi_r = jnp.where(jnp.abs(epsi_r) > 0.3, 0.0, epsi_r)
    ey_i, epsi_i = (5, 3) if cfg.model == "dynamic" else (3, 1)
    x_ref = jnp.zeros((s_sched.shape[0], nx), s_sched.dtype)
    x_ref = x_ref.at[:, 0].set(vx_r)
    x_ref = x_ref.at[:, ey_i].set(ey_r)
    x_ref = x_ref.at[:, epsi_i].set(epsi_r)
    return x_ref
