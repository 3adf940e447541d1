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


def refs_from_table(cfg: MPCConfig, table: RefTable, s_sched: jnp.ndarray):
    """(N+1, nx) tracking reference evaluated at the scheduled s trajectory."""
    nx = model_nx(cfg.model)
    vx_r, ey_r, _ = table.lookup(s_sched)
    ey_i = 5 if cfg.model == "dynamic" else 3
    x_ref = jnp.zeros((s_sched.shape[0], nx), s_sched.dtype)
    x_ref = x_ref.at[:, 0].set(vx_r)
    x_ref = x_ref.at[:, ey_i].set(ey_r)
    return x_ref
