"""Multi-vehicle scenarios: opponent cars as moving obstacles.

Extends the reference lineage's static-obstacle planning (RAS-2020 paper,
SURVEY.md §2 "MPP planner": obstacle-aware corridor shifting) to moving
traffic: each opponent follows the track at its own lateral offset and
speed, and is fed to the online receding-horizon replanner
(planner/online.py) as a swept Frenet corridor block covering where it will
be until the NEXT replan — quasi-static between replans, exactly how the
reference lineage treats moving obstacles at planner rate.

Representation is struct-of-arrays over opponents (vmap/jit friendly):
``OpponentSet(s0, e_y, v)``. Blocks that sweep across the start/finish line
are split in two, because the planner's corridor test is unwrapped
(`planner/mpp.py::_stage_bounds` uses plain interval containment).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

from ..track.track import Track, wrap_s


class OpponentSet(NamedTuple):
    s0: jnp.ndarray    # (n,) arc-length position at t=0 [m]
    e_y: jnp.ndarray   # (n,) lateral offset (held constant) [m]
    v: jnp.ndarray     # (n,) speed along the centerline [m/s]


def opponents(s0, e_y, v) -> OpponentSet:
    f32 = lambda a: jnp.asarray(a, jnp.float32)
    return OpponentSet(f32(s0), f32(e_y), f32(v))


def opponent_s_at(track: Track, opp: OpponentSet, t_s) -> jnp.ndarray:
    """(n,) wrapped arc-length positions at time ``t_s`` seconds."""
    return wrap_s(track, opp.s0 + opp.v * t_s)


def sweep_blocks(
    track: Track,
    opp: OpponentSet,
    t0_s: float,
    t1_s: float,
    car_length: float = 0.4,
    car_width: float = 0.2,
    pad: float = 0.05,
    ego_length: float = 0.0,
    ego_width: float = 0.0,
) -> np.ndarray:
    """(m, 4) [s_lo, s_hi, ey_lo, ey_hi] corridor blocks covering each
    opponent's swept footprint over [t0, t1] (wrap-split, hence m >= n).

    ``ego_length``/``ego_width`` Minkowski-inflate the blocks by the EGO's
    half-dimensions so the block is a keep-out region for the ego's CENTER
    (two rectangles overlap iff center distance < sum of half-dims; a block
    inflated only by the opponent body under-protects by the ego half)."""
    L = float(track.length)
    s_a = np.asarray(opponent_s_at(track, opp, t0_s))
    ds = np.asarray(opp.v) * max(0.0, t1_s - t0_s)
    ey = np.asarray(opp.e_y)
    half_l = (car_length + ego_length) / 2 + pad
    half_w = (car_width + ego_width) / 2 + pad

    rows = []
    for i in range(s_a.shape[0]):
        # endpoint-ordered sweep so a reversing opponent (v < 0, ds < 0)
        # still blocks its ACTUAL swept arc rather than the complement
        s_end = s_a[i] + ds[i]
        lo_un = min(s_a[i], s_end) - half_l
        hi_un = max(s_a[i], s_end) + half_l
        lo = lo_un % L
        hi = hi_un % L
        band = (ey[i] - half_w, ey[i] + half_w)
        if hi_un - lo_un >= L:
            rows.append((0.0, L, *band))        # sweep covers the whole lap
        elif lo <= hi:
            rows.append((lo, hi, *band))
        else:                                    # crosses the finish line
            rows.append((lo, L, *band))
            rows.append((0.0, hi, *band))
    return np.asarray(rows, dtype=np.float32).reshape(-1, 4)


# padding row that can never contain a wrapped arc length: s0 > s1 makes the
# interval test (sm >= s0) & (sm <= s1) identically false.
DUMMY_BLOCK = (1.0, 0.0, 0.0, 0.0)


def pad_blocks(blocks, n_rows: int) -> np.ndarray:
    """Pad (m, 4) corridor blocks to a FIXED (n_rows, 4) shape with inert
    dummy rows, so jitted consumers (tracker segment, planner SQP pass)
    keep a stable trace as obstacles move/appear between replans."""
    out = np.tile(np.asarray(DUMMY_BLOCK, np.float32), (n_rows, 1))
    if blocks is not None:
        b = np.asarray(blocks, np.float32).reshape(-1, 4)
        if b.shape[0] > n_rows:
            raise ValueError(
                f"{b.shape[0]} obstacle blocks exceed max_obstacle_rows={n_rows}"
            )
        out[: b.shape[0]] = b
    return out


def opponents_obstacle_fn(
    track: Track,
    opp: OpponentSet,
    dt: float,
    replan_every: int,
    car_length: float = 0.4,
    car_width: float = 0.2,
    pad: float = 0.05,
    t_lead: float = 0.3,
    ego_length: float = 0.3,
    ego_width: float = 0.15,
) -> Callable[[int], Optional[jnp.ndarray]]:
    """obstacles_fn(step) for ``replanning_loop``: at tracker step t, the
    blocks sweep each opponent from now until the next replan (plus
    ``t_lead`` seconds of slack — the tracker needs the lateral maneuver to
    be underway BEFORE the planner's corridor requires clearance, since it
    follows the planned line with lag, not exactly). Blocks are inflated by
    the ego half-dimensions (see ``sweep_blocks``) so they bound the ego
    CENTER, matching ``collision_trace``'s rectangle-overlap predicate."""

    def fn(step: int) -> Optional[jnp.ndarray]:
        t0 = step * dt
        t1 = (step + replan_every) * dt + t_lead
        blocks = sweep_blocks(track, opp, t0, t1, car_length, car_width,
                              pad, ego_length, ego_width)
        return jnp.asarray(blocks) if blocks.size else None

    return fn


def collision_trace(
    track: Track,
    opp: OpponentSet,
    X_ego: jnp.ndarray,
    dt: float,
    ego_length: float = 0.3,
    ego_width: float = 0.15,
    opp_length: float = 0.3,
    opp_width: float = 0.15,
    s_idx: int = 4,
    ey_idx: int = 5,
) -> jnp.ndarray:
    """(T,) bool: axis-aligned Frenet rectangle overlap between the ego and
    ANY opponent at each step — the physical collision predicate (the
    scalar ``min_gap_trace`` norm mixes the two axes and over/under-counts
    for elongated car bodies)."""
    T = X_ego.shape[0]
    t = jnp.arange(T, dtype=jnp.float32) * dt
    s_opp = wrap_s(track, opp.s0[None, :] + opp.v[None, :] * t[:, None])
    s_ego = wrap_s(track, X_ego[:, s_idx])
    ds = jnp.abs(s_opp - s_ego[:, None])
    ds = jnp.minimum(ds, track.length - ds)
    dey = jnp.abs(opp.e_y[None, :] - X_ego[:, ey_idx][:, None])
    hit = (ds < (ego_length + opp_length) / 2) & (dey < (ego_width + opp_width) / 2)
    return jnp.any(hit, axis=1)


def min_gap_trace(
    track: Track,
    opp: OpponentSet,
    X_ego: jnp.ndarray,     # (T, nx) closed-loop ego states (dynamic model)
    dt: float,
    s_idx: int = 4,
    ey_idx: int = 5,
) -> jnp.ndarray:
    """(T,) distance from the ego to the nearest opponent at each step
    (Frenet metric: wrap-aware delta-s and delta-e_y, Euclidean norm).
    Collision checking for multi-vehicle runs."""
    T = X_ego.shape[0]
    t = jnp.arange(T, dtype=jnp.float32) * dt
    s_opp = wrap_s(track, opp.s0[None, :] + opp.v[None, :] * t[:, None])  # (T, n)
    s_ego = wrap_s(track, X_ego[:, s_idx])    # closed-loop logs keep s unwrapped
    ds = jnp.abs(s_opp - s_ego[:, None])
    ds = jnp.minimum(ds, track.length - ds)
    dey = jnp.abs(opp.e_y[None, :] - X_ego[:, ey_idx][:, None])
    return jnp.min(jnp.sqrt(ds * ds + dey * dey), axis=1)
