"""QP assembly unit tests (SURVEY.md §7 L3): augmentation, Delta-u
stage-separability, constraint-row wiring, speed caps."""

import jax
import jax.numpy as jnp
import numpy as np

from autonomous_racing_lpv_mpp_mpc_tpu.core import (
    MPCConfig,
    MPCWeights,
    SolverConfig,
    VehicleParams,
)
from autonomous_racing_lpv_mpp_mpc_tpu.engine import (
    build_boxqp,
    initial_schedule,
)
from autonomous_racing_lpv_mpp_mpc_tpu.loop import constant_refs
from autonomous_racing_lpv_mpp_mpc_tpu.solver import admm_solve, qp_objective
from autonomous_racing_lpv_mpp_mpc_tpu.track import oval_track

import pytest

pytestmark = pytest.mark.quick  # smoke tier: see pyproject markers


P = VehicleParams()


def _qp(cfg, vx0=1.2, ey0=0.05, u0=None):
    track = oval_track()
    nx = 6 if cfg.model == "dynamic" else 4
    x0 = jnp.zeros(nx).at[0].set(vx0).at[nx - 1].set(ey0)
    u0 = u0 if u0 is not None else jnp.zeros(2)
    Xs, Us = initial_schedule(P, cfg, track, x0, u0)
    return build_boxqp(P, cfg, track, x0, u0, Xs, Us, constant_refs(cfg, 1.5)), x0, u0


def test_augmented_dynamics_track_u_prev():
    """The u_prev block of the augmented state must equal the previous u:
    simulate the augmented system and check xa[nx:] == u_{k-1}."""
    cfg = MPCConfig(N=6, model="dynamic")
    qp, x0, u0 = _qp(cfg)
    na = qp.dyn.A.shape[1]
    nx = 6
    rng = np.random.default_rng(0)
    us = jnp.asarray(rng.uniform(-0.1, 0.1, (cfg.N, 2)), jnp.float32)
    xa = qp.x0
    for k in range(cfg.N):
        np.testing.assert_allclose(
            np.asarray(xa[nx:]), np.asarray(us[k - 1] if k > 0 else u0), atol=1e-6
        )
        xa = qp.dyn.A[k] @ xa + qp.dyn.B[k] @ us[k] + qp.dyn.c[k]
    np.testing.assert_allclose(np.asarray(xa[nx:]), np.asarray(us[-1]), atol=1e-6)


def test_delta_u_cost_equals_explicit_penalty():
    """Stage cost with the (dR, M, Q) augmentation must equal
    sum dr*(u_k - u_{k-1})^2 for a rollout."""
    cfg = MPCConfig(N=5, model="kinematic",
                    weights=MPCWeights.for_model("kinematic"))
    qp, x0, u0 = _qp(cfg)
    rng = np.random.default_rng(1)
    us = jnp.asarray(rng.uniform(-0.2, 0.2, (cfg.N, 2)), jnp.float32)
    # roll out the augmented dynamics
    X = [qp.x0]
    for k in range(cfg.N):
        X.append(qp.dyn.A[k] @ X[-1] + qp.dyn.B[k] @ us[k] + qp.dyn.c[k])
    X = jnp.stack(X)
    obj = float(qp_objective(qp, X, us))

    # explicit computation of the same cost
    w = cfg.weights
    nx = 4
    Qd = np.asarray(w.q)
    Rd = np.asarray(w.r)
    dRd = np.asarray(w.dr)
    x_ref = np.asarray(constant_refs(cfg, 1.5))
    Xn = np.asarray(X)[:, :nx]
    us_n = np.asarray(us)
    expl = 0.0
    for k in range(cfg.N + 1):
        expl += 0.5 * np.sum(Qd * Xn[k] ** 2) - np.sum(Qd * x_ref[k] * Xn[k])
    u_prev = np.asarray(u0)
    for k in range(cfg.N):
        expl += 0.5 * np.sum(Rd * us_n[k] ** 2)
        expl += 0.5 * np.sum(dRd * (us_n[k] - u_prev) ** 2)
        u_prev = us_n[k]
    np.testing.assert_allclose(obj, expl, rtol=1e-4)


def test_stage0_state_rows_disabled_terminal_u_rows_disabled():
    cfg = MPCConfig(N=6, model="dynamic")
    qp, _, _ = _qp(cfg)
    assert bool(jnp.all(jnp.isinf(qp.lb[0, :2]))) and bool(jnp.all(jnp.isinf(qp.ub[0, :2])))
    assert bool(jnp.all(jnp.isinf(qp.lb[-1, 2:]))) and bool(jnp.all(jnp.isinf(qp.ub[-1, 2:])))
    # middle stages fully bounded
    assert bool(jnp.all(jnp.isfinite(qp.lb[1:-1])))


def test_speed_cap_rows_follow_curvature():
    """With kappa_speed_cap, vx upper bounds tighten in corners."""
    cfg = MPCConfig(N=10, model="dynamic")
    track = oval_track()
    # schedule crossing into the 1/R corner at s ~ 2.0
    x0 = jnp.array([2.0, 0.0, 0.0, 0.0, 1.8, 0.0])
    Xs, Us = initial_schedule(P, cfg, track, x0, jnp.zeros(2))
    qp = build_boxqp(P, cfg, track, x0, jnp.zeros(2), Xs, Us, constant_refs(cfg, 2.5))
    caps = np.asarray(qp.ub[:, 0])
    b = cfg.bounds
    # straight stages at vx_max; corner stages at sqrt(f*mu*g/kappa) < vx_max
    v_corner = float(np.sqrt(cfg.a_lat_frac * P.mu * P.g / 1.0))
    assert caps.min() < v_corner + 0.05
    cfg_off = cfg.replace(kappa_speed_cap=False)
    qp2 = build_boxqp(P, cfg_off, track, x0, jnp.zeros(2), Xs, Us, constant_refs(cfg_off, 2.5))
    np.testing.assert_allclose(np.asarray(qp2.ub[1:-1, 0]), b.vx_max)


def test_ekf_in_the_loop():
    """use_ekf path: noisy measurements filtered by the EKF still complete
    the run with bounded lateral error."""
    from autonomous_racing_lpv_mpp_mpc_tpu.loop import closed_loop_global

    cfg = MPCConfig(N=12, model="dynamic")
    scfg = SolverConfig(max_iter=40, rho_interval=0)
    track = oval_track()
    x0 = jnp.array([1.0, 0.0, 0.0, 0.0, 0.0, 0.0])
    sigma = jnp.array([0.05, 0.02, 0.05, 0.02, 0.02, 0.01])
    log = closed_loop_global(
        P, cfg, scfg, track, x0, constant_refs(cfg, 1.5), T=200,
        noise_sigma=sigma, use_ekf=True, key=jax.random.PRNGKey(1),
    )
    Xf = np.asarray(log.Xf)
    assert Xf[-1, 4] > 6.0
    assert np.abs(Xf[:, 5]).max() < 0.25


def test_corridor_full_width_block_never_inverts():
    """A block that (with margin) spans the whole track width must yield a
    clamped zero-width corridor on the chosen side, never an inverted one
    (ey_lo > ey_hi) — downstream jnp.clip with lb > ub silently pins to ub
    and overrides the side choice (round-2 advisor finding)."""
    from autonomous_racing_lpv_mpp_mpc_tpu.engine.assembly import (
        corridor_from_blocks,
    )

    half, margin = 0.4, 0.05
    sm = jnp.linspace(0.0, 10.0, 21)
    lo0 = jnp.full_like(sm, -half)
    hi0 = jnp.full_like(sm, half)
    # block + margin reaches BOTH edges: up_w and dn_w are both negative,
    # go_up wins by a hair -> unclamped new_lo would be 0.43 > half
    blocks = jnp.asarray([[2.0, 4.0, -0.39, 0.38]])
    lo, hi = corridor_from_blocks(sm, lo0, hi0, blocks, margin, half)
    assert bool(jnp.all(lo <= hi))
    inside = (sm >= 2.0) & (sm <= 4.0)
    # chosen side is ABOVE: corridor collapsed to the top edge
    np.testing.assert_allclose(np.asarray(lo[inside]), half, atol=1e-6)
    np.testing.assert_allclose(np.asarray(hi[inside]), half, atol=1e-6)
    # outside the block the corridor is untouched
    np.testing.assert_allclose(np.asarray(lo[~inside]), -half)
    np.testing.assert_allclose(np.asarray(hi[~inside]), half)


def test_corridor_opposite_side_overlap_collapses_to_midpoint():
    """Two overlapping blocks whose individually-sane side choices conflict
    (one forces ABOVE, the other BELOW) produce a residual inversion across
    the folds; it must collapse to a zero-width midpoint corridor (handled
    by the soft e_y row), not pass through inverted."""
    from autonomous_racing_lpv_mpp_mpc_tpu.engine.assembly import (
        corridor_from_blocks,
    )

    half, margin = 0.4, 0.05
    sm = jnp.linspace(0.0, 10.0, 21)
    lo0 = jnp.full_like(sm, -half)
    hi0 = jnp.full_like(sm, half)
    blocks = jnp.asarray([
        [2.0, 4.0, -0.35, 0.10],   # wider gap above -> go up: lo = 0.15
        [3.0, 5.0, -0.10, 0.35],   # wider gap below -> go down: hi = -0.15
    ])
    lo, hi = corridor_from_blocks(sm, lo0, hi0, blocks, margin, half)
    assert bool(jnp.all(lo <= hi))
    both = (sm >= 3.0) & (sm <= 4.0)
    np.testing.assert_allclose(np.asarray(lo[both]), np.asarray(hi[both]),
                               atol=1e-6)
