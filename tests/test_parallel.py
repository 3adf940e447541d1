"""Distributed-without-a-cluster tests (SURVEY.md §4.5): 8 fake CPU devices
via xla_force_host_platform_device_count (set in conftest)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autonomous_racing_lpv_mpp_mpc_tpu.core import (
    MPCConfig,
    MPCWeights,
    SolverConfig,
    VehicleParams,
)
from autonomous_racing_lpv_mpp_mpc_tpu.loop import closed_loop, constant_refs
from autonomous_racing_lpv_mpp_mpc_tpu.parallel import (
    make_mesh,
    make_scenario_grid,
    scenario_sharding,
    sharded_closed_loop,
    sharded_solve_step,
)
from autonomous_racing_lpv_mpp_mpc_tpu.track import oval_track

P_ = VehicleParams()
CFG = MPCConfig(N=8, model="kinematic", weights=MPCWeights.for_model("kinematic"))
SCFG = SolverConfig(max_iter=40)


def test_fake_devices_present():
    assert len(jax.devices()) == 8


def test_make_mesh_shapes():
    m1 = make_mesh()
    assert m1.devices.shape == (8,)
    m2 = make_mesh(n_scenario=4, n_horizon=2)
    assert m2.devices.shape == (4, 2)
    assert m2.axis_names == ("scenarios", "horizon")


def test_sharded_solve_step_runs_and_is_sharded():
    mesh = make_mesh()
    track = oval_track()
    scen = make_scenario_grid(P_, CFG, n_ey=4, n_mu=4, vx0=1.0)  # B=16 over 8 dev
    refs = constant_refs(CFG, 1.2)
    u, carries, diag = sharded_solve_step(mesh, scen, CFG, SCFG, track, refs)
    assert u.shape == (16, 2)
    assert np.asarray(diag.converged).mean() > 0.9


def test_sharded_closed_loop_matches_unsharded():
    """Sharded sweep == vmap on one device (collective-correctness check,
    doubles as the determinism/race test of SURVEY.md §5)."""
    mesh = make_mesh()
    track = oval_track()
    scen = make_scenario_grid(P_, CFG, n_ey=4, n_mu=2, vx0=1.0)  # B=8
    refs = constant_refs(CFG, 1.2)
    log_sh, metrics = sharded_closed_loop(mesh, scen, CFG, SCFG, track, refs, T=30)

    log_un = jax.vmap(
        lambda x0, p: closed_loop(p, CFG, SCFG, track, x0, refs, T=30)
    )(scen.x0, scen.params)

    np.testing.assert_allclose(
        np.asarray(log_sh.X), np.asarray(log_un.X), atol=2e-5
    )
    # aggregated metrics match a host-side computation
    ey = np.asarray(log_un.X)[:, :, 3]
    np.testing.assert_allclose(
        float(metrics.ey_rms),
        np.sqrt((ey**2).mean(axis=1)).mean(),
        rtol=1e-4,
    )
    assert int(metrics.n_scenarios) == 8


def test_horizon_sharded_solve_matches_plain():
    """2D (scenarios x horizon) mesh: chunked LPV stage evaluation +
    all_gather reassembly produces the same controls as the plain solve."""
    from autonomous_racing_lpv_mpp_mpc_tpu.engine import build_boxqp, initial_schedule
    from autonomous_racing_lpv_mpp_mpc_tpu.parallel.horizon import horizon_sharded_solve
    from autonomous_racing_lpv_mpp_mpc_tpu.solver import admm_solve

    cfg = MPCConfig(N=8, model="dynamic")
    scfg = SolverConfig(max_iter=30)
    track = oval_track()
    mesh = make_mesh(n_scenario=4, n_horizon=2)
    scen = make_scenario_grid(P_, cfg, n_ey=4, n_mu=1, vx0=1.2)
    refs = constant_refs(cfg, 1.5)
    U, conv = horizon_sharded_solve(mesh, scen, cfg, scfg, track, refs)
    assert U.shape == (4, 8, 2)

    def plain(x0, p):
        u0 = jnp.zeros(2)
        X_s, U_s = initial_schedule(p, cfg, track, x0, u0)
        qp = build_boxqp(p, cfg, track, x0, u0, X_s, U_s, refs)
        return admm_solve(qp, scfg).U

    U_ref = jax.vmap(plain)(scen.x0, scen.params)
    np.testing.assert_allclose(np.asarray(U), np.asarray(U_ref), atol=1e-5)


def test_horizon_sharded_riccati_matches_single_device():
    """Cross-chip Riccati: local associative suffix scans + all_gather of
    chunk aggregates reproduce the single-device factorization exactly."""
    from jax.sharding import PartitionSpec as PS

    from autonomous_racing_lpv_mpp_mpc_tpu.parallel.riccati_dist import (
        riccati_factor_horizon_sharded,
    )
    from autonomous_racing_lpv_mpp_mpc_tpu.solver import (
        LQRCost,
        LQRDynamics,
        riccati_factor_scan,
    )

    rng = np.random.default_rng(0)
    N, na, nu, nh = 16, 4, 2, 4
    A = jnp.asarray(np.stack([np.eye(na) + 0.05 * rng.standard_normal((na, na))
                              for _ in range(N)]), jnp.float32)
    B = jnp.asarray(0.2 * rng.standard_normal((N, na, nu)), jnp.float32)
    c = jnp.asarray(0.05 * rng.standard_normal((N, na)), jnp.float32)
    Q = jnp.asarray(np.stack([np.diag(rng.uniform(0.2, 2.0, na))
                              for _ in range(N + 1)]), jnp.float32)
    q = jnp.zeros((N + 1, na), jnp.float32)
    R = jnp.asarray(np.stack([np.diag(rng.uniform(0.3, 1.5, nu))
                              for _ in range(N)]), jnp.float32)
    r = jnp.zeros((N, nu), jnp.float32)
    M = jnp.asarray(0.02 * rng.standard_normal((N, na, nu)), jnp.float32)
    dyn = LQRDynamics(A, B, c)
    cost = LQRCost(Q, q, R, r, M)

    ref = riccati_factor_scan(dyn, cost)

    mesh = make_mesh(n_scenario=1, n_horizon=nh, devices=jax.devices()[:nh])

    def body(A_l, B_l, c_l, Q_l, R_l, r_l, M_l, Qterm):
        # per-chip chunk + a local terminal row (only last chip's is used)
        cost_l = LQRCost(
            jnp.concatenate([Q_l, Qterm], axis=0),
            jnp.zeros((Q_l.shape[0] + 1, na), jnp.float32),
            R_l, r_l, M_l,
        )
        fac = riccati_factor_horizon_sharded(
            LQRDynamics(A_l, B_l, c_l), cost_l, "horizon"
        )
        return fac.K, fac.Vc

    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(PS("horizon"), PS("horizon"), PS("horizon"), PS("horizon"),
                  PS("horizon"), PS("horizon"), PS("horizon"), PS()),
        out_specs=(PS("horizon"), PS("horizon")),
        check_vma=False,
    )
    K_d, Vc_d = fn(A, B, c, Q[:N], R, r, M, Q[N:])
    np.testing.assert_allclose(np.asarray(K_d), np.asarray(ref.K), atol=2e-4)
    np.testing.assert_allclose(np.asarray(Vc_d), np.asarray(ref.Vc), atol=2e-4)


def test_graft_entry_and_dryrun():
    import importlib.util, os

    spec = importlib.util.spec_from_file_location(
        "graft", os.path.join(os.path.dirname(__file__), "..", "__graft_entry__.py")
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    fn, args = m.entry()
    u, carry, diag = jax.jit(fn)(*args)
    assert u.shape == (2,)
    m.dryrun_multichip(8)


def test_scenario_sharding_placement():
    mesh = make_mesh()
    sh = scenario_sharding(mesh)
    x = jax.device_put(jnp.zeros((16, 4)), sh)
    assert len(x.addressable_shards) == 8
