"""Pallas fused-ADMM kernel vs the XLA reference path (interpret mode on
CPU; the same kernel compiles for TPU — exercised by bench.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autonomous_racing_lpv_mpp_mpc_tpu.core import SolverConfig
from autonomous_racing_lpv_mpp_mpc_tpu.ops import pallas_admm_solve
from autonomous_racing_lpv_mpp_mpc_tpu.solver import admm_solve

from tests.test_solver import random_qp


def _batched_qp(seeds):
    qps = [random_qp(s) for s in seeds]
    return jax.tree.map(lambda *ls: jnp.stack(ls), *qps)


@pytest.mark.parametrize("tight", [True, False])
def test_pallas_matches_xla(tight):
    seeds = list(range(4))
    qps = [random_qp(s, tight=tight) for s in seeds]
    qp_b = jax.tree.map(lambda *ls: jnp.stack(ls), *qps)
    cfg = SolverConfig(max_iter=80, rho_interval=0)

    sol_p = pallas_admm_solve(qp_b, cfg, interpret=True)
    sol_x = jax.vmap(lambda q: admm_solve(q, cfg))(qp_b)

    np.testing.assert_allclose(
        np.asarray(sol_p.U), np.asarray(sol_x.U), atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(sol_p.X), np.asarray(sol_x.X), atol=2e-4
    )
    # residuals and adapted rho agree
    np.testing.assert_allclose(
        np.asarray(sol_p.r_prim), np.asarray(sol_x.r_prim), atol=1e-4
    )
    # rho is adapted from a sqrt residual ratio: tiny f32 residual
    # differences show up at the percent level
    np.testing.assert_allclose(
        np.asarray(sol_p.rho), np.asarray(sol_x.rho), rtol=0.05
    )


def test_pallas_warm_start_and_rho0():
    qp_b = _batched_qp(range(3))
    cfg = SolverConfig(max_iter=60, rho_interval=0)
    cold = pallas_admm_solve(qp_b, cfg, interpret=True)
    warm = pallas_admm_solve(
        qp_b, cfg, warm=(cold.s, cold.lam, cold.X, cold.U),
        rho0=cold.rho, interpret=True,
    )
    assert bool(jnp.all(warm.converged))
    np.testing.assert_allclose(
        np.asarray(warm.U), np.asarray(cold.U), atol=5e-4
    )


def test_fused_step_kernel_matches_xla():
    """ops/fused_kernel.py: in-kernel LPV + Van Loan + assembly + solve
    agrees with the XLA prepare+solve path (both tires)."""
    import autonomous_racing_lpv_mpp_mpc_tpu.ops.fused_kernel as fk
    from autonomous_racing_lpv_mpp_mpc_tpu.core import MPCConfig, VehicleParams
    from autonomous_racing_lpv_mpp_mpc_tpu.loop import constant_refs, mpc_init
    from autonomous_racing_lpv_mpp_mpc_tpu.loop.mpc import mpc_step_batched
    from autonomous_racing_lpv_mpp_mpc_tpu.parallel import make_scenario_grid
    from autonomous_racing_lpv_mpp_mpc_tpu.track import racetrack

    orig = fk.fused_mpc_solve
    fk.fused_mpc_solve = lambda *a, **k: orig(*a, **{**k, "interpret": True})
    try:
        p = VehicleParams()
        track = racetrack()
        for tire in ("linear", "pacejka"):
            cfg = MPCConfig(N=10, model="dynamic", tire=tire)
            x_ref = constant_refs(cfg, 1.8)
            scen = make_scenario_grid(p, cfg, n_ey=4, n_mu=2, vx0=1.4)
            carries = jax.vmap(
                lambda x0, pp: mpc_init(pp, cfg, track, x0)
            )(scen.x0, scen.params)
            sf = SolverConfig(max_iter=30, rho_interval=0, backend="fused")
            sx = SolverConfig(max_iter=30, rho_interval=0, backend="xla")
            uf, _, df = mpc_step_batched(scen.params, cfg, sf, track, scen.x0, x_ref, carries)
            ux, _, _ = mpc_step_batched(scen.params, cfg, sx, track, scen.x0, x_ref, carries)
            np.testing.assert_allclose(
                np.asarray(uf), np.asarray(ux), atol=1e-4
            )
            assert float(df.converged.mean()) > 0.99
    finally:
        fk.fused_mpc_solve = orig


def test_pallas_padding_path():
    # B=3 pads to PALLAS_BLOCK; results must be unaffected
    qp_b = _batched_qp(range(3))
    cfg = SolverConfig(max_iter=40, rho_interval=0)
    sol = pallas_admm_solve(qp_b, cfg, interpret=True)
    assert sol.U.shape[0] == 3
    sol1 = pallas_admm_solve(
        jax.tree.map(lambda a: a[:1], qp_b), cfg, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(sol.U[0]), np.asarray(sol1.U[0]), atol=1e-5
    )
