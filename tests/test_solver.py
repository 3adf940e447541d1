"""Solver correctness tests (SURVEY.md §4.2): batched JAX ADMM/Riccati vs
the self-built CPU numpy oracle on random MPC-structured QPs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autonomous_racing_lpv_mpp_mpc_tpu.core import SolverConfig
from autonomous_racing_lpv_mpp_mpc_tpu.oracle import (
    OsqpRefSettings,
    osqp_ref_solve,
    stack_boxqp,
    unstack_solution,
)
from autonomous_racing_lpv_mpp_mpc_tpu.solver import (
    BoxQP,
    LQRCost,
    LQRDynamics,
    admm_solve,
    admm_solve_single,
    lqr_solve,
    qp_objective,
    riccati_factor_assoc,
    riccati_factor_scan,
)

pytestmark = pytest.mark.quick  # smoke tier: see pyproject markers


N, NX, NU = 8, 4, 2


def random_qp(seed, tight=True):
    rng = np.random.default_rng(seed)
    A = np.stack([np.eye(NX) + 0.08 * rng.standard_normal((NX, NX)) for _ in range(N)])
    B = 0.2 * rng.standard_normal((N, NX, NU))
    c = 0.05 * rng.standard_normal((N, NX))
    Qd = rng.uniform(0.2, 2.0, (N + 1, NX))
    Q = np.stack([np.diag(d) for d in Qd])
    q = 0.3 * rng.standard_normal((N + 1, NX))
    Rd = rng.uniform(0.3, 1.5, (N, NU))
    R = np.stack([np.diag(d) for d in Rd])
    r = 0.2 * rng.standard_normal((N, NU))
    M = 0.02 * rng.standard_normal((N, NX, NU))
    # constraint rows: boxes on 2 states, both inputs, and one coupled row
    Dx = np.zeros((5, NX))
    Dx[0, 0] = 1.0
    Dx[1, 3] = 1.0
    Du = np.zeros((5, NU))
    Du[2, 0] = 1.0
    Du[3, 1] = 1.0
    Dx[4, 1] = 1.0
    Du[4, 0] = 1.0
    # feasible-but-active bounds: generous state boxes, tighter input boxes
    hi_x, hi_u = (0.8, 0.35) if tight else (50.0, 50.0)
    lb = np.tile(np.array([-hi_x, -hi_x, -hi_u, -hi_u, -2 * hi_x]), (N + 1, 1))
    ub = -lb
    # stage-0 state rows act on the fixed x0 -> disable
    lb[0, :2] = -np.inf
    ub[0, :2] = np.inf
    x0 = 0.15 * rng.standard_normal(NX)
    f32 = lambda a: jnp.asarray(a, jnp.float32)
    return BoxQP(
        dyn=LQRDynamics(f32(A), f32(B), f32(c)),
        cost=LQRCost(f32(Q), f32(q), f32(R), f32(r), f32(M)),
        Dx=f32(Dx), Du=f32(Du), lb=f32(lb), ub=f32(ub), x0=f32(x0),
        soft=jnp.full((5,), jnp.inf, jnp.float32),
    )


def dense_eq_solve(qp):
    """Equality-constrained QP (no boxes) via dense KKT in float64."""
    P, q, Acon, l, u = stack_boxqp(qp)
    m = N * NX  # only the equality rows
    Aeq, beq = Acon[:m], l[:m]
    nz = P.shape[0]
    K = np.block([[P, Aeq.T], [Aeq, np.zeros((m, m))]])
    rhs = np.concatenate([-q, beq])
    sol = np.linalg.solve(K, rhs)
    return unstack_solution(qp, sol[:nz])


def test_lqr_matches_dense_kkt():
    qp = random_qp(0)
    X, U = lqr_solve(qp.dyn, qp.cost, qp.x0)
    Xd, Ud = dense_eq_solve(qp)
    # float32 pipeline vs float64 KKT: verified exact (~1e-16) in f64
    np.testing.assert_allclose(np.asarray(U), Ud, atol=5e-3)
    np.testing.assert_allclose(np.asarray(X), Xd, atol=5e-3)


def test_riccati_assoc_matches_scan():
    qp = random_qp(1)
    f1 = riccati_factor_scan(qp.dyn, qp.cost)
    f2 = riccati_factor_assoc(qp.dyn, qp.cost)
    np.testing.assert_allclose(np.asarray(f1.K), np.asarray(f2.K), atol=3e-4)
    np.testing.assert_allclose(np.asarray(f1.Vc), np.asarray(f2.Vc), atol=3e-4)
    X1, U1 = lqr_solve(qp.dyn, qp.cost, qp.x0, "scan")
    X2, U2 = lqr_solve(qp.dyn, qp.cost, qp.x0, "assoc")
    np.testing.assert_allclose(np.asarray(U1), np.asarray(U2), atol=5e-4)


@pytest.mark.parametrize("seed", [2, 3, 4])
def test_admm_matches_oracle(seed):
    qp = random_qp(seed)
    cfg = SolverConfig(max_iter=400, eps_abs=1e-6, eps_rel=1e-6, rho_interval=50)
    sol = admm_solve(qp, cfg)
    assert bool(sol.converged)
    P, q, Acon, l, u = stack_boxqp(qp)
    ref = osqp_ref_solve(P, q, Acon, l, u, OsqpRefSettings())
    assert ref.converged
    Xr, Ur = unstack_solution(qp, ref.x)
    np.testing.assert_allclose(np.asarray(sol.U), Ur, atol=2e-3)
    obj = float(qp_objective(qp, sol.X, sol.U))
    # oracle objective excludes the constant x0 cost terms; compare on its z
    obj_ref = float(
        qp_objective(qp, jnp.asarray(Xr, jnp.float32), jnp.asarray(Ur, jnp.float32))
    )
    assert abs(obj - obj_ref) < 1e-3 * max(1.0, abs(obj_ref))


def test_admm_constraints_respected():
    qp = random_qp(5)
    cfg = SolverConfig(max_iter=400, eps_abs=1e-6, eps_rel=1e-6)
    sol = admm_solve(qp, cfg)
    Uext = jnp.concatenate([sol.U, jnp.zeros((1, NU), jnp.float32)])
    w = sol.X @ qp.Dx.T + Uext @ qp.Du.T
    viol = jnp.maximum(w - qp.ub, qp.lb - w).max()
    assert float(viol) < 5e-4


def test_admm_single_matches_batched_path():
    qp = random_qp(6)
    cfg = SolverConfig(max_iter=400, eps_abs=1e-6, eps_rel=1e-6, rho_interval=50)
    s1 = admm_solve(qp, cfg)
    s2 = admm_solve_single(qp, cfg)
    assert bool(s2.converged)
    np.testing.assert_allclose(np.asarray(s1.U), np.asarray(s2.U), atol=1e-3)


def test_batched_equivalence():
    """vmap of B identical problems == B copies of the single solve
    (SURVEY.md §4.4 — catches batching bugs)."""
    qp = random_qp(7)
    cfg = SolverConfig(max_iter=100)
    single = admm_solve(qp, cfg)
    B = 4
    qp_b = jax.tree.map(lambda a: jnp.broadcast_to(a, (B,) + a.shape), qp)
    batched = jax.vmap(lambda q: admm_solve(q, cfg))(qp_b)
    # vmap lowers to different (batched) kernels, so bit-exactness is not
    # guaranteed; near-machine-eps agreement still catches batching bugs.
    for i in range(B):
        np.testing.assert_allclose(
            np.asarray(batched.U[i]), np.asarray(single.U), atol=1e-5
        )


def test_admm_unconstrained_equals_lqr():
    qp = random_qp(8, tight=False)
    cfg = SolverConfig(max_iter=200, eps_abs=1e-7, eps_rel=1e-7)
    sol = admm_solve(qp, cfg)
    X, U = lqr_solve(qp.dyn, qp.cost, qp.x0)
    np.testing.assert_allclose(np.asarray(sol.U), np.asarray(U), atol=2e-3)


def test_primal_infeasibility_flagged():
    """Unreachable hard box => primal_infeasible flag (dual settles while
    the primal residual stays stuck far above tolerance)."""
    qp = random_qp(2)
    cfg = SolverConfig(max_iter=400)
    assert not bool(admm_solve(qp, cfg).primal_infeasible)
    qp_bad = qp._replace(lb=qp.lb.at[-1, 0].set(5.0), ub=qp.ub.at[-1, 0].set(6.0))
    sol = admm_solve(qp_bad, cfg)
    assert not bool(sol.converged)
    assert bool(sol.primal_infeasible)


def test_warm_start_reduces_iterations():
    qp = random_qp(9)
    cfg = SolverConfig(max_iter=400, eps_abs=1e-6, eps_rel=1e-6)
    cold = admm_solve_single(qp, cfg)
    warm = admm_solve_single(qp, cfg, warm=(cold.s, cold.lam, cold.X, cold.U))
    assert int(warm.iters) <= int(cold.iters)
    assert int(warm.iters) <= 2 * cfg.check_termination
