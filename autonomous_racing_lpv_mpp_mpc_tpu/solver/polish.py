"""Solution polishing: OSQP's active-set refinement, TPU-native.

OSQP's `polish` step (SURVEY.md §3.2 "ADMM iterate (rho updates, polish)"):
after ADMM terminates at eps-accuracy, guess the active set from the dual
signs (y_i < 0 -> lower bound active, y_i > 0 -> upper), solve the
equality-constrained QP restricted to those rows through a
delta-regularized KKT system with iterative refinement, and keep the result
only if it reduces the KKT residual. This recovers near-machine-precision
solutions from a loosely converged ADMM run — the tight-tolerance
single-solve path (ROADMAP "solution polishing").

Implementation: the block-structured :class:`BoxQP` is stacked to a dense
QP (same layout as the numpy oracle's ``stack_boxqp``, z = [x_1..x_N,
u_0..u_{N-1}]) at trace time — the MPC instances are a few hundred
variables, well inside a single dense LU on-chip. Inactive box rows are
zeroed in the KKT (their -delta diagonal then pins their dual to 0),
keeping shapes static so the whole polish jits and vmaps.

Caveat: rows with a finite softness (quadratic-penalty corridor rows) are
treated as never-active; the polish is exact whenever those rows are
strictly feasible at the solution (the normal case — the soft corridor
only activates in emergencies).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from .admm import ADMMSolution, BoxQP


class StackedQP(NamedTuple):
    P: jnp.ndarray    # (nz, nz)
    q: jnp.ndarray    # (nz,)
    A: jnp.ndarray    # (m, nz) — dynamics rows then box rows
    l: jnp.ndarray    # (m,)
    u: jnp.ndarray    # (m,)
    n_eq: int         # leading rows of A that are equalities (dynamics)


def stack_boxqp_jax(qp: BoxQP) -> StackedQP:
    """Dense stacked form of a BoxQP (JAX mirror of oracle/stack.py)."""
    A_, B_, c_ = qp.dyn.A, qp.dyn.B, qp.dyn.c
    N, nx, nu = B_.shape
    nc = qp.Dx.shape[0]
    nz = N * nx + N * nu
    f = A_.dtype

    def xi(k):
        return slice((k - 1) * nx, k * nx)

    def ui(k):
        return slice(N * nx + k * nu, N * nx + (k + 1) * nu)

    P = jnp.zeros((nz, nz), f)
    qv = jnp.zeros((nz,), f)
    for k in range(1, N + 1):
        P = P.at[xi(k), xi(k)].set(qp.cost.Q[k])
        qv = qv.at[xi(k)].set(qp.cost.q[k])
    for k in range(N):
        P = P.at[ui(k), ui(k)].set(qp.cost.R[k])
        qv = qv.at[ui(k)].set(qp.cost.r[k])
    for k in range(1, N):
        P = P.at[xi(k), ui(k)].set(qp.cost.M[k])
        P = P.at[ui(k), xi(k)].set(qp.cost.M[k].T)
    qv = qv.at[ui(0)].add(qp.cost.M[0].T @ qp.x0)

    Aeq = jnp.zeros((N * nx, nz), f)
    beq = jnp.zeros((N * nx,), f)
    I = jnp.eye(nx, dtype=f)
    for k in range(N):
        rows = slice(k * nx, (k + 1) * nx)
        Aeq = Aeq.at[rows, xi(k + 1)].set(I)
        Aeq = Aeq.at[rows, ui(k)].set(-B_[k])
        beq = beq.at[rows].set(c_[k])
        if k == 0:
            beq = beq.at[rows].add(A_[0] @ qp.x0)
        else:
            Aeq = Aeq.at[rows, xi(k)].set(-A_[k])

    Ain = jnp.zeros(((N + 1) * nc, nz), f)
    lin = jnp.zeros(((N + 1) * nc,), f)
    uin = jnp.zeros(((N + 1) * nc,), f)
    for k in range(N + 1):
        rows = slice(k * nc, (k + 1) * nc)
        if k == 0:
            Ain = Ain.at[rows, ui(0)].set(qp.Du)
            lin = lin.at[rows].set(qp.lb[0] - qp.Dx @ qp.x0)
            uin = uin.at[rows].set(qp.ub[0] - qp.Dx @ qp.x0)
        elif k < N:
            Ain = Ain.at[rows, xi(k)].set(qp.Dx)
            Ain = Ain.at[rows, ui(k)].set(qp.Du)
            lin = lin.at[rows].set(qp.lb[k])
            uin = uin.at[rows].set(qp.ub[k])
        else:
            Ain = Ain.at[rows, xi(N)].set(qp.Dx)
            lin = lin.at[rows].set(qp.lb[N])
            uin = uin.at[rows].set(qp.ub[N])

    return StackedQP(
        P=P, q=qv,
        A=jnp.concatenate([Aeq, Ain], axis=0),
        l=jnp.concatenate([beq, lin]),
        u=jnp.concatenate([beq, uin]),
        n_eq=N * nx,
    )


def kkt_residuals(st: StackedQP, z, y) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(r_prim, r_dual) inf-norm KKT residuals of the stacked QP."""
    Az = st.A @ z
    r_prim = jnp.max(jnp.maximum(Az - st.u, 0.0) + jnp.maximum(st.l - Az, 0.0))
    r_dual = jnp.max(jnp.abs(st.P @ z + st.q + st.A.T @ y))
    return r_prim, r_dual


class PolishResult(NamedTuple):
    X: jnp.ndarray          # (N+1, nx), X[0] = x0
    U: jnp.ndarray          # (N, nu)
    lam: jnp.ndarray        # (N+1, nc) polished box duals (original rows)
    r_prim: jnp.ndarray
    r_dual: jnp.ndarray
    improved: jnp.ndarray   # bool — polished iterate beat the ADMM one


def _solution_zy(qp: BoxQP, sol: ADMMSolution, st: StackedQP):
    N, nx, nu = qp.dyn.B.shape
    z = jnp.concatenate([sol.X[1:].reshape(-1), sol.U.reshape(-1)])
    # duals: equality rows unknown from the reduced splitting -> recover as
    # the least-squares stationarity fit is overkill; use zeros (they don't
    # enter r_prim, and the dual residual comparison is done consistently
    # for both iterates through the SAME recovery below).
    y_box = sol.lam.reshape(-1)
    return z, y_box


def _recover_eq_duals(st: StackedQP, z, y_box):
    """Least-squares equality duals: argmin_nu ||Pz + q + Aeq' nu + Ain' y||."""
    n_eq = st.n_eq
    Aeq = st.A[:n_eq]
    rhs = -(st.P @ z + st.q + st.A[n_eq:].T @ y_box)
    # (Aeq Aeq') nu = Aeq rhs ; Aeq has full row rank for a controllable model
    G = Aeq @ Aeq.T + 1e-8 * jnp.eye(n_eq, dtype=z.dtype)
    nu = jnp.linalg.solve(G, Aeq @ rhs)
    return nu


def polish(qp: BoxQP, sol: ADMMSolution, delta: float = 1e-6,
           refine_iters: int = 3) -> PolishResult:
    """Active-set polish of an ADMM solution (OSQP semantics).

    Jittable and vmappable (static shapes; the active set enters as a
    mask). Returns the polished primal/dual iterate when it reduces the
    max KKT residual, otherwise the original one.
    """
    st = stack_boxqp_jax(qp)
    N, nx, nu = qp.dyn.B.shape
    nc = qp.Dx.shape[0]
    nz = st.P.shape[0]
    m = st.A.shape[0]
    f = st.P.dtype

    z0, y_box0 = _solution_zy(qp, sol, st)
    nu0 = _recover_eq_duals(st, z0, y_box0)
    y_full0 = jnp.concatenate([nu0, y_box0])
    rp0, rd0 = kkt_residuals(st, z0, y_full0)

    # Active set: OSQP uses the dual sign alone (y<0 -> lower, y>0 ->
    # upper), but at an eps-loose ADMM iterate the inactive rows carry
    # small nonzero duals of arbitrary sign; requiring the split variable
    # to actually SIT on the bound (it lands there exactly via the
    # projection) makes detection sharp. Wrong guesses are still caught by
    # the acceptance check below (residuals + dual-sign consistency).
    hard = jnp.isinf(qp.soft)                     # (nc,)
    hard_full = jnp.tile(hard, N + 1)             # box rows only
    lam_flat = sol.lam.reshape(-1)
    s_flat = sol.s.reshape(-1)
    lbf, ubf = qp.lb.reshape(-1), qp.ub.reshape(-1)  # original row space
    # per-bound nearness tolerances (a tolerance scaled by |lb| alone would
    # be overly tight for upper rows with small lb but large |ub|)
    tol_lo = 1e-3 * (1.0 + jnp.abs(jnp.where(jnp.isfinite(lbf), lbf, 0.0)))
    tol_up = 1e-3 * (1.0 + jnp.abs(jnp.where(jnp.isfinite(ubf), ubf, 0.0)))
    near_lo = s_flat - lbf <= tol_lo
    near_up = ubf - s_flat <= tol_up
    act_lo = hard_full & (lam_flat < 0) & near_lo & jnp.isfinite(lbf)
    act_up = hard_full & (lam_flat > 0) & near_up & jnp.isfinite(ubf)
    active = jnp.logical_or(act_lo, act_up)
    b_box = jnp.where(act_lo, st.l[st.n_eq:], st.u[st.n_eq:])
    b_box = jnp.where(active, b_box, 0.0)

    eq_mask = jnp.concatenate([jnp.ones((st.n_eq,), bool), active])
    A_act = jnp.where(eq_mask[:, None], st.A, 0.0)
    b_act = jnp.concatenate([st.l[: st.n_eq], b_box])

    K = jnp.block([
        [st.P + delta * jnp.eye(nz, dtype=f), A_act.T],
        [A_act, -delta * jnp.eye(m, dtype=f)],
    ])
    rhs = jnp.concatenate([-st.q, b_act])
    lu, piv = jax.scipy.linalg.lu_factor(K)
    sol_v = jax.scipy.linalg.lu_solve((lu, piv), rhs)

    # iterative refinement against the UNregularized KKT (OSQP's scheme)
    def refine(sol_v, _):
        z, y = sol_v[:nz], sol_v[nz:]
        res = rhs - jnp.concatenate([
            st.P @ z + A_act.T @ y,
            A_act @ z,
        ])
        return sol_v + jax.scipy.linalg.lu_solve((lu, piv), res), None

    sol_v, _ = jax.lax.scan(refine, sol_v, None, length=refine_iters)
    z1, y1 = sol_v[:nz], sol_v[nz:]
    y1 = jnp.concatenate([y1[: st.n_eq], jnp.where(eq_mask[st.n_eq:], y1[st.n_eq:], 0.0)])
    rp1, rd1 = kkt_residuals(st, z1, y1)

    # acceptance: KKT residuals improved AND the polished duals keep the
    # sign their activity guess implies (a wrong-sign multiplier means the
    # row should not have been active — stationarity alone cannot see it).
    y1_box = y1[st.n_eq:]
    y_tol = 1e-5 * (1.0 + jnp.max(jnp.abs(y1_box)))
    signs_ok = jnp.all(
        jnp.where(act_lo, y1_box <= y_tol, True)
        & jnp.where(act_up, y1_box >= -y_tol, True)
    )
    better = signs_ok & (jnp.maximum(rp1, rd1) < jnp.maximum(rp0, rd0))
    z = jnp.where(better, z1, z0)
    y_box = jnp.where(better, y1[st.n_eq:], y_box0)
    X = jnp.concatenate([qp.x0[None], z[: N * nx].reshape(N, nx)], axis=0)
    U = z[N * nx:].reshape(N, nu)
    return PolishResult(
        X=X, U=U, lam=y_box.reshape(N + 1, nc),
        r_prim=jnp.where(better, rp1, rp0),
        r_dual=jnp.where(better, rd1, rd0),
        improved=better,
    )
