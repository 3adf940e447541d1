"""Batched ADMM with OSQP semantics; x-update = Riccati affine sweep.

TPU-native replacement for the OSQP C core (SURVEY.md §2.1): same splitting
algorithm (rho-penalized projection on box constraints, sigma proximal term,
alpha over-relaxation, eps_abs/eps_rel termination, adaptive rho with
refactorization — SURVEY.md §3.2), but the equality (dynamics) block is
eliminated *exactly* every iteration by the Riccati factorization instead of
being part of a generic sparse KKT. The factorization is computed once per
rho value and reused across iterations — the analog of OSQP caching its
LDL^T factor.

Problem (block form; produced by engine/assembly.py):

    min  sum_k stage_cost(x_k, u_k)        (LQRCost, on the augmented state)
    s.t. x_{k+1} = A_k x_k + B_k u_k + c_k   (hard, eliminated by Riccati)
         l_k <= Dx x_k + Du u_k <= u_k       (ADMM box splitting)

Two drivers:

- ``admm_solve``        — fixed iteration count, static shapes: the batched /
                          vmapped path (SURVEY.md §7 L4 "fixed-count for
                          batched").
- ``admm_solve_single`` — early-exit ``lax.while_loop`` checking OSQP
                          termination every ``check_termination`` iterations:
                          the low-latency single-scenario path.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.config import SolverConfig
from .riccati import (
    LQRCost,
    LQRDynamics,
    RiccatiFactors,
    lqr_linear_solve,
    riccati_factor,
)

_RHO_MIN = 1e-4
_RHO_MAX = 1e3
_RHO_TOL = 5.0  # OSQP adaptive_rho_tolerance


class BoxQP(NamedTuple):
    """Block-structured MPC QP (all arrays already on the augmented state)."""

    dyn: LQRDynamics        # A (N,nx,nx), B (N,nx,nu), c (N,nx)
    cost: LQRCost           # Q (N+1,..), q, R, r, M — the *tracking* cost
    Dx: jnp.ndarray         # (nc, nx) constraint rows, state part
    Du: jnp.ndarray         # (nc, nu) constraint rows, input part
    lb: jnp.ndarray         # (N+1, nc)
    ub: jnp.ndarray         # (N+1, nc)
    x0: jnp.ndarray         # (nx,)
    # per-row softness: +inf = hard box; finite beta = quadratic penalty
    # beta/2 * dist(row, [lb,ub])^2 (SURVEY.md §5: soft e_y corridor so the
    # QP never hard-fails mid-lap). Shape (nc,).
    soft: jnp.ndarray


def hard_rows(nc: int, dtype=jnp.float32) -> jnp.ndarray:
    return jnp.full((nc,), jnp.inf, dtype)


class ADMMState(NamedTuple):
    X: jnp.ndarray          # (N+1, nx)
    U: jnp.ndarray          # (N, nu)
    s: jnp.ndarray          # (N+1, nc) split variable
    lam: jnp.ndarray        # (N+1, nc) dual
    r_prim: jnp.ndarray     # scalar
    r_dual: jnp.ndarray     # scalar
    eps_prim: jnp.ndarray   # scalar
    eps_dual: jnp.ndarray   # scalar
    # plain False, not jnp.asarray(False): a module-level array would
    # initialise the XLA backend at import time, which breaks
    # jax.distributed.initialize() in multi-process runtimes
    primal_infeasible: jnp.ndarray = False  # certificate flag


class ADMMSolution(NamedTuple):
    X: jnp.ndarray
    U: jnp.ndarray
    s: jnp.ndarray
    lam: jnp.ndarray
    r_prim: jnp.ndarray
    r_dual: jnp.ndarray
    converged: jnp.ndarray  # bool scalar
    # int32 iterations actually informative. Semantics are CADENCE-QUANTIZED
    # across backends (round-2 advisor finding, documented invariant):
    #   - solver/admm.py: exact first iteration at which termination held,
    #     checked every `rho_interval`-chunked inner iteration.
    #   - ops/admm_kernel.py: exact, checked per iteration; lanes first
    #     converging on the final (out-of-loop) iteration report max_iter —
    #     the same value the exact check would produce.
    #   - ops/megastep_kernel.py: checked every `check_termination`
    #     iterations (chunk boundary), so a lane converging mid-chunk
    #     reports the NEXT chunk boundary — iters here can exceed the exact
    #     done-at by at most check_termination - 1. Exactness there would
    #     cost the straight-line hot loop (PERF.md round-3 cadence finding).
    iters: jnp.ndarray
    rho: jnp.ndarray        # final rho
    primal_infeasible: jnp.ndarray = False  # OSQP certificate (see note above)


def _folded_cost(qp: BoxQP, rho, sigma) -> LQRCost:
    """Fold the (constant-per-rho) ADMM quadratic penalties into the cost."""
    nx = qp.Dx.shape[1]
    nu = qp.Du.shape[1]
    Ix = jnp.eye(nx, dtype=qp.Dx.dtype)
    Iu = jnp.eye(nu, dtype=qp.Du.dtype)
    DxDx = qp.Dx.T @ qp.Dx
    DuDu = qp.Du.T @ qp.Du
    DxDu = qp.Dx.T @ qp.Du
    Q = qp.cost.Q + sigma * Ix + rho * DxDx
    R = qp.cost.R + sigma * Iu + rho * DuDu
    M = qp.cost.M + rho * DxDu
    return LQRCost(Q=Q, q=qp.cost.q, R=R, r=qp.cost.r, M=M)


def _iterate(qp: BoxQP, fac: RiccatiFactors, cfg: SolverConfig, rho, st: ADMMState) -> ADMMState:
    N = qp.dyn.A.shape[0]
    v = st.s - st.lam / rho
    q_lin = qp.cost.q - rho * (v @ qp.Dx) - cfg.sigma * st.X
    r_lin = qp.cost.r - rho * (v[:N] @ qp.Du) - cfg.sigma * st.U
    X, U = lqr_linear_solve(fac, q_lin, r_lin, qp.x0)

    Uext = jnp.concatenate([U, jnp.zeros((1, U.shape[1]), U.dtype)], axis=0)
    w = X @ qp.Dx.T + Uext @ qp.Du.T
    w_rel = cfg.alpha * w + (1.0 - cfg.alpha) * st.s
    wl = w_rel + st.lam / rho
    clipped = jnp.clip(wl, qp.lb, qp.ub)
    # s-update: projection for hard rows; prox of the quadratic violation
    # penalty beta/2*dist(.,[l,u])^2 for soft rows (elementwise, branch-free)
    beta = jnp.minimum(qp.soft, 1e30)
    soft_s = (beta * clipped + rho * wl) / (beta + rho)
    s_new = jnp.where(jnp.isinf(qp.soft), clipped, soft_s)
    lam_new = st.lam + rho * (w_rel - s_new)

    # OSQP-style residuals / tolerances (inf norms in the z-space)
    r_prim = jnp.max(jnp.abs(w - s_new))
    ds = s_new - st.s
    r_dual = rho * jnp.maximum(jnp.max(jnp.abs(ds @ qp.Dx)), jnp.max(jnp.abs(ds[:N] @ qp.Du)))
    eps_prim = cfg.eps_abs + cfg.eps_rel * jnp.maximum(jnp.max(jnp.abs(w)), jnp.max(jnp.abs(s_new)))
    dty = jnp.maximum(jnp.max(jnp.abs(lam_new @ qp.Dx)), jnp.max(jnp.abs(lam_new[:N] @ qp.Du)))
    eps_dual = cfg.eps_abs + cfg.eps_rel * dty

    # Primal-infeasibility signal. OSQP's delta-y certificate does not
    # transfer to this reduced splitting (the dynamics are eliminated, so
    # D'dy only needs to vanish ON the reachable manifold, which a cheap
    # z-space norm cannot test). The practically-useful detector for MPC is:
    # the dual residual has converged (iterates settled) while the primal
    # residual is stuck far above tolerance — the projection cannot reach
    # the reachable manifold. Consumers (loop/mpc.py fallback, sweep
    # metrics) treat it as "this stage's constraint set is unreachable".
    pinf = jnp.logical_and(
        r_dual <= eps_dual,
        r_prim > 1e2 * eps_prim,
    )
    return ADMMState(X, U, s_new, lam_new, r_prim, r_dual, eps_prim, eps_dual,
                     pinf)


def _init_state(qp: BoxQP, warm) -> ADMMState:
    N, nx = qp.dyn.A.shape[0], qp.Dx.shape[1]
    nu = qp.Du.shape[1]
    nc = qp.Dx.shape[0]
    f32 = qp.dyn.A.dtype
    if warm is None:
        s = jnp.clip(jnp.zeros((N + 1, nc), f32), qp.lb, qp.ub)
        lam = jnp.zeros((N + 1, nc), f32)
        X = jnp.zeros((N + 1, nx), f32)
        U = jnp.zeros((N, nu), f32)
    else:
        s, lam, X, U = warm
        s = jnp.clip(s, qp.lb, qp.ub)
    big = jnp.asarray(jnp.inf, f32)
    return ADMMState(X, U, s, lam, big, big, jnp.asarray(0.0, f32), jnp.asarray(0.0, f32))


def _new_rho(rho, st: ADMMState):
    """OSQP adaptive rho: scale by sqrt of scaled-residual ratio."""
    ratio = jnp.sqrt(
        (st.r_prim / jnp.maximum(st.eps_prim, 1e-12))
        / jnp.maximum(st.r_dual / jnp.maximum(st.eps_dual, 1e-12), 1e-12)
    )
    rho_new = jnp.clip(rho * ratio, _RHO_MIN, _RHO_MAX)
    adapt = jnp.logical_or(ratio > _RHO_TOL, ratio < 1.0 / _RHO_TOL)
    return jnp.where(adapt, rho_new, rho)


def _converged(st: ADMMState):
    return jnp.logical_and(st.r_prim <= st.eps_prim, st.r_dual <= st.eps_dual)


def admm_solve(
    qp: BoxQP,
    cfg: SolverConfig,
    warm: Optional[Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]] = None,
    rho0: Optional[jnp.ndarray] = None,
) -> ADMMSolution:
    """Fixed-iteration ADMM (batched path: ``jax.vmap(admm_solve, ...)``).

    Runs ``max_iter`` iterations structured as chunks of ``rho_interval``;
    rho is adapted (and the Riccati refactorized) once per chunk —
    unconditional refactorization keeps shapes/control flow static under
    vmap while matching OSQP's refactor-on-rho-update behavior.

    ``rho0`` warm-starts the penalty (e.g. carried across receding-horizon
    steps): with ``rho_interval=0`` that makes exactly ONE factorization
    per solve while rho still adapts once per solve for the next one.
    """
    interval = cfg.rho_interval if cfg.rho_interval > 0 else cfg.max_iter
    n_chunks = max(1, -(-cfg.max_iter // interval))

    st0 = _init_state(qp, warm)
    if rho0 is None:
        rho0 = jnp.asarray(cfg.rho, qp.dyn.A.dtype)
    else:
        rho0 = jnp.asarray(rho0, qp.dyn.A.dtype)

    def chunk(carry, _):
        st, rho, iters, done_at = carry
        fac = riccati_factor(qp.dyn, _folded_cost(qp, rho, cfg.sigma), cfg.riccati)

        def inner(c, _):
            st_i, it, da = c
            st_i = _iterate(qp, fac, cfg, rho, st_i)
            it = it + 1
            da = jnp.where(jnp.logical_and(da < 0, _converged(st_i)), it, da)
            return (st_i, it, da), None

        (st, iters, done_at), _ = jax.lax.scan(inner, (st, iters, done_at), None, length=interval)
        rho = _new_rho(rho, st)
        return (st, rho, iters, done_at), None

    init = (st0, rho0, jnp.asarray(0, jnp.int32), jnp.asarray(-1, jnp.int32))
    (st, rho, iters, done_at), _ = jax.lax.scan(chunk, init, None, length=n_chunks)

    return ADMMSolution(
        X=st.X, U=st.U, s=st.s, lam=st.lam,
        r_prim=st.r_prim, r_dual=st.r_dual,
        converged=_converged(st),
        iters=jnp.where(done_at > 0, done_at, iters),
        rho=rho,
        primal_infeasible=st.primal_infeasible,
    )


def admm_solve_single(
    qp: BoxQP,
    cfg: SolverConfig,
    warm: Optional[Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]] = None,
) -> ADMMSolution:
    """Early-exit ADMM for the low-latency single-scenario path.

    ``lax.while_loop`` over chunks of ``check_termination`` iterations; exits
    as soon as OSQP termination holds. Not reverse-differentiable (none
    needed — the solver sits at the control boundary).
    """
    check = max(1, cfg.check_termination)
    st0 = _init_state(qp, warm)
    rho0 = jnp.asarray(cfg.rho, qp.dyn.A.dtype)
    interval = cfg.rho_interval if cfg.rho_interval > 0 else cfg.max_iter

    def cond(carry):
        st, rho, it = carry
        return jnp.logical_and(it < cfg.max_iter, jnp.logical_not(_converged(st)))

    def body(carry):
        st, rho, it = carry
        fac = riccati_factor(qp.dyn, _folded_cost(qp, rho, cfg.sigma), cfg.riccati)

        def inner(c, _):
            return (_iterate(qp, fac, cfg, rho, c)), None

        st, _ = jax.lax.scan(inner, st, None, length=check)
        it = it + check
        rho = jnp.where((it % interval) < check, _new_rho(rho, st), rho)
        return (st, rho, it)

    st, rho, it = jax.lax.while_loop(cond, body, (st0, rho0, jnp.asarray(0, jnp.int32)))
    return ADMMSolution(
        X=st.X, U=st.U, s=st.s, lam=st.lam,
        r_prim=st.r_prim, r_dual=st.r_dual,
        converged=_converged(st), iters=it, rho=rho,
        primal_infeasible=st.primal_infeasible,
    )


def qp_objective(qp: BoxQP, X: jnp.ndarray, U: jnp.ndarray):
    """0.5 z'Pz + q'z of the tracking cost (diagnostics / oracle checks)."""
    N = qp.dyn.A.shape[0]
    c = qp.cost
    sx = 0.5 * jnp.einsum("ki,kij,kj->", X, c.Q, X) + jnp.einsum("ki,ki->", c.q, X)
    su = 0.5 * jnp.einsum("ki,kij,kj->", U, c.R, U) + jnp.einsum("ki,ki->", c.r, U)
    sm = jnp.einsum("ki,kij,kj->", X[:N], c.M, U)
    return sx + su + sm
