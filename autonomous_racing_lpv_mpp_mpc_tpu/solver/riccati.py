"""Riccati / LQR factorization of the equality-constrained QP core.

This is the TPU-native replacement for OSQP's sparse LDL^T KKT factorization
(SURVEY.md §2.1): the MPC QP's dynamics-equality block is block-tridiagonal,
so instead of generic sparse elimination (hostile to TPUs) it is factorized
by a Riccati sweep over the horizon — either sequentially with ``lax.scan``
(lowest latency at N<=20) or parallel-in-horizon with
``lax.associative_scan`` (O(log N) depth; SURVEY.md §2.2 "Horizon
parallelism", PAPERS.md piMPC / Parallel DP for Conic LQ Control).

Problem solved (per batch element):

    min  sum_{k=0}^{N-1} [ 1/2 x_k'Q_k x_k + q_k'x_k + 1/2 u_k'R_k u_k
                           + r_k'u_k + x_k'M_k u_k ]
         + 1/2 x_N'Q_N x_N + q_N'x_N
    s.t. x_{k+1} = A_k x_k + B_k u_k + c_k,   x_0 given.

Split into a quadratic *factor* step (gains K_k, Schur complements — depends
only on (A, B, Q, R, M)) and a cheap affine *solve* step (depends on the
linear terms q, r, c and x0). The ADMM loop (admm.py) re-uses one
factorization across all iterations because its penalty terms only move the
linear part — the direct analog of OSQP factorizing its KKT matrix once.

All functions are single-instance; batching is ``jax.vmap`` at the call
site, which XLA turns into batched small-matrix einsums.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class LQRDynamics(NamedTuple):
    A: jnp.ndarray   # (N, nx, nx)
    B: jnp.ndarray   # (N, nx, nu)
    c: jnp.ndarray   # (N, nx)


class LQRCost(NamedTuple):
    Q: jnp.ndarray   # (N+1, nx, nx)  index N = terminal
    q: jnp.ndarray   # (N+1, nx)
    R: jnp.ndarray   # (N, nu, nu)
    r: jnp.ndarray   # (N, nu)
    M: jnp.ndarray   # (N, nx, nu) cross term x'Mu


class RiccatiFactors(NamedTuple):
    """Everything the affine solve needs; quadratic data is folded in."""

    K: jnp.ndarray        # (N, nu, nx) feedback gains
    Huu_inv: jnp.ndarray  # (N, nu, nu)
    Hux: jnp.ndarray      # (N, nu, nx)
    Vc: jnp.ndarray       # (N, nx)  == V_{k+1} @ c_k (constant linear piece)
    A: jnp.ndarray        # (N, nx, nx)
    B: jnp.ndarray        # (N, nx, nu)
    c: jnp.ndarray        # (N, nx)


def _sym(X):
    return 0.5 * (X + jnp.swapaxes(X, -1, -2))


def riccati_factor_scan(dyn: LQRDynamics, cost: LQRCost) -> RiccatiFactors:
    """Sequential backward Riccati factorization via ``lax.scan``."""
    N = dyn.A.shape[0]

    def backward(carry, inp):
        V = carry
        A, B, c, Q, R, M = inp
        VB = V @ B
        Huu = R + B.T @ VB
        Hux = M.T + B.T @ V @ A
        Huu_inv = jnp.linalg.inv(_sym(Huu))
        K = -Huu_inv @ Hux
        Vk = _sym(Q + A.T @ V @ A + Hux.T @ K)
        out = (K, Huu_inv, Hux, V @ c)
        return Vk, out

    inputs = (dyn.A, dyn.B, dyn.c, cost.Q[:-1], cost.R, cost.M)
    _, (K, Huu_inv, Hux, Vc) = jax.lax.scan(
        backward, cost.Q[-1], inputs, reverse=True
    )
    return RiccatiFactors(K, Huu_inv, Hux, Vc, dyn.A, dyn.B, dyn.c)


def riccati_factor_assoc(dyn: LQRDynamics, cost: LQRCost) -> RiccatiFactors:
    """Parallel-in-horizon factorization via ``lax.associative_scan``.

    Uses the value-function composition elements of parallel dynamic
    programming (Sarkka & Garcia-Fernandez, "Temporal Parallelization of
    Dynamic Programming and Linear Quadratic Control"; PAPERS.md piMPC):
    each stage is an element e_k = (A, b, C, eta, J) representing the map

        P  ->  J + A'(P^{-1} + C)^{-1} A          (value Hessian pullback)

    and a reverse cumulative combine yields all suffix value Hessians
    V_{k+1} in O(log N) depth. Cross terms M are removed first by
    completing the square (u = w - R^{-1} M' x). Gains are then formed
    stage-locally. Numerically verified against the scan version in
    tests/test_riccati.py.
    """
    N, nx, _ = dyn.A.shape
    Rinv = jnp.linalg.inv(_sym(cost.R))
    # complete the square: canonical stages without cross terms
    F = dyn.A - jnp.einsum("kiu,kuv,kjv->kij", dyn.B, Rinv, cost.M)
    Xq = _sym(cost.Q[:-1] - jnp.einsum("kiu,kuv,kjv->kij", cost.M, Rinv, cost.M))
    C = jnp.einsum("kiu,kuv,kjv->kij", dyn.B, Rinv, dyn.B)

    I = jnp.eye(nx, dtype=dyn.A.dtype)

    # elements: stages 0..N-1 then the terminal element (A=0, C=0, J=Q_N)
    elem_A = jnp.concatenate([F, jnp.zeros((1, nx, nx), dyn.A.dtype)], axis=0)
    elem_C = jnp.concatenate([C, jnp.zeros((1, nx, nx), dyn.A.dtype)], axis=0)
    elem_J = jnp.concatenate([Xq, cost.Q[-1:][:, :, :]], axis=0)

    # linear terms are handled in the affine solve pass, so elements only
    # need the (A, C, J) quadratic part. NOTE: under reverse=True,
    # associative_scan flips the sequence, so the FIRST argument is the
    # later-in-time aggregate and the SECOND is the earlier element
    # (verified numerically; see tests/test_solver.py).
    def combine3(e_later, e_earlier):
        Ai, Ci, Ji = e_earlier
        Aj, Cj, Jj = e_later
        # T_i o T_j maps P -> Ji + Ai'((Jj + Aj'(P^{-1}+Cj)^{-1}Aj)^{-1} + Ci)^{-1} Ai
        # closed form (parallel DP combination):
        M1 = jnp.linalg.solve(I + Ci @ Jj, Ai)          # (I + Ci Jj)^{-1} Ai
        M2 = jnp.linalg.solve(I + Jj @ Ci, Jj)          # (I + Jj Ci)^{-1} Jj
        A_new = Aj @ M1
        C_new = _sym(Aj @ jnp.linalg.solve(I + Ci @ Jj, Ci) @ jnp.swapaxes(Aj, -1, -2) + Cj)
        J_new = _sym(jnp.swapaxes(Ai, -1, -2) @ M2 @ Ai + Ji)
        return (A_new, C_new, J_new)

    elems = (elem_A, elem_C, elem_J)
    suffix = jax.lax.associative_scan(combine3, elems, reverse=True, axis=0)
    # suffix[k] aggregates stages k..N => its J is V_k. We need V_{k+1}.
    V_next = suffix[2][1:]            # (N, nx, nx): V_{k+1} for k=0..N-1

    VB = jnp.einsum("kij,kju->kiu", V_next, dyn.B)
    Huu = cost.R + jnp.einsum("kju,kji->kui", dyn.B, VB)
    Hux = jnp.swapaxes(cost.M, -1, -2) + jnp.einsum(
        "kju,kji->kui", dyn.B, jnp.einsum("kij,kjl->kil", V_next, dyn.A)
    )
    Huu_inv = jnp.linalg.inv(_sym(Huu))
    K = -jnp.einsum("kuv,kvi->kui", Huu_inv, Hux)
    Vc = jnp.einsum("kij,kj->ki", V_next, dyn.c)
    return RiccatiFactors(K, Huu_inv, Hux, Vc, dyn.A, dyn.B, dyn.c)


def riccati_factor(dyn: LQRDynamics, cost: LQRCost, method: str = "scan") -> RiccatiFactors:
    if method == "scan":
        return riccati_factor_scan(dyn, cost)
    if method == "assoc":
        return riccati_factor_assoc(dyn, cost)
    raise ValueError(f"unknown riccati method: {method!r}")


def lqr_linear_solve(
    fac: RiccatiFactors,
    q: jnp.ndarray,       # (N+1, nx)
    r: jnp.ndarray,       # (N, nu)
    x0: jnp.ndarray,      # (nx,)
):
    """Affine backward/forward sweep given a factorization.

    Returns (X, U): X (N+1, nx) with X[0] = x0, U (N, nu).
    This is the per-ADMM-iteration hot path — two O(N nx^2) scans.
    """

    def bwd(v_next, inp):
        K, Huu_inv, Hux, Vc, A, B, q_k, r_k = inp
        w = Vc + v_next
        h_u = r_k + B.T @ w
        d = -Huu_inv @ h_u
        v = q_k + A.T @ w + Hux.T @ d
        return v, d

    inputs = (fac.K, fac.Huu_inv, fac.Hux, fac.Vc, fac.A, fac.B, q[:-1], r)
    _, d = jax.lax.scan(bwd, q[-1], inputs, reverse=True)

    def fwd(x, inp):
        K, d_k, A, B, c = inp
        u = K @ x + d_k
        x_next = A @ x + B @ u + c
        return x_next, (x_next, u)

    _, (Xs, U) = jax.lax.scan(fwd, x0, (fac.K, d, fac.A, fac.B, fac.c))
    X = jnp.concatenate([x0[None], Xs], axis=0)
    return X, U


def lqr_solve(dyn: LQRDynamics, cost: LQRCost, x0: jnp.ndarray, method: str = "scan"):
    """One-shot equality-constrained solve (factor + affine sweep)."""
    fac = riccati_factor(dyn, cost, method)
    return lqr_linear_solve(fac, cost.q, cost.r, x0)
