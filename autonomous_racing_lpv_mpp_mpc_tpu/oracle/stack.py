"""Block-structured BoxQP -> dense stacked (P, q, A, l, u) for the oracle.

This reproduces what the reference's ``_buildQPMatrices`` does with
scipy.sparse (SURVEY.md §3.2: cost blkdiag + dynamics equality rows
[-I, A_k, B_k] + box rows), in dense numpy, so the oracle solves the *same*
QP the TPU solver sees. Decision ordering: z = [x_1..x_N, u_0..u_{N-1}].
"""

from __future__ import annotations

import numpy as np

from ..solver.admm import BoxQP


def stack_boxqp(qp: BoxQP):
    A_ = np.asarray(qp.dyn.A, dtype=np.float64)
    B_ = np.asarray(qp.dyn.B, dtype=np.float64)
    c_ = np.asarray(qp.dyn.c, dtype=np.float64)
    Q_ = np.asarray(qp.cost.Q, dtype=np.float64)
    q_ = np.asarray(qp.cost.q, dtype=np.float64)
    R_ = np.asarray(qp.cost.R, dtype=np.float64)
    r_ = np.asarray(qp.cost.r, dtype=np.float64)
    M_ = np.asarray(qp.cost.M, dtype=np.float64)
    Dx = np.asarray(qp.Dx, dtype=np.float64)
    Du = np.asarray(qp.Du, dtype=np.float64)
    lb = np.asarray(qp.lb, dtype=np.float64)
    ub = np.asarray(qp.ub, dtype=np.float64)
    x0 = np.asarray(qp.x0, dtype=np.float64)

    N, nx, nu = B_.shape
    nc = Dx.shape[0]
    nz = N * nx + N * nu

    def xi(k):  # columns of x_k, k in 1..N
        return slice((k - 1) * nx, k * nx)

    def ui(k):  # columns of u_k, k in 0..N-1
        return slice(N * nx + k * nu, N * nx + (k + 1) * nu)

    P = np.zeros((nz, nz))
    q = np.zeros(nz)
    for k in range(1, N + 1):
        P[xi(k), xi(k)] = Q_[k]
        q[xi(k)] = q_[k]
    for k in range(N):
        P[ui(k), ui(k)] = R_[k]
        q[ui(k)] = r_[k]
    for k in range(1, N):
        P[xi(k), ui(k)] = M_[k]
        P[ui(k), xi(k)] = M_[k].T
    q[ui(0)] += M_[0].T @ x0

    # equality rows: x_{k+1} - A_k x_k - B_k u_k = c_k (+ A_0 x0 for k=0)
    Aeq = np.zeros((N * nx, nz))
    beq = np.zeros(N * nx)
    for k in range(N):
        rows = slice(k * nx, (k + 1) * nx)
        Aeq[rows, xi(k + 1)] = np.eye(nx)
        Aeq[rows, ui(k)] = -B_[k]
        beq[rows] = c_[k]
        if k == 0:
            beq[rows] += A_[0] @ x0
        else:
            Aeq[rows, xi(k)] = -A_[k]

    # box rows: stage k pairs (x_k, u_k); k=0 uses fixed x0; k=N has no u
    Ain = np.zeros(((N + 1) * nc, nz))
    lin = np.zeros((N + 1) * nc)
    uin = np.zeros((N + 1) * nc)
    for k in range(N + 1):
        rows = slice(k * nc, (k + 1) * nc)
        if k == 0:
            Ain[rows, ui(0)] = Du
            lin[rows] = lb[0] - Dx @ x0
            uin[rows] = ub[0] - Dx @ x0
        elif k < N:
            Ain[rows, xi(k)] = Dx
            Ain[rows, ui(k)] = Du
            lin[rows] = lb[k]
            uin[rows] = ub[k]
        else:
            Ain[rows, xi(N)] = Dx
            lin[rows] = lb[N]
            uin[rows] = ub[N]

    Acon = np.vstack([Aeq, Ain])
    l = np.concatenate([beq, lin])
    u = np.concatenate([beq, uin])
    return P, q, Acon, l, u


def unstack_solution(qp: BoxQP, z: np.ndarray):
    """Oracle z -> (X (N+1,nx) with X[0]=x0, U (N,nu))."""
    N, nx, nu = np.asarray(qp.dyn.B).shape
    X = np.concatenate(
        [np.asarray(qp.x0, dtype=np.float64)[None], z[: N * nx].reshape(N, nx)], axis=0
    )
    U = z[N * nx:].reshape(N, nu)
    return X, U
