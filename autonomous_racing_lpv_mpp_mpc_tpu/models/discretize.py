"""Discretization of continuous-time (A, B[, c]) stage matrices.

Reference parity (SURVEY.md §2 "LPV model builder"): the reference uses
forward-Euler ``A_d = I + dt*A, B_d = dt*B``. ``discretize_order2`` adds a
2nd-order Taylor option used by the discretization-consistency unit test
(SURVEY.md §4.1).
"""

from __future__ import annotations

import jax.numpy as jnp


def discretize_euler(A, B, dt, c=None):
    n = A.shape[-1]
    I = jnp.eye(n, dtype=A.dtype)
    Ad = I + dt * A
    Bd = dt * B
    if c is None:
        return Ad, Bd
    return Ad, Bd, dt * c


def discretize_expm(A, B, dt, c=None, order: int = 6, squarings: int = 4):
    """Exact (matrix-exponential) discretization via the Van Loan block.

    expm(dt * [[A, B, c], [0, 0, 0]]) has Ad in the top-left, Bd (and cd) in
    the top-right block. Computed with a fixed-order Taylor series plus
    scaling-and-squaring (static structure — jit/vmap friendly small-matrix
    matmuls). Unlike forward Euler, a stable continuous A always yields a
    stable Ad — essential for the stiff low-speed lateral dynamics of the
    1:10 car (|dt*lambda| can exceed 2 at vx < 1 m/s).
    """
    n = A.shape[-1]
    m = B.shape[-1]
    extra = m + (0 if c is None else 1)
    Mtop = jnp.concatenate(
        [A, B] + ([] if c is None else [c[..., None]]), axis=-1
    )
    M = jnp.concatenate(
        [Mtop, jnp.zeros(A.shape[:-2] + (extra, n + extra), A.dtype)], axis=-2
    )
    X = M * (dt / (2.0 ** squarings))
    I = jnp.eye(n + extra, dtype=A.dtype)
    # Horner evaluation of sum X^k / k!
    E = I + X / order
    for k in range(order - 1, 0, -1):
        E = I + (X @ E) / k
    for _ in range(squarings):
        E = E @ E
    Ad = E[..., :n, :n]
    Bd = E[..., :n, n:n + m]
    if c is None:
        return Ad, Bd
    return Ad, Bd, E[..., :n, n + m]


def discretize(A, B, dt, c=None, method: str = "euler"):
    if method == "euler":
        return discretize_euler(A, B, dt, c)
    if method == "order2":
        return discretize_order2(A, B, dt, c)
    if method == "expm":
        return discretize_expm(A, B, dt, c)
    raise ValueError(f"unknown discretization: {method!r}")


def discretize_order2(A, B, dt, c=None):
    n = A.shape[-1]
    I = jnp.eye(n, dtype=A.dtype)
    dA = dt * A
    Ad = I + dA + 0.5 * dA @ dA
    M = (dt * I + 0.5 * dt * dA)
    Bd = M @ B
    if c is None:
        return Ad, Bd
    return Ad, Bd, M @ c
