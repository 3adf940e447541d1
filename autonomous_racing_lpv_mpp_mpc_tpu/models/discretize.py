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
