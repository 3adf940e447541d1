"""Ruiz row equilibration for hard-constraint-heavy BoxQPs.

OSQP preconditions the stacked KKT with Ruiz equilibration (alternating
row/column inf-norm scaling) before ADMM; badly scaled constraint rows make
a single scalar rho a poor penalty for every row and slow convergence
(SURVEY.md §7 "Hard parts" #1: equilibration interacts with precision).

In this framework the dynamics block is eliminated exactly by the Riccati
sweep, so only the box-constraint rows [Dx Du] see the ADMM splitting —
the useful (and structure-preserving) part of Ruiz here is **row**
equilibration of the constraint matrix: scale each row i by d_i so its
inf-norm is 1. With a uniform rho this is exactly equivalent to OSQP's
per-row rho_i = rho / d_i^2 on the original rows. Column (variable)
scaling is deliberately NOT done — it would rescale A_k/B_k/Q/R and change
the Riccati recursion's conditioning in ways that are already handled by
working on physical state units.

Scaling map (row i, scale d_i):
    Dx'_i = d_i Dx_i,  Du'_i = d_i Du_i,  lb' = d lb,  ub' = d ub
    soft'_i = soft_i / d_i^2      (quadratic penalty on a d_i-scaled distance)
    lam_i  = d_i lam'_i           (duals of the scaled rows)

Ruiz iteration for row-only scaling converges in one step per row
(d_i = 1/||row_i||_inf); `iters` is kept for API familiarity and to match
OSQP's sqrt-damped update, which is what we implement.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax.numpy as jnp

from ..core.config import SolverConfig
from .admm import ADMMSolution, BoxQP, admm_solve, admm_solve_single


class RowScaling(NamedTuple):
    d: jnp.ndarray  # (nc,) per-row scale applied to [Dx Du], lb, ub


def ruiz_row_equilibrate(qp: BoxQP, iters: int = 1,
                         min_scale: float = 1e-4,
                         max_scale: float = 1e4) -> Tuple[BoxQP, RowScaling]:
    """Equilibrate constraint rows to unit inf-norm.

    Ruiz's sqrt-damped iteration exists to make the ALTERNATING row/column
    scheme converge; row-only scaling reaches exactly unit row norms in one
    step (d_i = 1/||row_i||_inf), so that is what we do (`iters` kept for
    API symmetry; extra iterations are no-ops at unit norm).

    Returns the scaled QP and the scaling needed to map duals back
    (:func:`unscale_duals`). Primal variables (X, U) are unchanged by row
    scaling; the split variable ``s`` and bounds live in the scaled space.
    """
    del iters
    row_norm = jnp.maximum(
        jnp.max(jnp.abs(qp.Dx), axis=1), jnp.max(jnp.abs(qp.Du), axis=1)
    )
    d = 1.0 / jnp.maximum(row_norm, 1e-12)
    d = jnp.clip(d, min_scale, max_scale)
    # re-apply the clipped scale exactly (clip may have changed d)
    Dx = d[:, None] * qp.Dx
    Du = d[:, None] * qp.Du
    scaled = qp._replace(
        Dx=Dx,
        Du=Du,
        lb=qp.lb * d,
        ub=qp.ub * d,
        soft=jnp.where(jnp.isinf(qp.soft), qp.soft, qp.soft / (d * d)),
    )
    return scaled, RowScaling(d=d)


def unscale_duals(lam_scaled: jnp.ndarray, scaling: RowScaling) -> jnp.ndarray:
    """Map duals of the scaled rows back to the original rows."""
    return lam_scaled * scaling.d


def unscale_solution(sol: ADMMSolution, scaling: RowScaling) -> ADMMSolution:
    """Return the solution in original-row units (X, U already unscaled)."""
    return sol._replace(lam=unscale_duals(sol.lam, scaling),
                        s=sol.s / scaling.d)


def admm_solve_equilibrated(
    qp: BoxQP,
    cfg: SolverConfig,
    warm=None,
    rho0=None,
    single: bool = False,
    iters: int = 3,
) -> ADMMSolution:
    """Equilibrate rows, solve, and unscale the duals/split variable.

    Warm-start tuples (s, lam, X, U) are expected in ORIGINAL row units and
    are mapped into the scaled space here. Residuals in the returned
    solution are those of the scaled problem (OSQP likewise terminates on
    scaled residuals unless scaled_termination=0).
    """
    scaled, sc = ruiz_row_equilibrate(qp, iters=iters)
    if warm is not None:
        s, lam, X, U = warm
        warm = (s * sc.d, lam / sc.d, X, U)
    if single:
        sol = admm_solve_single(scaled, cfg, warm)
    else:
        sol = admm_solve(scaled, cfg, warm, rho0=rho0)
    return unscale_solution(sol, sc)
