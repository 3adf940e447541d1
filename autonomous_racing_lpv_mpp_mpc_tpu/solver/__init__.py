from .riccati import (
    LQRDynamics,
    LQRCost,
    RiccatiFactors,
    riccati_factor_scan,
    riccati_factor_assoc,
    riccati_factor,
    lqr_linear_solve,
    lqr_solve,
)
from .admm import ADMMSolution, BoxQP, admm_solve, admm_solve_single, qp_objective
from .polish import PolishResult, polish, stack_boxqp_jax
from .production import (
    certify_primal_infeasibility,
    polish_solution,
    production_solve,
)
from .scaling import (
    RowScaling,
    admm_solve_equilibrated,
    ruiz_row_equilibrate,
    unscale_duals,
    unscale_solution,
)

__all__ = [
    "PolishResult",
    "polish",
    "certify_primal_infeasibility",
    "polish_solution",
    "production_solve",
    "stack_boxqp_jax",
    "RowScaling",
    "admm_solve_equilibrated",
    "ruiz_row_equilibrate",
    "unscale_duals",
    "unscale_solution",
    "LQRDynamics",
    "LQRCost",
    "RiccatiFactors",
    "riccati_factor_scan",
    "riccati_factor_assoc",
    "riccati_factor",
    "lqr_linear_solve",
    "lqr_solve",
    "ADMMSolution",
    "BoxQP",
    "admm_solve",
    "admm_solve_single",
    "qp_objective",
]
