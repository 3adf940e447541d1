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

__all__ = [
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
