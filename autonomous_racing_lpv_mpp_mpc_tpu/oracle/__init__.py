from .osqp_ref import OsqpRefSettings, OsqpRefResult, osqp_ref_solve
from .stack import stack_boxqp, unstack_solution

__all__ = [
    "OsqpRefSettings",
    "OsqpRefResult",
    "osqp_ref_solve",
    "stack_boxqp",
    "unstack_solution",
]
