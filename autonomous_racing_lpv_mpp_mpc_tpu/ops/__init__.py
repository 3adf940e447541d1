from .admm_kernel import pallas_admm_solve, PALLAS_BLOCK

__all__ = ["pallas_admm_solve", "PALLAS_BLOCK"]
