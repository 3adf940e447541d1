from .mpc import MPCCarry, MPCDiag, mpc_init, mpc_prepare, mpc_step, constant_refs
from .closed_loop import closed_loop, plant_step

__all__ = [
    "MPCCarry",
    "MPCDiag",
    "mpc_init",
    "mpc_prepare",
    "mpc_step",
    "constant_refs",
    "closed_loop",
    "plant_step",
]
