from .velocity_profile import curvature_speed_limit, velocity_profile
from .reftable import RefTable, refs_from_table
from .mpp import MPPDiag, plan_mpp
from .online import ReplanLog, replanning_loop

__all__ = [
    "ReplanLog",
    "replanning_loop",
    "curvature_speed_limit",
    "velocity_profile",
    "RefTable",
    "refs_from_table",
    "MPPDiag",
    "plan_mpp",
]
