from .velocity_profile import curvature_speed_limit, velocity_profile
from .reftable import RefTable, refs_from_table
from .mpp import MPPDiag, plan_mpp
from .online import ReplanLog, pipelined_replanning_loop, replanning_loop
from .opponents import (
    OpponentSet,
    collision_trace,
    min_gap_trace,
    opponent_s_at,
    opponents,
    opponents_obstacle_fn,
    pad_blocks,
    sweep_blocks,
)

__all__ = [
    "OpponentSet",
    "opponents",
    "opponent_s_at",
    "opponents_obstacle_fn",
    "pad_blocks",
    "sweep_blocks",
    "min_gap_trace",
    "collision_trace",
    "ReplanLog",
    "pipelined_replanning_loop",
    "replanning_loop",
    "curvature_speed_limit",
    "velocity_profile",
    "RefTable",
    "refs_from_table",
    "MPPDiag",
    "plan_mpp",
]
