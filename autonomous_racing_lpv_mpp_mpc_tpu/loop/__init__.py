from .mpc import (
    MPCCarry,
    MPCDiag,
    constant_refs,
    mpc_init,
    mpc_prepare,
    mpc_step,
    mpc_step_batched,
)
from .closed_loop import ClosedLoopLog, ClosedLoopLogPred, closed_loop, plant_step
from .estimator import EKFState, ekf_init, ekf_step, noisy_measurement, passthrough
from .mhe import MHEConfig, MHEState, mhe_init, mhe_solve, mhe_step
from .global_loop import GlobalLog, closed_loop_global, f_global, global_plant_step
from .lap_learning import (
    LapLearnConfig,
    LapLearnLog,
    initial_table,
    iterative_lap_learning,
    lap_steps,
    learn_from_lap,
)
from .friction import (
    AdaptiveLog,
    FrictionState,
    adaptive_closed_loop,
    friction_init,
    friction_step,
    measured_axle_forces,
)
from .race import RaceCarry, RaceLog, race_loop

__all__ = [
    "MPCCarry",
    "MPCDiag",
    "mpc_init",
    "mpc_prepare",
    "mpc_step",
    "mpc_step_batched",
    "constant_refs",
    "ClosedLoopLog",
    "ClosedLoopLogPred",
    "closed_loop",
    "plant_step",
    "EKFState",
    "ekf_init",
    "ekf_step",
    "noisy_measurement",
    "passthrough",
    "MHEConfig",
    "MHEState",
    "mhe_init",
    "mhe_solve",
    "mhe_step",
    "GlobalLog",
    "closed_loop_global",
    "f_global",
    "global_plant_step",
    "LapLearnConfig",
    "LapLearnLog",
    "initial_table",
    "iterative_lap_learning",
    "lap_steps",
    "learn_from_lap",
    "AdaptiveLog",
    "FrictionState",
    "adaptive_closed_loop",
    "friction_init",
    "friction_step",
    "measured_axle_forces",
    "RaceCarry",
    "RaceLog",
    "race_loop",
]
