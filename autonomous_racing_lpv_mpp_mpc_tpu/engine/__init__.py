from .assembly import (
    aug_dim,
    augment_dynamics,
    build_boxqp,
    constraint_rows,
    initial_schedule,
    scheduled_stages,
    shift_schedule,
    state_indices,
)

__all__ = [
    "aug_dim",
    "augment_dynamics",
    "build_boxqp",
    "constraint_rows",
    "initial_schedule",
    "scheduled_stages",
    "shift_schedule",
    "state_indices",
]
