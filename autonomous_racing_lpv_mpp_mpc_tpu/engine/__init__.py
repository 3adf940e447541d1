from .assembly import (
    aug_dim,
    build_boxqp,
    initial_schedule,
    shift_schedule,
    state_indices,
)

__all__ = [
    "aug_dim",
    "build_boxqp",
    "initial_schedule",
    "shift_schedule",
    "state_indices",
]
