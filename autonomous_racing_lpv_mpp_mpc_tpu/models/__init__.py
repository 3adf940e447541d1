from .tires import tire_force_linear, tire_force_pacejka, tire_force
from .dynamics import (
    DYN_NX,
    KIN_NX,
    NU,
    f_dynamic,
    f_kinematic,
    f_model,
    model_nx,
)
from .lpv import lpv_ab_dynamic, lpv_ab_kinematic, lpv_ab, ltv_abc
from .discretize import discretize, discretize_euler, discretize_expm, discretize_order2

__all__ = [
    "tire_force_linear",
    "tire_force_pacejka",
    "tire_force",
    "DYN_NX",
    "KIN_NX",
    "NU",
    "f_dynamic",
    "f_kinematic",
    "f_model",
    "model_nx",
    "lpv_ab_dynamic",
    "lpv_ab_kinematic",
    "lpv_ab",
    "ltv_abc",
    "discretize",
    "discretize_euler",
    "discretize_expm",
    "discretize_order2",
]
