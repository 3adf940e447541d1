from .config import (
    VehicleParams,
    MPCWeights,
    MPCBounds,
    MPCConfig,
    MPPConfig,
    SolverConfig,
    MeshConfig,
)

__all__ = [
    "VehicleParams",
    "MPCWeights",
    "MPCBounds",
    "MPCConfig",
    "MPPConfig",
    "SolverConfig",
    "MeshConfig",
]
