from .config import (
    VehicleParams,
    MPCWeights,
    MPCBounds,
    MPCConfig,
    SolverConfig,
    MeshConfig,
)

__all__ = [
    "VehicleParams",
    "MPCWeights",
    "MPCBounds",
    "MPCConfig",
    "SolverConfig",
    "MeshConfig",
]
