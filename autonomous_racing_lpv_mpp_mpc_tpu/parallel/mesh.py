"""Device mesh setup (SURVEY.md §2.2 "Communication backend").

The rebuild's distributed runtime is JAX collectives over ICI/DCN inside
``shard_map``/``pjit`` on a ``Mesh`` — the TPU-native replacement for the
NCCL/MPI layer a GPU framework would carry. All mesh construction lives
here; all collective calls live in ``collectives.py`` — single-chip paths
never import a collective (SURVEY.md §5).

Axes:
- ``scenarios`` — embarrassingly-parallel scenario batch (the DP analog).
- ``horizon``  — optional second axis for horizon-block reductions
  (the SP/TP analog; SURVEY.md §2.2).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.config import MeshConfig

SCENARIO_AXIS = "scenarios"
HORIZON_AXIS = "horizon"


def multihost_init(coordinator: Optional[str] = None) -> None:
    """Initialize the multi-host JAX runtime (no-op if single-process).

    On a real pod slice each host calls this before building the global
    mesh; controlled by the standard JAX_COORDINATOR env vars. Safe to call
    when already initialized.
    """
    if jax.process_count() > 1:
        return  # already initialized
    addr = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if addr:
        jax.distributed.initialize(coordinator_address=addr)


def make_mesh(
    n_scenario: Optional[int] = None,
    n_horizon: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a (scenarios[, horizon]) mesh over the available devices.

    Defaults to all devices on the scenario axis — the right layout for the
    embarrassingly-parallel sweep configs (BASELINE configs 4-5).
    """
    devs = list(devices) if devices is not None else jax.devices()
    if n_scenario is None:
        n_scenario = len(devs) // n_horizon
    shape = (n_scenario, n_horizon)
    if n_scenario * n_horizon != len(devs):
        devs = devs[: n_scenario * n_horizon]
    arr = np.asarray(devs).reshape(shape)
    if n_horizon == 1:
        return Mesh(arr.reshape(-1), (SCENARIO_AXIS,))
    return Mesh(arr, (SCENARIO_AXIS, HORIZON_AXIS))


def from_config(cfg: MeshConfig) -> Mesh:
    return make_mesh(cfg.n_scenario, cfg.n_horizon)


def scenario_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for arrays whose leading axis is the scenario batch."""
    return NamedSharding(mesh, P(SCENARIO_AXIS))
