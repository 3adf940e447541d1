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


def multihost_init(
    coordinator: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize the multi-host JAX runtime (no-op if single-process).

    On a real pod slice each host calls this before building the global
    mesh; controlled by the standard JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID env vars (TPU pods auto-discover
    and only need the address). Safe to call when already initialized.

    On the CPU backend the cross-process collective transport is selected
    too (gloo) — that is what lets the 2-process CI test
    (tests/test_multiprocess.py) exercise this exact code path without a
    pod: DCN-spanning meshes, psum'd metrics, global arrays.
    """
    # NOT jax.process_count(): that would initialise the XLA backend,
    # which must not happen before jax.distributed.initialize()
    if jax.distributed.is_initialized():
        return
    addr = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if not addr:
        return
    if num_processes is None:
        env_np = os.environ.get("JAX_NUM_PROCESSES")
        num_processes = int(env_np) if env_np else None
    if process_id is None:
        env_pid = os.environ.get("JAX_PROCESS_ID")
        process_id = int(env_pid) if env_pid is not None else None
    # config read only — must not instantiate a backend before initialize()
    if str(jax.config.jax_platforms or "").startswith("cpu"):
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        coordinator_address=addr,
        num_processes=num_processes,
        process_id=process_id,
    )


def host_local_to_global(mesh: Mesh, pytree, spec: P = P(SCENARIO_AXIS)):
    """Assemble per-process scenario shards into global sharded arrays.

    Each process holds its own slice of the scenario batch (leading axis);
    under a multi-process mesh the jitted sweep needs GLOBAL arrays. No-op
    in single-process runtimes, so sweep drivers call it unconditionally.
    """
    if jax.process_count() == 1:
        return pytree
    from jax.experimental import multihost_utils

    return multihost_utils.host_local_array_to_global_array(
        pytree, mesh, spec
    )


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
