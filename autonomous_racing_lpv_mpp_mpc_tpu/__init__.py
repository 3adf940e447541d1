"""TPU-native LPV-MPC / MPP autonomous-racing engine.

A brand-new JAX/XLA/Pallas/pjit framework with the capabilities of the
reference repo ``euge2838/Autonomous-Racing-LPV-MPP-MPC`` (see SURVEY.md —
the reference mount was empty at survey time, so the behavioral spec in
SURVEY.md §0.1 + BASELINE.json is the reference):

- ``core``     — typed pytree configs (vehicle, MPC, solver, track, mesh).
- ``track``    — track compiler + branch-free Frenet<->global transforms.
- ``models``   — nonlinear bicycle plants, tire models, LPV/LTV builders.
- ``engine``   — horizon scheduling + block-structured QP assembly.
- ``solver``   — batched ADMM with OSQP semantics whose x-update is a
                 Riccati/LQR solve (lax.scan and lax.associative_scan).
- ``loop``     — receding-horizon controller and whole-lap closed loop.
- ``planner``  — MPP reference-trajectory / velocity-profile planner.
- ``parallel`` — mesh setup, shard_map scenario sharding, collectives.
- ``ops``      — Pallas TPU kernels for the hot paths.
- ``oracle``   — CPU numpy OSQP-semantics oracle (ground truth).
- ``utils``    — plotting, logging, profiling, checkpointing.
- ``bench``    — the 5 BASELINE.json configs as runnable benchmarks.
"""

__version__ = "0.1.0"

# TPU XLA lowers f32 matmuls to bf16 multiplies by default ("default"
# precision). For a control stack that is a SEMANTIC change: the Riccati /
# ADMM solution drifts in the 3rd digit while its internally-consistent
# residuals still report convergence (verified against the f64 oracle — the
# Pallas kernel, whose VPU ops are true f32, matches the oracle; the bf16
# XLA path does not). Force true-f32 matmuls; opt out via env if you
# explicitly want bf16 speed.
import os as _os

if _os.environ.get("ARLMPC_MATMUL_PRECISION", "highest") != "default":
    import jax as _jax

    _jax.config.update(
        "jax_default_matmul_precision",
        _os.environ.get("ARLMPC_MATMUL_PRECISION", "highest"),
    )
