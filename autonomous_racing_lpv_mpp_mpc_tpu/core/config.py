"""Typed pytree configs for the whole framework.

Reference parity: the reference keeps all of these as loose constants at the
top of ``main.py`` and as ctor args (SURVEY.md §5 "Config / flag system",
§2 "Experiment driver"). Here they are frozen ``flax.struct`` dataclasses:
numeric fields are pytree leaves (so they can be vmapped/sharded — e.g. a
batch of ``VehicleParams`` with different friction mu is just a stacked
pytree), while structural fields (horizon N, dims, iteration counts) are
static aux data so they stay concrete under ``jit``.

Precision policy: float32 everywhere by default; the CPU oracle runs float64
(``jax_enable_x64`` is not required — the oracle is plain numpy).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class VehicleParams:
    """Dynamic-bicycle vehicle parameters (1:10 BARC-style car).

    All leaves are floats => a batch of cars (e.g. a friction sweep,
    BASELINE.json config 4) is just ``jax.tree.map(stack, [p1, p2, ...])``.
    """

    m: float = 2.424        # mass [kg]
    Iz: float = 0.02        # yaw inertia [kg m^2]
    lf: float = 0.125       # CoG -> front axle [m]
    lr: float = 0.125       # CoG -> rear axle [m]
    Cf: float = 57.5        # front cornering stiffness [N/rad]
    Cr: float = 67.5        # rear cornering stiffness [N/rad]
    mu: float = 1.0         # tire-road friction coefficient [-]
    g: float = 9.81         # gravity [m/s^2]
    # simple longitudinal resistance: F_drag = cd0 * sign(vx) + cd1 * vx
    cd0: float = 0.0
    cd1: float = 0.0

    @property
    def wheelbase(self) -> float:
        return self.lf + self.lr


@struct.dataclass
class MPCWeights:
    """Quadratic tracking weights (diagonals).

    Reference parity: Q, R, dR matrices built in the MPC ctor
    (SURVEY.md §2 "Tracking MPC").  ``q_*`` are per-state weights in the
    order of the model's state vector; ``r`` penalizes inputs, ``dr``
    penalizes input rates (Delta-u).
    """

    q: Tuple[float, ...] = (120.0, 1.0, 1.0, 70.0, 0.0, 100.0)
    r: Tuple[float, ...] = (1.0, 1.0)
    dr: Tuple[float, ...] = (30.0, 15.0)

    @classmethod
    def for_model(cls, model: str) -> "MPCWeights":
        """Per-model defaults aligned with the state vector ordering."""
        if model == "dynamic":   # (vx, vy, wz, e_psi, s, e_y)
            return cls(q=(120.0, 1.0, 1.0, 70.0, 0.0, 100.0))
        if model == "kinematic":  # (vx, e_psi, s, e_y)
            return cls(q=(50.0, 20.0, 0.0, 60.0))
        raise ValueError(model)

    def q_array(self) -> jnp.ndarray:
        return jnp.asarray(self.q, dtype=jnp.float32)

    def r_array(self) -> jnp.ndarray:
        return jnp.asarray(self.r, dtype=jnp.float32)

    def dr_array(self) -> jnp.ndarray:
        return jnp.asarray(self.dr, dtype=jnp.float32)


@struct.dataclass
class MPCBounds:
    """Box bounds on states / inputs / input rates.

    Reference parity: |e_y| <= half track width, vx range, |delta| <= ~0.25
    rad, accel range, Delta-u rate bounds (SURVEY.md §2 "Tracking MPC").
    """

    vx_min: float = 0.2
    vx_max: float = 4.0
    ey_max: float = 0.4          # half track width [m]
    delta_max: float = 0.30      # |steering| [rad]
    a_min: float = -2.0          # accel [m/s^2]
    a_max: float = 3.0
    ddelta_max: float = 0.60     # |Delta delta| per step [rad]
    da_max: float = 3.0          # |Delta a| per step [m/s^2]
    # quadratic penalty weight for e_y corridor violations (soft constraint,
    # SURVEY.md §5); float("inf") makes the corridor a hard box.
    ey_soft: float = 2000.0


@struct.dataclass
class MPCConfig:
    """Horizon / timing / model-mode config for the tracking MPC."""

    N: int = struct.field(pytree_node=False, default=12)   # horizon length
    dt: float = struct.field(pytree_node=False, default=1.0 / 30.0)
    model: str = struct.field(pytree_node=False, default="dynamic")  # "dynamic"|"kinematic"
    tire: str = struct.field(pytree_node=False, default="linear")    # "linear"|"pacejka"
    # "lpv": reference semantics — A(theta), B(theta) used directly, no affine
    #        term (SURVEY.md §2 "LPV model builder").
    # "ltv": Jacobian linearization with affine residual (successive
    #        linearization / SQP mode) — strictly more accurate, non-reference.
    linearization: str = struct.field(pytree_node=False, default="lpv")
    # "euler" is the reference's A_d = I + dt*A (SURVEY.md §2); "expm" is the
    # exact Van Loan discretization — required for the stiff low-speed lateral
    # dynamics of the dynamic bicycle (|dt*lambda| > 2 below ~1 m/s).
    discretization: str = struct.field(pytree_node=False, default="expm")
    # per-stage vx upper bound from the friction circle at the scheduled s
    # (linear tires in the LPV otherwise never see the grip limit)
    kappa_speed_cap: bool = struct.field(pytree_node=False, default=True)
    a_lat_frac: float = 0.9
    weights: MPCWeights = dataclasses.field(default_factory=MPCWeights)
    bounds: MPCBounds = dataclasses.field(default_factory=MPCBounds)


@struct.dataclass
class SolverConfig:
    """Batched ADMM (OSQP semantics) + Riccati x-update solver config.

    Mirrors OSQP's algorithm parameters (rho, sigma, alpha relaxation,
    eps_abs/eps_rel termination — SURVEY.md §3.2) for the box-constraint
    splitting; the equality (dynamics) block is solved exactly each
    iteration by a Riccati sweep, so there is no rho_eq.
    """

    rho: float = 0.1
    sigma: float = 1e-6
    alpha: float = 1.6            # over-relaxation
    max_iter: int = struct.field(pytree_node=False, default=50)
    eps_abs: float = 3e-4
    eps_rel: float = 3e-4
    # looser acceptance used by the receding-horizon loop: a solution whose
    # residuals are below this is applied even if formal termination was not
    # reached (the limp-home fallback only kicks in beyond it)
    eps_fallback: float = 2e-2
    # every `rho_interval` iterations rho is rescaled from the residual ratio
    # (OSQP's adaptive rho); 0 disables.
    rho_interval: int = struct.field(pytree_node=False, default=10)
    # "scan": sequential Riccati via lax.scan (lowest latency, small N)
    # "assoc": parallel-in-horizon via lax.associative_scan (long horizons /
    #          horizon-sharded mode) — SURVEY.md §2.2 "Horizon parallelism".
    riccati: str = struct.field(pytree_node=False, default="scan")
    # single-solve path: early-exit while_loop on termination check;
    # batched path: fixed iteration count (static shapes). SURVEY.md §7 L4.
    check_termination: int = struct.field(pytree_node=False, default=5)
    # mega-backend chunk-level early exit (ops/megastep_kernel.py): the
    # kernel's ADMM loop stops as soon as EVERY lane in the 128-lane block
    # passes the OSQP termination check at a chunk boundary — restoring
    # OSQP's early-termination semantics on the batched fast path (a
    # warm-started closed loop converges at ~10 of 20 iterations, so this
    # is a large throughput lever). OFF by default: with it on, converged
    # lanes stop refining at the chunk boundary instead of polishing for
    # the remaining iterations, so results differ from the fixed-count
    # backends at the eps_abs/eps_rel tolerance level (exact-parity tests
    # keep it off; production/bench turn it on).
    early_exit: bool = struct.field(pytree_node=False, default=False)
    # mega-backend discretization caching (ops/megastep_kernel.py): reuse
    # the LPV + Van Loan stage matrices across steps by SHIFTING the cached
    # stage chain one step (the receding-horizon schedule shifts the same
    # way) and rebuilding only the newly-revealed terminal stage — a full
    # rebuild fires whenever the new schedule drifts more than
    # `cache_drift_tol` from the schedule each cached stage was built at
    # (max over stages/lanes of |Delta x_sched|, |Delta u_sched|,
    # |Delta kappa|), or every `cache_max_age` steps. OFF by default: the
    # reused matrices are a one-step-staler LPV linearization, a semantic
    # change at the LPV-approximation level (exact-parity tests keep it
    # off; the oracle-ladder test pins the rung with it on).
    cache_build: bool = struct.field(pytree_node=False, default=False)
    # drift tolerance is NORMALIZED per channel (fraction of each
    # channel's dynamic range); 0.3 is the measured operating point
    # (~65% reuse, per-step |du| p95 ~6e-3 — outside the 5e-4 rung,
    # which is why the knob defaults off; PERF.md r5)
    cache_drift_tol: float = struct.field(pytree_node=False, default=0.3)
    cache_max_age: int = struct.field(pytree_node=False, default=8)
    # batched-solve backend: "xla" (vmapped scans), "pallas" (solver-only
    # VMEM kernel), "fused" (assembly+solver kernel, ops/fused_kernel.py),
    # or "mega" (the whole receding-horizon step incl. plant in one kernel,
    # ops/megastep_kernel.py — used via megastep(), not mpc_step_batched)
    backend: str = struct.field(pytree_node=False, default="xla")
    # OSQP-parity pre/post stages (solver/production.py; SURVEY.md §3.2
    # scale -> iterate -> polish). equilibrate: Ruiz row equilibration, ON
    # by default like OSQP's `scaling` (exact identity for the tracker's
    # own ±1 selector rows; matters for arbitrary user/derived rows — the
    # fused/mega kernels build unit-norm rows in-kernel and are
    # equilibrated by construction). polish: active-set KKT refinement of
    # the converged iterate, OFF by default like OSQP.
    equilibrate: bool = struct.field(pytree_node=False, default=True)
    polish: bool = struct.field(pytree_node=False, default=False)
    # exact Farkas primal-infeasibility certification
    # (solver/production.py::certify_primal_infeasibility): when the
    # in-solver settled-dual heuristic fires, mpc_step/mpc_step_batched
    # confirm it with OSQP §3.4's certificate conditions and surface the
    # result as MPCDiag.certified_infeasible (SURVEY.md §5 "Failure
    # detection"). lax.cond keeps the certificate off the hot path on the
    # single-solve route; under vmap both branches execute, so flip this
    # off for throughput sweeps that cannot hit infeasible corridors.
    certify_infeasibility: bool = struct.field(pytree_node=False, default=True)


@struct.dataclass
class MPPConfig:
    """MPP planner config (SURVEY.md §2 "MPP planner", §3.3).

    The planner shares the tracking engine: same LPV machinery, different
    cost (progress maximization + trust region) and per-stage bounds
    (curvature-limited speed, obstacle-shifted corridor).
    """

    H: int = struct.field(pytree_node=False, default=512)   # planning stages
    n_sqp: int = struct.field(pytree_node=False, default=4)  # relinearizations
    dt: float = struct.field(pytree_node=False, default=1.0 / 30.0)
    model: str = struct.field(pytree_node=False, default="dynamic")
    tire: str = struct.field(pytree_node=False, default="linear")
    linearization: str = struct.field(pytree_node=False, default="lpv")
    discretization: str = struct.field(pytree_node=False, default="expm")
    # progress reward (linear weight on terminal s) and trust-region weights
    w_progress: float = 50.0
    q_trust: Tuple[float, ...] = (0.0, 0.5, 0.5, 5.0, 0.0, 5.0)
    r: Tuple[float, ...] = (0.05, 0.05)
    dr: Tuple[float, ...] = (20.0, 10.0)
    # fraction of the friction circle budgeted to lateral accel for the
    # curvature speed limit v <= sqrt(a_lat_frac * mu * g / |kappa|);
    # conservative by default — the tracker needs margin for model mismatch
    a_lat_frac: float = 0.7
    # corridor margin from the track edge [m] (car half-width + safety)
    ey_margin: float = 0.05
    bounds: MPCBounds = dataclasses.field(default_factory=MPCBounds)
    # resolution of the emitted reference table [m]
    ds_ref: float = struct.field(pytree_node=False, default=0.05)

    @classmethod
    def for_model(cls, model: str, **kw) -> "MPPConfig":
        """Per-model defaults aligned with the state vector ordering
        (BASELINE config 1 planner->tracker uses the kinematic variant)."""
        if model == "dynamic":     # (vx, vy, wz, e_psi, s, e_y)
            return cls(model="dynamic", **kw)
        if model == "kinematic":   # (vx, e_psi, s, e_y)
            return cls(model="kinematic", q_trust=(0.0, 5.0, 0.0, 5.0), **kw)
        raise ValueError(model)


@struct.dataclass
class MeshConfig:
    """Device-mesh layout for scenario-parallel / horizon-parallel runs.

    SURVEY.md §2.2: axis "scenarios" is the DP-analog (embarrassingly
    parallel scenario batch), axis "horizon" shards horizon blocks for the
    collective block-reduction mode.
    """

    scenario_axis: str = struct.field(pytree_node=False, default="scenarios")
    horizon_axis: str = struct.field(pytree_node=False, default="horizon")
    n_scenario: int = struct.field(pytree_node=False, default=1)
    n_horizon: int = struct.field(pytree_node=False, default=1)
