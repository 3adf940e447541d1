"""Integration tests (SURVEY.md §4.3): full closed-loop laps + the
BASELINE.json acceptance test — per-step control-sequence match against the
CPU OSQP-semantics oracle (re-synced each step, SURVEY.md §7 "hard parts")."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autonomous_racing_lpv_mpp_mpc_tpu.core import (
    MPCConfig,
    MPCWeights,
    SolverConfig,
    VehicleParams,
)
from autonomous_racing_lpv_mpp_mpc_tpu.loop import (
    closed_loop,
    constant_refs,
    mpc_init,
    mpc_prepare,
    mpc_step,
    plant_step,
)
from autonomous_racing_lpv_mpp_mpc_tpu.oracle import (
    OsqpRefSettings,
    osqp_ref_solve,
    stack_boxqp,
    unstack_solution,
)
from autonomous_racing_lpv_mpp_mpc_tpu.solver import admm_solve
from autonomous_racing_lpv_mpp_mpc_tpu.track import oval_track, racetrack

P = VehicleParams()
SCFG = SolverConfig(max_iter=60)


def test_config1_kinematic_oval_full_lap():
    """BASELINE config 1: kinematic bicycle, N=10, single lap on the oval."""
    cfg = MPCConfig(N=10, model="kinematic", weights=MPCWeights.for_model("kinematic"))
    track = oval_track()
    x0 = jnp.array([0.5, 0.0, 0.0, 0.0])
    log = closed_loop(P, cfg, SCFG, track, x0, constant_refs(cfg, 1.5), T=300)
    X = np.asarray(log.X)
    assert X[-1, 2] > float(track.length)          # lap completed
    assert np.abs(X[:, 3]).max() < 0.4             # stays in corridor
    assert np.asarray(log.converged).mean() > 0.95
    # vx settles on the reference
    assert abs(X[150:, 0].mean() - 1.5) < 0.05


def test_config2_dynamic_racetrack_full_lap():
    """BASELINE config 2: dynamic bicycle + tire slip, N=20, full racetrack
    lap, Pacejka plant vs linear-tire LPV controller (model mismatch)."""
    cfg = MPCConfig(N=20, model="dynamic")
    track = racetrack()
    x0 = jnp.array([0.7, 0.0, 0.0, 0.0, 0.0, 0.0])
    log = closed_loop(
        P, cfg, SCFG, track, x0, constant_refs(cfg, 1.8), T=600, sim_tire="pacejka"
    )
    X = np.asarray(log.X)
    assert X[-1, 4] > float(track.length)          # lap completed
    assert np.abs(X[:, 5]).max() < 0.4
    assert np.asarray(log.converged).mean() > 0.95
    # warm start keeps iteration counts low (SURVEY.md §4.3)
    assert np.asarray(log.iters)[50:].mean() < 25


def test_acceptance_control_sequence_matches_oracle():
    """BASELINE acceptance: steering/throttle sequence matches the
    OSQP-semantics oracle within tolerance, re-synced per step.

    ``polish=True`` exercises the full production pipeline
    (equilibrate -> ADMM -> active-set polish, solver/production.py);
    the polish stage is what tightens the tolerance from the r1 2e-3 to
    5e-4 (VERDICT r1 next #4)."""
    cfg = MPCConfig(N=12, model="dynamic")
    scfg = SolverConfig(max_iter=300, eps_abs=1e-6, eps_rel=1e-6, polish=True)
    track = oval_track()
    x_ref = constant_refs(cfg, 1.5)
    x = jnp.array([1.0, 0.0, 0.0, 0.0, 0.0, 0.05])
    carry = mpc_init(P, cfg, track, x)

    step_fn = jax.jit(
        lambda x_, c_: mpc_step(P, cfg, scfg, track, x_, x_ref, c_)
    )
    plant_fn = jax.jit(lambda x_, u_: plant_step(P, cfg, track, x_, u_))

    max_du = 0.0
    for t in range(25):
        qp, _, _ = mpc_prepare(P, cfg, track, x, x_ref, carry)
        u_jax, carry, diag = step_fn(x, carry)
        assert bool(diag.converged), f"step {t} did not converge"
        Pd, qd, Ad, ld, ud = stack_boxqp(qp)
        ref = osqp_ref_solve(Pd, qd, Ad, ld, ud, OsqpRefSettings())
        assert ref.converged
        _, Ur = unstack_solution(qp, ref.x)
        max_du = max(max_du, float(np.abs(np.asarray(u_jax) - Ur[0]).max()))
        x = plant_fn(x, u_jax)
    # tolerance ladder (SURVEY.md §7): per-step u within tau in f32;
    # polished production path holds 5e-4 (4x tighter than unpolished r1)
    assert max_du < 5e-4, f"max |u_jax - u_oracle| = {max_du}"


@pytest.mark.parametrize("mode", [
    ("ltv", "expm"),      # successive linearization (non-reference extra)
    ("lpv", "euler"),     # the reference's own discretization semantics
])
def test_linearization_discretization_modes(mode):
    """Every (linearization, discretization) mode drives the racetrack."""
    lin, disc = mode
    cfg = MPCConfig(N=20, model="dynamic", linearization=lin, discretization=disc)
    scfg = SolverConfig(max_iter=40, rho_interval=0)
    track = racetrack()
    # euler needs vx >= ~1.5 (forward-Euler stability of the stiff lateral
    # dynamics — why "expm" is the default; models/discretize.py)
    x0 = jnp.array([1.5, 0.0, 0.0, 0.0, 0.0, 0.0])
    log = closed_loop(P, cfg, scfg, track, x0, constant_refs(cfg, 2.0),
                      T=400, sim_tire="pacejka")
    X = np.asarray(log.X)
    assert X[-1, 4] > 0.7 * float(track.length)
    assert np.abs(X[:, 5]).max() < 0.15
    assert np.asarray(log.converged).mean() > 0.95


def test_low_friction_envelope():
    """mu=0.5 with vx_ref above the friction cap: the vx-reference clamp
    keeps ADMM converging and the car inside the corridor (was conv=0.24
    before the clamp)."""
    cfg = MPCConfig(N=20, model="dynamic", tire="pacejka")
    scfg = SolverConfig(max_iter=40, rho_interval=0)
    track = racetrack()
    p_low = VehicleParams(mu=0.5)
    x0 = jnp.array([0.8, 0.0, 0.0, 0.0, 0.0, 0.0])
    log = closed_loop(p_low, cfg, scfg, track, x0,
                      constant_refs(cfg, 2.2), T=400, sim_tire="pacejka")
    X = np.asarray(log.X)
    assert X[-1, 4] > 0.8 * float(track.length)
    assert np.abs(X[:, 5]).max() < 0.15
    assert np.asarray(log.converged).mean() > 0.7


def test_prediction_logging():
    """log_predictions: per-step predicted trajectories recorded; 1-step
    prediction matches the plant within LPV-model-mismatch tolerance."""
    cfg = MPCConfig(N=10, model="dynamic")
    track = oval_track()
    log = closed_loop(P, cfg, SCFG, track,
                      jnp.array([1.0, 0, 0, 0, 0, 0.05]),
                      constant_refs(cfg, 1.5), T=80, log_predictions=True)
    assert log.X_pred.shape == (80, 11, 6)
    # X_pred[t] is the prediction made FROM the pre-step state, so its row 1
    # predicts log.X[t] (the plant state after step t)
    pred1 = np.asarray(log.X_pred)[20:, 1, :]
    actual = np.asarray(log.X)[20:, :]
    assert np.abs(pred1 - actual).max() < 0.15


def test_closed_loop_vmaps_over_scenarios():
    """Scenario batching smoke test: vmap the whole lap over initial states."""
    cfg = MPCConfig(N=8, model="kinematic", weights=MPCWeights.for_model("kinematic"))
    track = oval_track()
    x0s = jnp.stack(
        [jnp.array([0.5, 0.0, 0.0, ey]) for ey in (-0.1, 0.0, 0.1, 0.2)]
    )
    refs = constant_refs(cfg, 1.2)
    logs = jax.vmap(
        lambda x0: closed_loop(P, cfg, SCFG, track, x0, refs, T=100)
    )(x0s)
    assert logs.X.shape == (4, 100, 4)
    assert np.asarray(logs.converged).mean() > 0.9
    # each scenario converges toward the centerline
    assert np.abs(np.asarray(logs.X[:, -1, 3])).max() < 0.1
    assert np.abs(np.asarray(logs.X[:, -1, 3])).max() < np.abs(np.asarray(x0s[:, 3])).max()


def test_certified_infeasibility_in_closed_loop():
    """SURVEY.md §5 "Failure detection" / VERDICT r2 missing #5: when a
    closed loop is driven into an impossible hard corridor (vx box far
    below the current speed — no admissible accel sequence can reach it in
    one step), the settled-dual heuristic fires inside mpc_step AND the
    exact Farkas certificate (solver/production.py) confirms it, surfaced
    per step as ClosedLoopLog.certified_infeasible. A feasible lap never
    raises the flag."""
    from autonomous_racing_lpv_mpp_mpc_tpu.core import MPCBounds

    track = oval_track()
    cfg_bad = MPCConfig(N=10, model="dynamic",
                        bounds=MPCBounds(vx_max=0.8, vx_min=0.2))
    scfg = SolverConfig(max_iter=200, rho_interval=25)
    x0 = jnp.array([3.0, 0.0, 0.0, 0.0, 0.0, 0.0], jnp.float32)
    log = closed_loop(P, cfg_bad, scfg, track, x0, constant_refs(cfg_bad, 0.5),
                      T=8)
    cert = np.asarray(log.certified_infeasible)
    conv = np.asarray(log.converged)
    assert cert.dtype == bool and cert.shape == (8,)
    # the impossible corridor is certified at the very first steps and the
    # solver (correctly) never reports convergence
    assert cert[:4].all()
    assert not conv.any()
    # the limp-home fallback keeps decelerating toward the corridor
    assert float(log.X[-1, 0]) < float(x0[0])

    # a feasible lap: flag never raised, loop converges as usual
    cfg_ok = MPCConfig(N=10, model="dynamic")
    x0_ok = jnp.array([1.0, 0.0, 0.0, 0.0, 0.0, 0.05], jnp.float32)
    log_ok = closed_loop(P, cfg_ok, scfg, track, x0_ok,
                         constant_refs(cfg_ok, 1.5), T=60)
    assert not np.asarray(log_ok.certified_infeasible).any()
    assert np.asarray(log_ok.converged).mean() > 0.9


def test_certified_infeasibility_batched_scalar_gate():
    """mpc_step_batched surfaces the certificate too, behind a scalar
    any-flag branch (loop/mpc.py::_certified_infeasible_batch): a batch
    mixing feasible and impossible scenarios certifies exactly the
    impossible ones."""
    from autonomous_racing_lpv_mpp_mpc_tpu.core import MPCBounds
    from autonomous_racing_lpv_mpp_mpc_tpu.loop import mpc_step_batched

    track = oval_track()
    cfg = MPCConfig(N=10, model="dynamic",
                    bounds=MPCBounds(vx_max=0.8, vx_min=0.2))
    scfg = SolverConfig(max_iter=200, rho_interval=25)
    B = 4
    # scenarios 0/2 start far above the hard vx box (infeasible), 1/3 inside
    vx0 = jnp.array([3.0, 0.5, 2.5, 0.6], jnp.float32)
    x_b = jnp.zeros((B, 6), jnp.float32).at[:, 0].set(vx0)
    p_b = jax.tree.map(lambda l: jnp.broadcast_to(l, (B,) + jnp.shape(l)), P)
    carry_b = jax.vmap(lambda x: mpc_init(P, cfg, track, x))(x_b)
    x_ref = constant_refs(cfg, 0.5)
    _u, _c, diag = jax.jit(
        lambda xb, cb: mpc_step_batched(p_b, cfg, scfg, track, xb, x_ref, cb)
    )(x_b, carry_b)
    cert = np.asarray(diag.certified_infeasible)
    assert cert.tolist() == [True, False, True, False]
