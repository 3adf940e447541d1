"""Oracle acceptance at the HEADLINE configuration (VERDICT r4 weak #1).

The bench/production default is the megastep kernel with chunk-level
all-lanes early exit (max_iter=20, check cadence 2) — but the 5e-4 oracle
rung was only ever pinned with early exit OFF on the XLA production path.
This test drives a full oval lap ON THE KERNEL at exactly the BENCH
protocol's solver configuration and re-syncs every step against the
f64 OSQP-semantics oracle on the same QP, pinning the tolerance rung of
the configuration the headline number is actually measured in.

Expectation (VERDICT): between 5e-4 and 5e-3 — early exit stops refining
at the eps_abs/eps_rel = 1e-3 termination tolerance instead of polishing
to fixed-count, which is OSQP's own semantic (it also returns at the
tolerance, not at machine precision).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autonomous_racing_lpv_mpp_mpc_tpu.core import (
    MPCConfig,
    SolverConfig,
    VehicleParams,
)
from autonomous_racing_lpv_mpp_mpc_tpu.loop import constant_refs
from autonomous_racing_lpv_mpp_mpc_tpu.loop.mpc import MPCCarry, mpc_prepare
from autonomous_racing_lpv_mpp_mpc_tpu.ops.megastep_kernel import (
    megastep,
    megastep_init,
    megastep_params,
)
from autonomous_racing_lpv_mpp_mpc_tpu.oracle import (
    OsqpRefSettings,
    osqp_ref_solve,
    stack_boxqp,
    unstack_solution,
)
from autonomous_racing_lpv_mpp_mpc_tpu.track import oval_track

P = VehicleParams()


@pytest.mark.slow
def test_headline_config_full_lap_oracle_rung():
    """Full lap on the megastep kernel at the BENCH solver config
    (early_exit=True, check=2, max_iter=20, rho_interval=0), every step's
    u0 compared against the f64 oracle solving the SAME QP."""
    cfg = MPCConfig(N=12, model="dynamic")
    scfg = SolverConfig(max_iter=20, rho_interval=0, early_exit=True,
                        check_termination=2)
    track = oval_track()
    x_ref = constant_refs(cfg, 1.5)
    x0 = jnp.array([1.0, 0.0, 0.0, 0.0, 0.0, 0.05], jnp.float32)
    p_b = jax.tree.map(lambda l: jnp.broadcast_to(l, (1,) + jnp.shape(l)), P)

    mcar = megastep_init(p_b, cfg, track, x0[None])
    prm = megastep_params(p_b, 1)
    T = 210                         # one oval lap at vx_ref = 1.5

    # jit both programs ONCE: eager interpret-mode pallas dispatches
    # op-by-op and is ~100x slower per step
    step_fn = jax.jit(lambda c: megastep(cfg, scfg, track, prm, x_ref, c,
                                         n_sub=4, interpret=True))
    prep_fn = jax.jit(lambda x, c: mpc_prepare(P, cfg, track, x, x_ref, c))

    max_du = 0.0
    n_checked = 0
    for t in range(T):
        # shadow the kernel carry into the XLA carry to assemble the SAME
        # QP the kernel is about to solve (assembly equivalence is pinned
        # by tests/test_megastep.py); oracle-check every 5th step to keep
        # the f64 reference solves affordable across a whole lap
        check = t % 5 == 0
        if check:
            carry_xla = MPCCarry(
                X_pred=mcar.X_pred[..., 0], U_pred=mcar.U_pred[..., 0],
                s=mcar.s[..., 0], lam=mcar.lam[..., 0],
                u_prev=mcar.u_prev[..., 0], rho=mcar.rho[0],
            )
            qp, _, _ = prep_fn(mcar.x[:, 0], carry_xla)
        mcar, u0, _diag = step_fn(mcar)
        if check:
            Pd, qd, Ad, ld, ud = stack_boxqp(qp)
            ref = osqp_ref_solve(Pd, qd, Ad, ld, ud, OsqpRefSettings())
            assert ref.converged, f"oracle failed at step {t}"
            _, Ur = unstack_solution(qp, ref.x)
            du = float(np.abs(np.asarray(u0[:, 0]) - Ur[0]).max())
            max_du = max(max_du, du)
            n_checked += 1

    # the lap completed on the kernel path
    assert float(mcar.x[4, 0]) > float(track.length), float(mcar.x[4, 0])
    assert n_checked >= 40
    # the HEADLINE-configuration rung, measured: max 4.0e-6 / p95 2.0e-6 /
    # median 8.6e-7 over 42 re-synced checks across the lap — far inside
    # the VERDICT-expected 5e-4..5e-3 band, and tighter than the 5e-4
    # production-pipeline rung: a warm-started iterate that passes the
    # eps=3e-4 OSQP termination check is already essentially AT the fixed
    # point, so stopping there (instead of polishing out the remaining
    # fixed-count iterations) costs ~nothing in u. Asserted at 5e-5 =
    # >10x headroom over the measured rung. (PERF.md "Oracle acceptance
    # at the headline configuration".)
    assert max_du < 5e-5, f"max |u_kernel - u_oracle| = {max_du}"
