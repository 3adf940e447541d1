"""Native C++ QP core tests (SURVEY.md §2.1 native-code obligations)."""

import numpy as np
import pytest

from autonomous_racing_lpv_mpp_mpc_tpu.oracle import (
    OsqpRefSettings,
    osqp_ref_solve,
    stack_boxqp,
)
from autonomous_racing_lpv_mpp_mpc_tpu.oracle.native import (
    native_available,
    osqp_native_solve,
)

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native core not buildable (no g++)"
)


def _qp(seed):
    from tests.test_solver import random_qp

    return stack_boxqp(random_qp(seed))


@pytest.mark.parametrize("seed", [2, 3, 11])
def test_native_matches_numpy_oracle(seed):
    P, q, A, l, u = _qp(seed)
    ref = osqp_ref_solve(P, q, A, l, u)
    nat = osqp_native_solve(P, q, A, l, u)
    assert nat.converged and ref.converged
    # identical algorithm in both languages: near-machine-precision match
    np.testing.assert_allclose(nat.x, ref.x, atol=1e-9)
    assert nat.iters == ref.iters


def test_native_handles_infinite_bounds():
    P, q, A, l, u = _qp(5)
    l2 = l.copy()
    u2 = u.copy()
    l2[-3:] = -np.inf
    u2[-3:] = np.inf
    nat = osqp_native_solve(P, q, A, l2, u2)
    assert nat.converged
    assert np.all(np.isfinite(nat.x))


def test_native_infeasible_reports_nonconvergence():
    P, q, A, l, u = _qp(6)
    # contradictory bounds on the same row pattern -> primal infeasible
    l2 = l.copy()
    u2 = u.copy()
    # make two parallel rows demand different values of the same expression
    A2 = np.vstack([A, A[-1:]])
    l2 = np.concatenate([l2, [u2[-1] + 5.0]])
    u2 = np.concatenate([u2, [u2[-1] + 6.0]])
    nat = osqp_native_solve(P, q, A2, l2, u2, OsqpRefSettings(max_iter=300))
    assert not nat.converged
    assert np.all(np.isfinite(nat.x))
