"""Vehicle model + LPV embedding unit tests (SURVEY.md §4.1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autonomous_racing_lpv_mpp_mpc_tpu.core import VehicleParams
from autonomous_racing_lpv_mpp_mpc_tpu.models import (
    discretize_euler,
    discretize_order2,
    f_dynamic,
    f_kinematic,
    lpv_ab_dynamic,
    lpv_ab_kinematic,
    ltv_abc,
    tire_force_linear,
    tire_force_pacejka,
)

pytestmark = pytest.mark.quick  # smoke tier: see pyproject markers


P = VehicleParams()


def test_tire_models_small_slip_slope():
    # pacejka small-slip slope matches linear cornering stiffness
    a = jnp.array(1e-4)
    fz_mu = 10.0
    lin = tire_force_linear(a, 60.0, fz_mu)
    pac = tire_force_pacejka(a, 60.0, fz_mu)
    np.testing.assert_allclose(float(pac), float(lin), rtol=1e-3)


def test_tire_pacejka_saturates():
    fz_mu = 10.0
    f = tire_force_pacejka(jnp.array(1.0), 60.0, fz_mu)
    assert abs(float(f)) <= fz_mu * 1.01


def _point_dyn():
    x = jnp.array([1.5, 0.05, 0.2, 0.03, 2.0, -0.1])
    u = jnp.array([0.08, 0.5])
    kappa = jnp.array(0.5)
    return x, u, kappa


def test_lpv_dynamic_exact_at_scheduling_point():
    """A(theta) x + B(theta) u == f(x, u) up to the atan/small-slip gap."""
    x, u, kappa = _point_dyn()
    A, B = lpv_ab_dynamic(P, x, u, kappa)
    lhs = A @ x + B @ u
    rhs = f_dynamic(P, x, u, kappa, tire="linear")
    # rows e_psi, s, e_y and vy/wz differ only through atan vs linear slip
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=0.08)
    # kinematic rows are exact
    np.testing.assert_allclose(np.asarray(lhs)[3:], np.asarray(rhs)[3:], atol=1e-4)


def test_lpv_kinematic_exact_at_scheduling_point():
    x = jnp.array([1.2, 0.05, 1.0, 0.08])
    u = jnp.array([0.05, 0.3])
    kappa = jnp.array(0.8)
    A, B = lpv_ab_kinematic(P, x, u, kappa)
    lhs = A @ x + B @ u
    rhs = f_kinematic(P, x, u, kappa)
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=2e-3)


def test_lpv_keeps_steering_to_lateral_coupling():
    # sinc embedding: ey must respond to e_psi, and e_psi to delta
    x, u, kappa = _point_dyn()
    A, B = lpv_ab_dynamic(P, x, u, kappa)
    assert abs(float(A[5, 3])) > 0.1      # ey <- e_psi
    assert abs(float(B[2, 0])) > 0.1      # wz <- delta
    Ak, Bk = lpv_ab_kinematic(P, jnp.array([1.2, 0.05, 1.0, 0.08]), u, kappa)
    assert abs(float(Ak[3, 1])) > 0.1
    assert abs(float(Bk[1, 0])) > 0.1


def test_pacejka_linearized_lpv_softens_at_high_slip():
    """BASELINE config 2 "Pacejka-linearized": the LPV's effective cornering
    stiffness is the secant slope of the magic formula at the scheduled
    slip — it must shrink as slip grows, and reduce to linear at zero slip."""
    x_small = jnp.array([2.5, 0.01, 0.05, 0.0, 0.0, 0.0])
    u_small = jnp.array([0.02, 0.5])     # tiny steering -> tiny slip
    # vy=1.5 at vx=2.5 -> slip angles ~0.3-0.5 rad, deep in saturation
    x_large = jnp.array([2.5, 1.5, 0.0, 0.0, 0.0, 0.0])
    u_large = jnp.array([0.25, 0.5])
    A_lin, _ = lpv_ab_dynamic(P, x_small, u_small, 0.8, "linear")
    A_p_small, _ = lpv_ab_dynamic(P, x_small, u_small, 0.8, "pacejka")
    A_p_large, _ = lpv_ab_dynamic(P, x_large, u_large, 0.8, "pacejka")
    # near-zero slip: pacejka ~ linear
    np.testing.assert_allclose(
        float(A_p_small[1, 1]), float(A_lin[1, 1]), rtol=0.05
    )
    # large slip: |A[1,1]| = (Cf_eff+Cr_eff)/(m vx) strictly smaller
    assert abs(float(A_p_large[1, 1])) < 0.8 * abs(float(A_lin[1, 1]))


def test_ltv_matches_numeric_jacobian():
    x, u, kappa = _point_dyn()
    A, B, c = ltv_abc(P, x, u, kappa, "dynamic")
    f0 = f_dynamic(P, x, u, kappa)
    np.testing.assert_allclose(np.asarray(A @ x + B @ u + c), np.asarray(f0), atol=1e-5)
    eps = 1e-4
    for j in range(6):
        dx = jnp.zeros(6).at[j].set(eps)
        fd = (f_dynamic(P, x + dx, u, kappa) - f_dynamic(P, x - dx, u, kappa)) / (2 * eps)
        np.testing.assert_allclose(np.asarray(A[:, j]), np.asarray(fd), atol=1e-2, rtol=5e-3)


def test_discretization_consistency():
    # Euler vs 2nd-order Taylor agree as dt -> 0 (SURVEY.md §4.1)
    x, u, kappa = _point_dyn()
    A, B = lpv_ab_dynamic(P, x, u, kappa)

    def gap(dt):
        A1, B1 = discretize_euler(A, B, dt)
        A2, B2 = discretize_order2(A, B, dt)
        return max(float(jnp.abs(A1 - A2).max()), float(jnp.abs(B1 - B2).max()))

    # Euler vs 2nd-order Taylor differ by the dt^2 term: the gap must shrink
    # quadratically as dt -> 0
    g2, g3 = gap(1e-2), gap(1e-3)
    assert g3 < g2 * 1.5e-2


def test_models_vmap_over_batch():
    x, u, kappa = _point_dyn()
    xb = jnp.tile(x, (32, 1))
    ub = jnp.tile(u, (32, 1))
    kb = jnp.full((32,), kappa)
    Ab, Bb = jax.vmap(lambda a, b, k: lpv_ab_dynamic(P, a, b, k))(xb, ub, kb)
    assert Ab.shape == (32, 6, 6) and Bb.shape == (32, 6, 2)
    fb = jax.vmap(lambda a, b, k: f_dynamic(P, a, b, k))(xb, ub, kb)
    assert fb.shape == (32, 6)


def test_vmap_over_vehicle_params():
    # a friction sweep is a stacked VehicleParams pytree (config 4 pattern)
    x, u, kappa = _point_dyn()
    mus = jnp.linspace(0.6, 1.0, 8)
    params = jax.vmap(lambda m: VehicleParams(mu=m))(mus)
    fb = jax.vmap(lambda p: f_dynamic(p, x, u, kappa, tire="pacejka"))(params)
    assert fb.shape == (8, 6)
    # lower friction => smaller peak lateral tire force at large slip
    from autonomous_racing_lpv_mpp_mpc_tpu.models.tires import axle_loads

    forces = jax.vmap(
        lambda p: tire_force_pacejka(jnp.array(0.4), p.Cf, axle_loads(p)[0])
    )(params)
    assert bool(jnp.all(jnp.diff(forces) > 0))
