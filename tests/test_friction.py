"""Online friction adaptation (loop/friction.py; ROADMAP "learning-based
friction adaptation"): mu-hat must converge to the plant's true mu from
lateral-dynamics residuals, measurably recover tracking under mismatch,
coast (not drift) without excitation, and vmap over scenario batches."""

import functools

import jax
import jax.numpy as jnp

from autonomous_racing_lpv_mpp_mpc_tpu.core import (
    MPCConfig,
    SolverConfig,
    VehicleParams,
)
from autonomous_racing_lpv_mpp_mpc_tpu.loop import constant_refs
from autonomous_racing_lpv_mpp_mpc_tpu.loop.friction import (
    adaptive_closed_loop,
    friction_init,
    friction_step,
    measured_axle_forces,
)
from autonomous_racing_lpv_mpp_mpc_tpu.track import oval_track, racetrack

P = VehicleParams()


def test_measured_axle_forces_invert_the_plant():
    """The 2x2 inversion recovers the exact Pacejka forces from a clean
    one-step transition (up to discretization error of the midpoint FD)."""
    from autonomous_racing_lpv_mpp_mpc_tpu.loop import plant_step
    from autonomous_racing_lpv_mpp_mpc_tpu.models.tires import (
        axle_loads,
        tire_force_pacejka,
    )

    cfg = MPCConfig(N=8, model="dynamic", tire="pacejka")
    track = oval_track()
    p_true = P.replace(mu=jnp.asarray(0.6, jnp.float32))
    x = jnp.array([2.0, 0.05, 0.3, 0.02, 1.0, 0.01])
    u = jnp.array([0.15, 0.3])
    x2 = plant_step(p_true, cfg, track, x, u, sim_tire="pacejka")

    fyf_m, fyr_m, af, ar = measured_axle_forces(p_true, x, x2, u, cfg.dt)
    fzf_mu, fzr_mu = axle_loads(p_true)
    fyf_true = tire_force_pacejka(af, p_true.Cf, fzf_mu)
    fyr_true = tire_force_pacejka(ar, p_true.Cr, fzr_mu)
    assert abs(float(fyf_m - fyf_true)) < 0.15 * abs(float(fyf_true)) + 0.05
    assert abs(float(fyr_m - fyr_true)) < 0.15 * abs(float(fyr_true)) + 0.05


def test_mu_converges_to_plant_mu():
    cfg = MPCConfig(N=12, model="dynamic", tire="pacejka")
    scfg = SolverConfig(max_iter=40, rho_interval=10)
    loop = jax.jit(functools.partial(
        adaptive_closed_loop, T=300, mu_true=0.55, mu0=1.0))
    log = loop(P, cfg, scfg, oval_track(),
               jnp.array([1.2, 0.0, 0.0, 0.0, 0.0, 0.0]),
               constant_refs(cfg, 2.2))
    assert abs(float(log.mu_hat[-1]) - 0.55) < 0.05
    # converged well before the end, and STAYS converged
    assert float(jnp.max(jnp.abs(log.mu_hat[150:] - 0.55))) < 0.08
    assert float(jnp.max(jnp.abs(log.X[:, 5]))) < 0.15


def test_adaptation_recovers_tracking_under_mismatch():
    """Aggressive lap at mu_true=0.5 with a mu0=1.0 controller: without
    adaptation the car runs ~0.55 m wide; with it, tracking error drops
    several-fold (measured 0.054 vs 0.229 ey_rms)."""
    cfg = MPCConfig(N=12, model="dynamic", tire="pacejka")
    scfg = SolverConfig(max_iter=40, rho_interval=10)
    track = racetrack()
    x0 = jnp.array([1.2, 0.0, 0.0, 0.0, 0.0, 0.0])
    x_ref = constant_refs(cfg, 2.6)

    run = lambda adapt: jax.jit(functools.partial(
        adaptive_closed_loop, T=400, mu_true=0.5, mu0=1.0, adapt=adapt))(
        P, cfg, scfg, track, x0, x_ref)
    on, off = run(True), run(False)
    ey_rms = lambda log: float(jnp.sqrt(jnp.mean(log.X[:, 5] ** 2)))
    assert ey_rms(on) < 0.5 * ey_rms(off)
    assert float(jnp.max(jnp.abs(on.X[:, 5]))) < 0.25
    assert float(jnp.max(jnp.abs(off.X[:, 5]))) > 0.4


def test_no_update_without_excitation():
    """Straight-line transition (alpha ~ 0): the sensitivity gate must hold
    mu-hat exactly — noise on straights cannot random-walk the estimate."""
    st = friction_init(0.9)
    x = jnp.array([2.0, 0.0, 0.0, 0.0, 1.0, 0.0])
    x2 = jnp.array([2.02, 0.0, 0.0, 0.0, 1.066, 0.0])
    u = jnp.array([0.0, 0.6])
    st2 = friction_step(P, st, x, x2, u, 1.0 / 30.0)
    assert float(st2.mu) == float(st.mu)
    assert float(st2.P) == float(st.P)


def test_adaptive_loop_vmaps_over_scenarios():
    """TPU-first check: a batch of scenarios with DIFFERENT true mus adapts
    independent estimates in one program."""
    cfg = MPCConfig(N=8, model="dynamic", tire="pacejka")
    scfg = SolverConfig(max_iter=30, rho_interval=10)
    track = oval_track()
    x_ref = constant_refs(cfg, 2.0)
    x0 = jnp.array([1.2, 0.0, 0.0, 0.0, 0.0, 0.0])
    mus = jnp.array([0.5, 0.7, 0.9], jnp.float32)

    fn = jax.jit(jax.vmap(
        lambda mu: adaptive_closed_loop(
            P, cfg, scfg, track, x0, x_ref, T=250, mu_true=mu, mu0=1.0)))
    logs = fn(mus)
    finals = logs.mu_hat[:, -1]
    assert jnp.all(jnp.abs(finals - mus) < 0.07), finals
