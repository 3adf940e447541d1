"""Round-5 solver-speed mechanisms: megastep discretization caching
(SolverConfig.cache_build, VERDICT r4 missing #3) and fused-kernel
early exit (VERDICT r4 next #8). CPU interpret mode."""

import jax
import jax.numpy as jnp
import numpy as np

from autonomous_racing_lpv_mpp_mpc_tpu.core import (
    MPCConfig,
    SolverConfig,
    VehicleParams,
)
from autonomous_racing_lpv_mpp_mpc_tpu.loop import constant_refs
from autonomous_racing_lpv_mpp_mpc_tpu.ops.megastep_kernel import (
    megacache_init,
    megastep,
    megastep_init,
    megastep_params,
)
from autonomous_racing_lpv_mpp_mpc_tpu.track import racetrack

P = VehicleParams()
B = 4


def _setup(N=8):
    cfg = MPCConfig(N=N, model="dynamic")
    track = racetrack()
    x_ref = constant_refs(cfg, 1.6)
    p_b = jax.tree.map(lambda l: jnp.broadcast_to(l, (B,) + jnp.shape(l)), P)
    x0 = jnp.tile(
        jnp.array([1.2, 0.0, 0.0, 0.0, 0.0, 0.05], jnp.float32)[None], (B, 1))
    x0 = x0.at[:, 4].set(jnp.array([0.3, 2.7, 6.1, 9.4]))
    return cfg, track, x_ref, p_b, x0


def test_cache_build_reuse_and_bounded_deviation():
    """The shift-reuse cache: (a) the first step (forced full rebuild) is
    BITWISE the uncached step; (b) reuse actually happens at the default
    tolerance; (c) the per-step control deviation from the fresh-build
    path stays inside the documented band (steady state |du| <= ~5e-3,
    cold-start transient <= 2e-2 = the eps_fallback acceptance band);
    (d) a large state perturbation trips the drift trigger (age resets)."""
    cfg, track, x_ref, p_b, x0 = _setup()
    scfg0 = SolverConfig(max_iter=15, rho_interval=0)
    scfg1 = scfg0.replace(cache_build=True)
    prm = megastep_params(p_b, B)
    step0 = jax.jit(lambda c: megastep(cfg, scfg0, track, prm, x_ref, c,
                                       n_sub=4, interpret=True))
    step1 = jax.jit(lambda c, k: megastep(cfg, scfg1, track, prm, x_ref, c,
                                          n_sub=4, interpret=True, cache=k))

    car = megastep_init(p_b, cfg, track, x0)
    cache = megacache_init(cfg, scfg1, B)

    # (a) first step: the saturated-age init forces a full rebuild ->
    # bitwise-equal to the uncached kernel
    car_a, u_a, d_a = step0(car)
    car_b, u_b, d_b, cache = step1(car, cache)
    np.testing.assert_array_equal(np.asarray(u_a), np.asarray(u_b))
    np.testing.assert_array_equal(np.asarray(car_a.x), np.asarray(car_b.x))
    assert float(np.asarray(cache.age)[0, 0]) == 0.0

    # (b)+(c): 40 fresh-path steps, cached solve forked from the SAME
    # carry each step so the comparison is per-step, not compounded
    car = car_a
    reuse = []
    dus = []
    for t in range(40):
        car_a, u_a, _ = step0(car)
        _, u_b, _, cache = step1(car, cache)
        dus.append(float(np.abs(np.asarray(u_a - u_b)).max()))
        reuse.append(float(np.asarray(cache.age)[0, 0]) > 0)
        car = car_a
    assert np.mean(reuse) > 0.3, np.mean(reuse)
    assert max(dus) < 2e-2, max(dus)
    assert np.median(dus[10:]) < 5e-3, dus

    # (d) drift trigger: teleport the car (schedule breaks) -> rebuild
    car_kick = car._replace(x=car.x + jnp.asarray(
        [1.0, 0.2, 0.5, 0.3, 2.0, 0.2], jnp.float32)[:, None])
    _, _, _, cache2 = step1(car_kick, cache)
    assert float(np.asarray(cache2.age)[0, 0]) == 0.0


def test_fused_early_exit_semantics():
    """Fused-kernel early exit (chunk while_loop around the per-iteration
    body): done-at stays EXACT (the fused body checks every iteration),
    converged lanes match, and the solution agrees with the fixed-count
    kernel at the termination-tolerance level."""
    from autonomous_racing_lpv_mpp_mpc_tpu.loop import mpc_init
    from autonomous_racing_lpv_mpp_mpc_tpu.loop.mpc import mpc_prepare_light
    from autonomous_racing_lpv_mpp_mpc_tpu.ops.fused_kernel import (
        fused_mpc_solve,
    )

    cfg, track, x_ref, p_b, x0 = _setup()
    carry = jax.vmap(lambda pp, x: mpc_init(pp, cfg, track, x))(p_b, x0)

    def solve(scfg, n_warm):
        # warm the carry with a few fixed-count steps so the early-exit
        # case actually exits before max_iter
        (Xs, Us, kap, xr, lb, ub, x0a, warm) = jax.vmap(
            lambda pp, x, c: mpc_prepare_light(pp, cfg, track, x, x_ref, c)
        )(p_b, x0, carry)
        return fused_mpc_solve(
            cfg, scfg, p_b, Xs, Us, kap, xr, lb, ub, x0a,
            warm[0], warm[1], carry.rho, interpret=True,
        )

    scfg_fix = SolverConfig(max_iter=40, rho_interval=0, backend="fused")
    scfg_ee = scfg_fix.replace(early_exit=True, check_termination=5)
    sol_fix = solve(scfg_fix, 0)
    sol_ee = solve(scfg_ee, 0)

    assert bool(jnp.all(sol_fix.converged))
    assert bool(jnp.all(sol_ee.converged))
    # done-at is exact (per-iteration recording survives the chunking)
    np.testing.assert_array_equal(np.asarray(sol_ee.iters),
                                  np.asarray(sol_fix.iters))
    # early exit stops refining at the tolerance level, not machine eps
    np.testing.assert_allclose(np.asarray(sol_ee.U), np.asarray(sol_fix.U),
                               atol=5e-3, rtol=0)
    # and it genuinely exited early: every lane terminated before max_iter
    assert int(np.asarray(sol_ee.iters).max()) < 40
