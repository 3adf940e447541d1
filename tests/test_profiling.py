"""utils.profiling coverage: timing harness + XLA cost analysis."""

import jax.numpy as jnp

from autonomous_racing_lpv_mpp_mpc_tpu.utils import cost_analysis, timed


def test_timed_returns_positive_wall_and_result():
    f = lambda x: (x @ x).sum()
    x = jnp.ones((128, 128))
    secs, out = timed(f, x, warmup=1, iters=2)
    assert secs > 0
    assert float(out) == 128 * 128 * 128


def test_cost_analysis_reports_flops():
    f = lambda a, b: a @ b
    a = jnp.ones((64, 64))
    ca = cost_analysis(f, a, a)
    # CPU/TPU backends report flops for a matmul
    assert isinstance(ca, dict)
    if "flops" in ca:
        assert ca["flops"] >= 2 * 64 * 64 * 64 * 0.5
