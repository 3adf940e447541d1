"""Horizon-axis parallelism: stage evaluation sharded across chips.

SURVEY.md §2.2 "Sequence/context parallel": the MPC horizon is this
domain's sequence dimension. Here the N quasi-LPV stage evaluations
(SURVEY.md §3.1's "N model evals", the reference's Python-loop bottleneck)
are split across the mesh's ``horizon`` axis: each chip linearizes and
discretizes its chunk of stages, an ``all_gather`` over ICI reassembles the
stage tensors, and every chip then runs the Riccati/ADMM solve for its
scenario shard. Residual/metric reductions ``psum`` over both axes.

(In-chip parallel-in-horizon factorization is the associative-scan Riccati
in solver/riccati.py; this module is the *cross-chip* layer on top.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..core.config import MPCConfig, SolverConfig
from ..engine.assembly import build_boxqp, initial_schedule, scheduled_stages
from ..models import model_nx
from ..solver.admm import admm_solve
from ..track.track import Track
from .mesh import HORIZON_AXIS, SCENARIO_AXIS
from .scenarios import ScenarioBatch


def horizon_sharded_solve(
    mesh: Mesh,
    scen: ScenarioBatch,
    cfg: MPCConfig,
    scfg: SolverConfig,
    track: Track,
    x_ref,
):
    """One batched MPC solve with 2D (scenarios x horizon) sharding.

    Requires cfg.N divisible by the horizon axis size. Returns
    (U (B, N, nu), converged (B,)).
    """
    n_h = mesh.shape[HORIZON_AXIS]
    assert cfg.N % n_h == 0, f"N={cfg.N} must divide horizon axis {n_h}"
    chunk = cfg.N // n_h
    nx = model_nx(cfg.model)

    def shard_body(x0_l, params_l):
        hidx = jax.lax.axis_index(HORIZON_AXIS)

        def one(x0, p):
            u0 = jnp.zeros((2,), jnp.float32)
            X_sched, U_sched = initial_schedule(p, cfg, track, x0, u0)

            # each chip along the horizon axis builds its chunk of the QP's
            # stage tensors; all_gather reassembles the full horizon
            lo = hidx * chunk
            Xc = jax.lax.dynamic_slice_in_dim(X_sched, lo, chunk + 1, 0)
            Uc = jax.lax.dynamic_slice_in_dim(U_sched, lo, chunk, 0)
            Adc, Bdc, cdc = scheduled_stages(p, cfg, track, Xc, Uc)
            Ad = jax.lax.all_gather(Adc, HORIZON_AXIS, axis=0, tiled=True)
            Bd = jax.lax.all_gather(Bdc, HORIZON_AXIS, axis=0, tiled=True)
            cd = jax.lax.all_gather(cdc, HORIZON_AXIS, axis=0, tiled=True)

            # assemble the full QP from the gathered stages, then solve
            qp = build_boxqp(
                p, cfg, track, x0, u0, X_sched, U_sched, x_ref,
                stages=(Ad, Bd, cd),
            )
            sol = admm_solve(qp, scfg)
            return sol.U, sol.converged

        U, conv = jax.vmap(one)(x0_l, params_l)
        # cross-axis agreement check: every horizon-chip solved the same QP;
        # psum-average makes divergence (a collective bug) visible in tests
        U = jax.lax.pmean(U, HORIZON_AXIS)
        return U, conv

    fn = shard_map(
        shard_body,
        mesh=mesh,
        in_specs=(P(SCENARIO_AXIS), P(SCENARIO_AXIS)),
        out_specs=(P(SCENARIO_AXIS), P(SCENARIO_AXIS)),
        check_vma=False,
    )
    return fn(scen.x0, scen.params)
