"""Fused Pallas TPU kernel: the ENTIRE batched ADMM/Riccati solve in VMEM.

Why (BASELINE.json "fused Pallas kernels", "speed-of-light per chip"):
the XLA path is HBM-bound — every ADMM iteration re-streams the (N, na, na)
stage tensors from HBM through the backward/forward scans. This kernel
loads one block of scenarios' entire QP into VMEM ONCE (~14 KB/scenario),
runs the Riccati factorization plus all ADMM iterations on-chip, and writes
the solution back — HBM traffic drops from O(iters * stages) to O(1).

Layout: the scenario batch is the LANE dimension (last, blocked at 128), so
every small-matrix operation is an (sublane, 128)-shaped VPU op at full
utilization; algebra over the tiny (na<=8, nu=2) dims becomes
broadcast-multiply-reduce over leading axes.

Semantics: identical to solver/admm.py's fixed-iteration path with
rho_interval=0 (factor once, iterate max_iter times; rho adaptation applied
once per solve OUTSIDE the kernel, as the receding-horizon loop does).
Verified against the XLA path in tests/test_ops.py (interpret mode on CPU,
compiled on TPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.config import SolverConfig
from ..solver.admm import ADMMSolution, BoxQP, _folded_cost, _new_rho, ADMMState

PALLAS_BLOCK = 128  # scenarios per kernel program (the lane dimension)


# ---- batched small-matrix helpers (batch = last axis) ----

def _mm(a, b):
    """(i,j,B) @ (j,l,B) -> (i,l,B)"""
    return (a[:, :, None, :] * b[None, :, :, :]).sum(axis=1)


def _mtm(a, b):
    """(j,i,B)^T @ (j,l,B) -> (i,l,B)"""
    return (a[:, :, None, :] * b[:, None, :, :]).sum(axis=0)


def _mv(a, x):
    """(i,j,B) @ (j,B) -> (i,B)"""
    return (a * x[None, :, :]).sum(axis=1)


def _mtv(a, x):
    """(j,i,B)^T @ (j,B) -> (i,B)"""
    return (a * x[:, None, :]).sum(axis=0)


def _ctv(D, y):
    """const (c,i)^T @ (c,B) -> (i,B)"""
    return (D[:, :, None] * y[:, None, :]).sum(axis=0)


def _inv2(H):
    """closed-form inverse of (2,2,B) SPD matrices."""
    a, b = H[0, 0], H[0, 1]
    c, d = H[1, 0], H[1, 1]
    inv_det = 1.0 / (a * d - b * c)
    row0 = jnp.stack([d * inv_det, -b * inv_det])
    row1 = jnp.stack([-c * inv_det, a * inv_det])
    return jnp.stack([row0, row1])


def _stack_g(Dx, Du, X, U):
    """G_k = Dx x_k + Du u_k (u_N = 0): (N+1,nc,B)."""
    N = U.shape[0]
    Gx = (Dx[None, :, :, None] * X[:, None, :, :]).sum(axis=2)
    Gu = (Du[None, :, :, None] * U[:, None, :, :]).sum(axis=2)
    # (concatenate, not .at[].add: scatter has no Mosaic lowering)
    GxN = jax.lax.slice_in_dim(Gx, 0, N, axis=0)
    GxT = jax.lax.slice_in_dim(Gx, N, N + 1, axis=0)
    return jnp.concatenate([GxN + Gu, GxT], axis=0)


def _dual_norm(Dx, Du, y, N):
    """inf-norm of D^T y in the z-space: (B,)."""
    # (separate slice from newaxis: mixing them lowers to an unsupported gather)
    yN = jax.lax.slice_in_dim(y, 0, N, axis=0)
    tx = (Dx[None, :, :, None] * y[:, :, None, :]).sum(axis=1)     # (N+1,na,B)
    tu = (Du[None, :, :, None] * yN[:, :, None, :]).sum(axis=1)    # (N,nu,B)
    red = lambda t: jnp.max(jnp.abs(t), axis=(0, 1))
    return jnp.maximum(red(tx), red(tu))


def _admm_kernel(
    # inputs (VMEM refs; batch-last)
    A_ref, B_ref, c_ref,          # (N,na,na,B) (N,na,nu,B) (N,na,B)
    Qf_ref, q_ref,                # (N+1,na,na,B) (N+1,na,B)
    Rf_ref, r_ref, Mf_ref,        # (N,nu,nu,B) (N,nu,B) (N,na,nu,B)
    Dx_ref, Du_ref, soft_ref,     # (nc,na) (nc,nu) (nc,1)
    lb_ref, ub_ref,               # (N+1,nc,B)
    x0_ref, s0_ref, lam0_ref,     # (na,B) (N+1,nc,B) (N+1,nc,B)
    rho_ref,                      # (1,B)
    # outputs
    X_out, U_out, s_out, lam_out,  # (N+1,na,B) (N,nu,B) (N+1,nc,B) x2
    stats_out,                     # (8,B)
    # scratch
    K_s, Hiv_s, Hux_s, Vc_s, V_s, d_s,
    *, N: int, max_iter: int, sigma: float, alpha: float,
    eps_abs: float, eps_rel: float,
):
    rho = rho_ref[0]                       # (B,)
    Dx = Dx_ref[...]
    Du = Du_ref[...]
    soft = soft_ref[...]                   # (nc,1)

    # ---------- Riccati factorization (backward, once) ----------
    # stage loops are unrolled at trace time (N is static): Mosaic cannot
    # dynamic-slice VALUES with a traced index, and unrolling also lets it
    # software-pipeline the small-matrix ops
    V = Qf_ref[N]
    for k in range(N - 1, -1, -1):
        Ak = A_ref[k]
        Bk = B_ref[k]
        VB = _mm(V, Bk)                                       # (na,nu,B)
        Huu = Rf_ref[k] + _mtm(Bk, VB)                        # (nu,nu,B)
        VA = _mm(V, Ak)                                       # (na,na,B)
        Hux = jnp.swapaxes(Mf_ref[k], 0, 1) + _mtm(Bk, VA)    # (nu,na,B)
        Hiv = _inv2(Huu)
        K = -_mm(Hiv, Hux)                                    # (nu,na,B)
        Vc_s[k] = _mv(V, c_ref[k])
        K_s[k] = K
        Hiv_s[k] = Hiv
        Hux_s[k] = Hux
        Vn = Qf_ref[k] + _mtm(Ak, VA) + _mtm(Hux, K)
        V = 0.5 * (Vn + jnp.swapaxes(Vn, 0, 1))
    V_s[...] = V

    # ---------- ADMM iterations ----------
    def one_iteration(carry):
        s, lam, X, U = carry
        v = s - lam / rho                                     # (N+1,nc,B)

        # backward affine sweep (unrolled; writes d_s)
        vvec = q_ref[N] - rho * _ctv(Dx, v[N]) - sigma * X[N]
        for k in range(N - 1, -1, -1):
            q_k = q_ref[k] - rho * _ctv(Dx, v[k]) - sigma * X[k]
            r_k = r_ref[k] - rho * _ctv(Du, v[k]) - sigma * U[k]
            w = Vc_s[k] + vvec
            h_u = r_k + _mtv(B_ref[k], w)
            d = -_mv(Hiv_s[k], h_u)
            d_s[k] = d
            vvec = q_k + _mtv(A_ref[k], w) + _mtv(Hux_s[k], d)

        # forward rollout (unrolled; writes X_out/U_out rows)
        x = x0_ref[...]
        for k in range(N):
            u = _mv(K_s[k], x) + d_s[k]
            x = _mv(A_ref[k], x) + _mv(B_ref[k], u) + c_ref[k]
            U_out[k] = u
            X_out[k + 1] = x
        Xn = X_out[...]
        Un = U_out[...]

        G = _stack_g(Dx, Du, Xn, Un)
        w_rel = alpha * G + (1.0 - alpha) * s
        wl = w_rel + lam / rho
        clipped = jnp.clip(wl, lb_ref[...], ub_ref[...])
        beta = jnp.minimum(soft, 1e30)[None, :, :]            # (1,nc,1)
        soft_s = (beta * clipped + rho * wl) / (beta + rho)
        s_new = jnp.where(jnp.isinf(soft)[None, :, :], clipped, soft_s)
        lam_new = lam + rho * (w_rel - s_new)
        return (s_new, lam_new, Xn, Un), G

    red_b = lambda t: jnp.max(jnp.abs(t), axis=(0, 1))
    f32 = X_out.dtype

    def iter_body(i, carry):
        inner, da = carry
        s_old = inner[0]
        new_inner, G = one_iteration(inner)
        s_new, lam_new = new_inner[0], new_inner[1]
        # done-at tracking (solver/admm.py termination-check formulas)
        r_p = red_b(G - s_new)
        r_d = rho * _dual_norm(Dx, Du, s_new - s_old, N)
        e_p = eps_abs + eps_rel * jnp.maximum(red_b(G), red_b(s_new))
        e_d = eps_abs + eps_rel * _dual_norm(Dx, Du, lam_new, N)
        conv_it = jnp.logical_and(r_p <= e_p, r_d <= e_d)
        itv = (jnp.asarray(i, jnp.int32) + 1).astype(f32)
        da = jnp.where(jnp.logical_and(da < 0.0, conv_it), itv, da)
        return new_inner, da

    X_out[0] = x0_ref[...]
    X_init = jnp.zeros(X_out.shape, X_out.dtype)
    U_init = jnp.zeros(U_out.shape, U_out.dtype)
    da0 = jnp.full((rho.shape[-1],), -1.0, f32)
    carry, done_at = jax.lax.fori_loop(
        0, max_iter - 1, iter_body,
        ((s0_ref[...], lam0_ref[...], X_init, U_init), da0),
    )

    s_prev = carry[0]
    (s_f, lam_f, X_f, U_f), G = one_iteration(carry)

    X_out[...] = X_f
    U_out[...] = U_f
    s_out[...] = s_f
    lam_out[...] = lam_f

    red = lambda t: jnp.max(jnp.abs(t), axis=(0, 1))
    ds = s_f - s_prev
    zero = jnp.zeros((rho.shape[-1],), X_f.dtype)
    stats_out[0] = red(G - s_f)                    # r_prim
    stats_out[1] = rho * _dual_norm(Dx, Du, ds, N)  # r_dual
    stats_out[2] = red(G)                          # |w|_inf
    stats_out[3] = red(s_f)                        # |s|_inf
    stats_out[4] = _dual_norm(Dx, Du, lam_f, N)    # |D^T lam|_inf
    # row 5: done-at iteration; lanes that first converge on the final
    # iteration (or never) report max_iter, matching solver/admm.py
    stats_out[5] = jnp.where(done_at > 0.0, done_at,
                             jnp.full(done_at.shape, float(max_iter), f32))
    stats_out[6] = zero
    stats_out[7] = zero


def pallas_admm_solve(
    qp: BoxQP,
    cfg: SolverConfig,
    warm=None,
    rho0=None,
    interpret: bool = False,
) -> ADMMSolution:
    """Batched ADMM via the fused kernel.

    ``qp`` leaves have a leading batch axis B (as produced by
    ``jax.vmap(build_boxqp)``); Dx/Du/soft must be identical across the
    batch (the engine guarantees this). B is padded to a multiple of
    PALLAS_BLOCK internally. Fixed iteration count; rho adaptation is
    applied once per solve on the way out (matching rho_interval=0).
    """
    B = qp.x0.shape[0]
    N = qp.dyn.A.shape[1]
    na = qp.dyn.A.shape[2]
    nu = qp.dyn.B.shape[3]
    nc = qp.Dx.shape[1]
    f32 = qp.dyn.A.dtype

    if rho0 is None:
        rho0 = jnp.full((B,), cfg.rho, f32)
    else:
        rho0 = jnp.broadcast_to(jnp.asarray(rho0, f32), (B,))

    if warm is None:
        s0 = jnp.clip(jnp.zeros((B, N + 1, nc), f32), qp.lb, qp.ub)
        lam0 = jnp.zeros((B, N + 1, nc), f32)
    else:
        s0, lam0 = warm[0], warm[1]
        s0 = jnp.clip(s0, qp.lb, qp.ub)

    cost_f = jax.vmap(lambda q, r: _folded_cost(q, r, cfg.sigma))(qp, rho0)

    # pad the batch to a PALLAS_BLOCK multiple
    Bp = -(-B // PALLAS_BLOCK) * PALLAS_BLOCK
    pad = Bp - B

    def prep(leaf):
        if pad:
            leaf = jnp.concatenate(
                [leaf, jnp.repeat(leaf[:1], pad, axis=0)], axis=0
            )
        return jnp.moveaxis(leaf, 0, -1)

    A_ = prep(qp.dyn.A)
    B_ = prep(qp.dyn.B)
    c_ = prep(qp.dyn.c)
    Qf = prep(cost_f.Q)
    q_ = prep(qp.cost.q)
    Rf = prep(cost_f.R)
    r_ = prep(qp.cost.r)
    Mf = prep(cost_f.M)
    lb = prep(qp.lb)
    ub = prep(qp.ub)
    x0 = prep(qp.x0)
    s0p = prep(s0)
    lam0p = prep(lam0)
    rhop = prep(rho0)[None, :]            # (1,Bp)

    Dx = qp.Dx[0]
    Du = qp.Du[0]
    soft = qp.soft[0][:, None]            # (nc,1)

    PB = PALLAS_BLOCK
    grid = (Bp // PB,)

    def bspec(shape):
        nd = len(shape)
        return pl.BlockSpec(
            shape[:-1] + (PB,),
            lambda i, _nd=nd: (0,) * (_nd - 1) + (i,),
            memory_space=pltpu.VMEM,
        )

    def cspec(shape):
        return pl.BlockSpec(
            shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
        )

    kernel = functools.partial(
        _admm_kernel, N=N, max_iter=cfg.max_iter,
        sigma=float(cfg.sigma), alpha=float(cfg.alpha),
        eps_abs=float(cfg.eps_abs), eps_rel=float(cfg.eps_rel),
    )

    out_shapes = (
        jax.ShapeDtypeStruct((N + 1, na, Bp), f32),   # X
        jax.ShapeDtypeStruct((N, nu, Bp), f32),       # U
        jax.ShapeDtypeStruct((N + 1, nc, Bp), f32),   # s
        jax.ShapeDtypeStruct((N + 1, nc, Bp), f32),   # lam
        jax.ShapeDtypeStruct((8, Bp), f32),           # stats
    )
    ins = (A_, B_, c_, Qf, q_, Rf, r_, Mf, Dx, Du, soft, lb, ub,
           x0, s0p, lam0p, rhop)
    in_specs = [
        bspec(A_.shape), bspec(B_.shape), bspec(c_.shape),
        bspec(Qf.shape), bspec(q_.shape),
        bspec(Rf.shape), bspec(r_.shape), bspec(Mf.shape),
        cspec(Dx.shape), cspec(Du.shape), cspec(soft.shape),
        bspec(lb.shape), bspec(ub.shape),
        bspec(x0.shape), bspec(s0p.shape), bspec(lam0p.shape),
        bspec(rhop.shape),
    ]
    out_specs = tuple(bspec(s.shape) for s in out_shapes)
    scratch = [
        pltpu.VMEM((N, nu, na, PB), f32),    # K
        pltpu.VMEM((N, nu, nu, PB), f32),    # Huu_inv
        pltpu.VMEM((N, nu, na, PB), f32),    # Hux
        pltpu.VMEM((N, na, PB), f32),        # Vc
        pltpu.VMEM((na, na, PB), f32),       # V
        pltpu.VMEM((N, nu, PB), f32),        # d
    ]

    X, U, s, lam, stats = pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=out_shapes,
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch,
        interpret=interpret,
    )(*ins)

    unprep = lambda a: jnp.moveaxis(a, -1, 0)[:B]
    X, U, s, lam = map(unprep, (X, U, s, lam))
    stats = jnp.moveaxis(stats, -1, 0)[:B]

    r_prim, r_dual = stats[:, 0], stats[:, 1]
    eps_prim = cfg.eps_abs + cfg.eps_rel * jnp.maximum(stats[:, 2], stats[:, 3])
    eps_dual = cfg.eps_abs + cfg.eps_rel * stats[:, 4]
    converged = jnp.logical_and(r_prim <= eps_prim, r_dual <= eps_dual)

    # once-per-solve rho adaptation (mirrors the XLA rho_interval=0 path)
    st = ADMMState(X, U, s, lam, r_prim, r_dual, eps_prim, eps_dual,
                   jnp.zeros((B,), bool))
    rho_new = jax.vmap(_new_rho)(rho0, st)

    return ADMMSolution(
        X=X, U=U, s=s, lam=lam, r_prim=r_prim, r_dual=r_dual,
        converged=converged,
        iters=stats[:, 5].astype(jnp.int32),
        rho=rho_new,
        primal_infeasible=jnp.zeros((B,), bool),
    )
