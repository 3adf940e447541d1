"""Racestep kernel: the COMPOSED deployment step in ONE Pallas launch.

The reference's actual hot loop is the full composition estimate -> plan ->
solve -> apply -> simulate (SURVEY.md §3.1); ``loop/race.py`` races every
subsystem together but drives the tracker on the XLA path, ~250x below the
megastep headline (VERDICT r4 missing #1). This kernel moves the ENTIRE
composed step on-chip, per 128-lane block:

    world-frame truth -> windowed global->Frenet measurement (+ sensor
    noise) -> sub-stepped EKF at mu-hat -> friction RLS (mu-hat update) ->
    warm-started LPV-MPC tracker at mu-hat (shared ``_mpc_core`` — the
    EXACT megastep solver region) -> world-frame Pacejka plant at mu-true

Stage-by-stage parity targets (each cites the XLA twin it mirrors):

- measurement: ``loop/global_loop.py::estimate_frenet`` /
  ``track/track.py::global_to_frenet_windowed`` — hint-windowed nearest-
  node search + tangent projection + hint-based lap unwrap. In-kernel the
  window is the 3 table CHUNKS around the hint (each chunk fetched by one
  (n_chunks, B) one-hot MXU contraction — per-lane dynamic gathers have no
  Mosaic lowering), masked to ±``win_cells`` wrapped cells.
- EKF: ``loop/estimator.py::ekf_step`` — sub-stepped Euler predict of the
  nonlinear Frenet model at the CONTROLLER's mu-hat, transition Jacobian as
  the product of per-substep (I + h·J) with J by central finite differences
  (the XLA twin uses ``jacfwd``; both treat curvature as locally constant
  because the table gather has zero index-gradient), diagonal Q/R, H = I,
  batched 6x6 Gauss-Jordan innovation solve.
- friction RLS: ``loop/friction.py::friction_step`` — axle-force inversion
  at the filtered midpoint state, two sequential excitation-gated scalar
  updates with the ANALYTIC dFy/dmu of the magic formula (the XLA twin uses
  ``jax.value_and_grad``; equality pinned in tests/test_racestep.py).
- tracker: ``ops/megastep_kernel.py::_mpc_core`` — shared code, so the
  solver-hot region traces the SAME Mosaic program as the megastep kernel
  (early exit, done-at diagnostics, limp-home fallback included).
- plant: ``loop/global_loop.py::global_plant_step`` — fine-Euler world-
  frame dynamic bicycle at the TRUE per-lane friction.

The closed-loop carry (truth + estimator + RLS + warm start) lives
batch-last across the lap scan exactly like the megastep carry; per-step
XLA work is only the reference-table sampling and the noise draw.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.config import MPCConfig, SolverConfig, VehicleParams
from ..track.track import Track
from .admm_kernel import PALLAS_BLOCK, _mm, _mv
from .fused_kernel import _make_consts
from .megastep_kernel import _make_kap_at, _mpc_core, _table_inputs
from .stage_math import (
    NC,
    NU,
    PACEJKA_C,
    VX_EPS,
    atan2_bl,
    atan_bl,
    f_dynamic_bl,
    f_global_bl,
    unpack_params,
)

NX = 6
MU_MIN, MU_MAX = 0.1, 1.5       # loop/friction.py clip range


class RaceMegaCarry(NamedTuple):
    """Batch-last closed-loop carry of the composed racestep."""

    xg: jnp.ndarray        # (6, B) world-frame plant truth
    ekx: jnp.ndarray       # (6, B) EKF mean (unwrapped s at row 4)
    ekP: jnp.ndarray       # (6, 6, B) EKF covariance
    fr: jnp.ndarray        # (2, B): [mu_hat, P_rls]
    x_prev_f: jnp.ndarray  # (6, B) previous filtered state (RLS residual)
    X_pred: jnp.ndarray    # (N+1, NX, B) tracker warm start
    U_pred: jnp.ndarray    # (N, NU, B)
    s: jnp.ndarray         # (N+1, NC, B)
    lam: jnp.ndarray       # (N+1, NC, B)
    u_prev: jnp.ndarray    # (NU, B)
    rho: jnp.ndarray       # (B,)


def _inv6(S, row):
    """Batched (6, 6, B) matrix inverse by unrolled Gauss-Jordan.

    No pivoting: S = P_pred + diag(R) is SPD with a strictly positive
    diagonal (the innovation covariance), so the pivots never vanish.
    ``row`` is a precomputed (6, 6, B) row-index iota."""
    M = S
    Inv = (row == jax.lax.broadcasted_iota(jnp.int32, S.shape, 1)).astype(
        S.dtype)
    for j in range(6):
        rec = 1.0 / M[j, j]                      # (B,)
        Mj = M[j] * rec
        Ij = Inv[j] * rec
        fac = M[:, j]                            # (6, B)
        M2 = M - fac[:, None, :] * Mj[None, :, :]
        In2 = Inv - fac[:, None, :] * Ij[None, :, :]
        is_j = row == j
        M = jnp.where(is_j, Mj[None, :, :], M2)
        Inv = jnp.where(is_j, Ij[None, :, :], In2)
    return Inv


def _racestep_kernel(
    # batched inputs (batch-last)
    xg_ref,       # (6, B) world truth
    ekx_ref,      # (6, B) EKF mean
    ekP_ref,      # (6, 6, B)
    fr_ref,       # (2, B) [mu_hat, P_rls]
    xprev_ref,    # (6, B) previous filtered state
    noise_ref,    # (6, B) pre-scaled sensor noise for this step
    mtrue_ref,    # (1, B) per-lane TRUE plant friction
    Xp_ref, Up_ref, sw_ref, lamw_ref, uprev_ref,   # tracker warm start
    rho_ref,      # (1, B)
    xref_ref,     # (N+1, NX, B) tracking reference
    prm_ref,      # (10, B) NOMINAL vehicle params (mu row = mu0)
    *refs,
    # statics
    N: int, dt: float, max_iter: int, sigma: float, alpha: float,
    tire: str, sim_tire: str, n_sub: int, n_sub_ekf: int, n_cells: int,
    eps_abs: float, eps_rel: float, eps_fallback: float, check: int,
    early_exit: bool,
    vx_min: float, vx_max: float, ey_max: float, delta_max: float,
    a_min: float, a_max: float, ddelta_max: float, da_max: float,
    kappa_speed_cap: bool, a_lat_frac: float,
    squarings: int, order: int, unroll_sweeps: bool, unroll_iters: bool,
    use_ekf: bool, adapt_mu: bool, gate_sigma: float,
    forgetting: float, min_sensitivity: float, win_cells: int,
    fd_eps: float, has_eyb: bool,
    use_table_refs: bool = False, n_ref: int = 0,
    per_lane_refs: bool = False, ref_single_level: bool = False,
    kap_back: int = 0, kap_chunks: int = 0,   # >0: windowed local lookup
):
    f32 = jnp.float32
    if has_eyb:
        eyb_ref, refs = refs[0], refs[1:]
    else:
        eyb_ref = None
    (ktab_ref, taux_ref, xtab_ref, ytab_ref, ptab_ref,
     ekq_ref, ekr_ref) = refs[:7]
    refs = refs[7:]
    if use_table_refs:
        (rvx_ref, rey_ref, rep_ref, rtaux_ref), refs = refs[:4], refs[4:]
    consts = refs[:14]
    (xg_out, ekx_out, ekP_out, fr_out, xf_out, z_out,
     Xp_out, Up_out, s_out, lam_out, u0_out, stats_out) = refs[14:26]
    scratch = refs[26:]
    if use_table_refs:
        scratch, xref_s = scratch[:-1], scratch[-1]

    pv = unpack_params(prm_ref)
    rho = rho_ref[0]
    B = rho.shape[-1]
    if kap_chunks > 0:
        # block-local windowed lookup around the EKF's s hint (see
        # megastep_kernel._make_kap_at_windowed): every composed-stage
        # consumer — the measurement's projection correction at s_w (within
        # win_cells of the hint), the EKF substeps, the tracker schedule —
        # stays inside the window by the same sizing as the tracker's
        from .megastep_kernel import _make_kap_at_windowed
        kap_at, length, inv_ds = _make_kap_at_windowed(
            ktab_ref, taux_ref, n_cells, B, ekx_ref[4],
            kap_back, kap_chunks)
    else:
        kap_at, length, inv_ds = _make_kap_at(ktab_ref, taux_ref,
                                              n_cells, B)
    ds = 1.0 / inv_ds
    xg = xg_ref[...]
    ekx = ekx_ref[...]
    u_prev = uprev_ref[...]

    # controller-side friction: race_loop step order — the EKF and the
    # tracker run at the PREVIOUS step's mu-hat; the RLS update below
    # produces the next one (loop/race.py::_make_segment).
    mu_ctrl = fr_ref[0] if adapt_mu else pv["mu"]
    pv_hat = dict(pv, mu=mu_ctrl)

    # ---- 1. measurement: hint-windowed global->Frenet + noise ----------
    # (track/track.py::global_to_frenet_windowed semantics; the window is
    # the 3 pose-table chunks around the hint cell, masked to ±win_cells)
    xtab = xtab_ref[...]
    ytab = ytab_ref[...]
    n_chunks, C = xtab.shape
    Xw, Yw, psiw = xg[3], xg[4], xg[5]
    s_hint = ekx[4]
    sm_h = s_hint - length * jnp.floor(s_hint / length)
    i_hint = jnp.clip((sm_h * inv_ds).astype(jnp.int32), 0, n_cells - 1)
    j_hint = i_hint // C
    row_chunk = jax.lax.broadcasted_iota(jnp.int32, (n_chunks, B), 0)
    off = jax.lax.broadcasted_iota(jnp.int32, (C, B), 0)

    BIG = jnp.float32(1e30)
    d2_best = jnp.full((B,), BIG, f32)
    id_best = jnp.zeros((B,), f32)
    n_chunks0 = -(-n_cells // C)
    if n_chunks0 <= 2:
        # tiny table: the (unextended) chunks cover everything
        jjs = [(j_hint + dj) % n_chunks0 for dj in range(n_chunks0)]
    else:
        # TWO dynamically-chosen chunks instead of the static {-1, 0, +1}
        # triple (r5): the pose tables carry a C-cell REPLICATED HEAD
        # (_pose_table_inputs), so the C consecutive extended-table cells
        # starting at (i_hint - C/2) mod n_cells NEVER wrap — they span at
        # most two aligned chunks, and those two chunks give a guaranteed
        # +-C/2-cell candidate window (1.28 m on the racetrack table)
        # around the hint regardless of the track-end seam. The hint
        # error this window guards is centimeters (the EKF's s between
        # 30 Hz frames), and the static triple was already a truncation
        # of the nominal +-win_cells mask; this drops one of the three
        # chunk fetches (~1/3 of the measurement-search work).
        w_start = i_hint - C // 2
        w_start = jnp.where(w_start < 0, w_start + n_cells, w_start)
        jjs = [w_start // C, (w_start + (C - 1)) // C]
    for jj in jjs:
        ohj = (row_chunk == jj[None, :]).astype(f32)
        Xc = jax.lax.dot_general(xtab, ohj, (((0,), (0,)), ((), ())),
                                 preferred_element_type=f32)   # (C, B)
        Yc = jax.lax.dot_general(ytab, ohj, (((0,), (0,)), ((), ())),
                                 preferred_element_type=f32)
        ids_ext = jj[None, :] * C + off                    # (C, B)
        # replicated-head cells alias their canonical ids; cells past the
        # replica region are layout padding (invalid)
        in_rep = ids_ext >= n_cells
        ids = jnp.where(in_rep, ids_ext - n_cells, ids_ext)
        d_cells = ids - i_hint[None, :]
        d_cells = jnp.where(d_cells < 0, d_cells + n_cells, d_cells)
        dwrap = jnp.minimum(d_cells, n_cells - d_cells)
        valid = jnp.logical_and(ids_ext < n_cells + (0 if n_chunks0 <= 2
                                                     else C),
                                dwrap <= win_cells)
        d2 = (Xw[None, :] - Xc) ** 2 + (Yw[None, :] - Yc) ** 2
        d2 = jnp.where(valid, d2, BIG)
        m = jnp.min(d2, axis=0)                            # (B,)
        idm = jnp.min(
            jnp.where(d2 <= m[None, :], ids.astype(f32), BIG), axis=0)
        take = m < d2_best
        d2_best = jnp.where(take, m, d2_best)
        id_best = jnp.where(take, idm, id_best)
    i_star = id_best.astype(jnp.int32)

    # one (chunk, within-chunk) one-hot pair shared by all three pose
    # channels (same index) — the same sharing trick as the ref tables
    ohc_star = (row_chunk == (i_star // C)[None, :]).astype(f32)
    ohw_star = (off == (i_star % C)[None, :]).astype(f32)

    def fetch(tab_ref):
        sel = jax.lax.dot_general(tab_ref[...], ohc_star,
                                  (((0,), (0,)), ((), ())),
                                  preferred_element_type=f32)
        return (sel * ohw_star).sum(axis=0)

    Xi = fetch(xtab_ref)
    Yi = fetch(ytab_ref)
    Pi = fetch(ptab_ref)
    tx, ty = jnp.cos(Pi), jnp.sin(Pi)
    ddx = Xw - Xi
    ddy = Yw - Yi
    along = ddx * tx + ddy * ty
    e_y = -ddx * ty + ddy * tx
    s_raw = i_star.astype(f32) * ds + along
    s_w = s_raw - length * jnp.floor(s_raw / length)
    pc = Pi + kap_at(s_w) * along
    dpsi = psiw - pc
    e_psi = atan2_bl(jnp.sin(dpsi), jnp.cos(dpsi))
    lap = jnp.floor((s_hint - s_w) / length + 0.5)         # round-to-nearest
    s_unw = s_w + lap * length
    z = jnp.concatenate([
        xg[0:3], e_psi[None], s_unw[None], e_y[None],
    ], axis=0) + noise_ref[...]
    z_out[...] = z

    # ---- 2. EKF at mu-hat (loop/estimator.py::ekf_step) -----------------
    row6 = jax.lax.broadcasted_iota(jnp.int32, (6, 6, B), 0)
    col6 = jax.lax.broadcasted_iota(jnp.int32, (6, 6, B), 1)
    I6 = (row6 == col6).astype(f32)
    if use_ekf:
        h = dt / n_sub_ekf
        rowv = jax.lax.broadcasted_iota(jnp.int32, (NX, 1), 0)
        x_e = ekx
        F = I6
        for _ in range(n_sub_ekf):
            kapv = kap_at(x_e[4])
            fx = f_dynamic_bl(pv_hat, x_e, u_prev, kapv, tire)
            # FORWARD differences reusing the center eval (6+1 model evals
            # per substep instead of the central scheme's 12): the f32
            # forward-diff error (~1e-3 relative at this eps) only enters
            # the covariance propagation, where it is far below the
            # process-noise floor — measured: composed-loop parity vs the
            # jacfwd XLA twin unchanged at the 1e-5 level.
            cols = []
            for j in range(NX):
                pert = jnp.where(rowv == j, jnp.float32(fd_eps), 0.0)
                fp = f_dynamic_bl(pv_hat, x_e + pert, u_prev, kapv, tire)
                cols.append((fp - fx) * jnp.float32(1.0 / fd_eps))
            J = jnp.stack(cols, axis=1)                    # (6, 6, B)
            F = _mm(I6 + h * J, F)
            x_e = x_e + h * fx
        P = ekP_ref[...]
        Qd = ekq_ref[...]                                  # (6, 1)
        Pp = _mm(F, _mm(P, jnp.swapaxes(F, 0, 1)))
        Pp = Pp + I6 * Qd[:, :, None] * jnp.ones((1, 1, B), f32)
        Rd_b = ekr_ref[...] * jnp.ones((6, B), f32)        # (6, B)
        nu = z - x_e
        if gate_sigma > 0.0:
            # per-channel innovation gating (loop/estimator.py gate_sigma
            # semantics, diagonal-R form): a channel whose innovation
            # exceeds gate*sqrt(S0_ii) has its R inflated so it barely
            # updates this cycle — one-frame sensor glitches stay
            # one-frame instead of being smeared by the filter
            Pp_diag = jnp.stack([Pp[j, j] for j in range(6)])   # (6, B)
            S0d = Pp_diag + Rd_b
            outlier = jnp.abs(nu) > gate_sigma * jnp.sqrt(S0d)
            Rd_b = Rd_b + jnp.where(outlier, 1e6 * S0d, 0.0)
        S = Pp + I6 * Rd_b[:, None, :]
        Sinv = _inv6(S, row6)
        K = _mm(Pp, Sinv)
        xf = x_e + _mv(K, nu)
        Pn = _mm(I6 - K, Pp)
        Pn = 0.5 * (Pn + jnp.swapaxes(Pn, 0, 1))
        ekx_out[...] = xf
        ekP_out[...] = Pn
    else:
        xf = z
        ekx_out[...] = z
        ekP_out[...] = ekP_ref[...]

    # ---- 3. friction RLS (loop/friction.py::friction_step) -------------
    if adapt_mu:
        xp = xprev_ref[...]
        x_mid = 0.5 * (xp + xf)
        vx, vy, wz = x_mid[0], x_mid[1], x_mid[2]
        vy_dot = (xf[1] - xp[1]) / dt
        wz_dot = (xf[2] - xp[2]) / dt
        delta = u_prev[0]
        m_, Iz, lf, lr = pv["m"], pv["Iz"], pv["lf"], pv["lr"]
        y1 = m_ * (vy_dot + wz * vx)
        y2 = Iz * wz_dot
        L = lf + lr
        cd = jnp.cos(delta)
        cdg = jnp.where(jnp.abs(cd) < 0.1, 0.1, cd)
        fyf_m = (lr * y1 + y2) / (L * cdg)
        fyr_m = (lf * y1 - y2) / L
        vx_safe = jnp.maximum(vx, VX_EPS)
        a_f = delta - atan2_bl(vy + lf * wz, vx_safe)
        a_r = -atan2_bl(vy - lr * wz, vx_safe)
        fzf0 = m_ * pv["g"] * lr / L                       # base load, no mu
        fzr0 = m_ * pv["g"] * lf / L
        mu = fr_ref[0]
        Pr = fr_ref[1]
        for y_m, alpha_x, stiff, fz in (
            (fyf_m, a_f, pv["Cf"], fzf0),
            (fyr_m, a_r, pv["Cr"], fzr0),
        ):
            D = jnp.maximum(mu * fz, 1e-6)
            Bp = stiff / (PACEJKA_C * D)
            t = Bp * alpha_x
            th = PACEJKA_C * atan_bl(t)
            hval = mu * fz * jnp.sin(th)
            # analytic dFy/dmu of D sin(C atan(B a)) with B = stiff/(C D):
            # fz [sin th - cos th * C t / (1 + t^2)] (tests pin it against
            # jax.grad of the XLA tire model)
            Jg = fz * (jnp.sin(th)
                       - jnp.cos(th) * PACEJKA_C * t / (1.0 + t * t))
            gate = jnp.abs(Jg) >= min_sensitivity * fz
            Srls = forgetting + Jg * Pr * Jg
            Krls = Pr * Jg / Srls
            mu2 = jnp.clip(mu + Krls * (y_m - hval), MU_MIN, MU_MAX)
            P2 = (Pr - Krls * Jg * Pr) / forgetting
            mu = jnp.where(gate, mu2, mu)
            Pr = jnp.where(gate, P2, Pr)
        fr_out[...] = jnp.stack([mu, Pr])
    else:
        mu = fr_ref[0]
        fr_out[...] = fr_ref[...]

    # ---- 3b. reference sampling IN-KERNEL (planner/reftable.py::
    # refs_from_table semantics: linear-interp lookup + racing-line heading
    # from the +-probe e_y slope, seam-artifact guard). Host-side sampling
    # was measured at ~24 ms/step at batch 4096 — the same catastrophic
    # XLA-gather class as the r1 curvature windows — so the tables ride
    # along as chunked VMEM operands exactly like the track tables.
    if use_table_refs:
        rtaux = rtaux_ref[...]
        Lt = rtaux[0, 0]
        inv_dst = rtaux[1, 0]
        rvx_t = rvx_ref[...]
        rey_t = rey_ref[...]
        rep_t = rep_ref[...]
        # all three channels sample at the SAME s, so the (i0, i1, t)
        # one-hots are built ONCE per stage and applied to each table —
        # and the racing-line heading rides a PRECOMPUTED e_psi node
        # table (the exact refs_from_table slope formula evaluated at
        # the nodes host-side) instead of four extra +-probe e_y
        # fetches. Measured: the naive per-channel sampling was ~1.06
        # ms of the 3.63 ms composed step.
        if per_lane_refs or ref_single_level:
            # SINGLE-LEVEL soft one-hot over the row axis: one weighted
            # one-hot per stage ((1-t) at i0, t at i1) applied to all
            # three channel tables by broadcasting — (n_pad, 1) shared
            # tables and (n_pad, B) PER-LANE tables take the same code.
            # Pure VPU: measured faster than the two-level MXU scheme for
            # the small ref tables (the two-level path serialized ~126
            # small chunk-select matmuls per step, each paying MXU issue
            # latency). The chunked MXU path below remains for very long
            # tables (> _REF_SINGLE_LEVEL_MAX nodes), where O(n) VPU rows
            # per fetch would dominate.
            nt_pad = rvx_t.shape[0]
            rows_t = jax.lax.broadcasted_iota(jnp.int32, (nt_pad, B), 0)

            def refs_at(s):
                smt = s - Lt * jnp.floor(s / Lt)
                ff = smt * inv_dst
                i0 = jnp.clip(ff.astype(jnp.int32), 0, n_ref - 1)
                i1 = (i0 + 1) % n_ref
                tt = ff - i0.astype(f32)
                oh = ((rows_t == i0[None, :]).astype(f32) * (1.0 - tt)
                      + (rows_t == i1[None, :]).astype(f32) * tt)
                return ((rvx_t * oh).sum(axis=0),
                        (rey_t * oh).sum(axis=0),
                        (rep_t * oh).sum(axis=0))
        else:
            nct, Ct = rvx_t.shape
            rowc_t = jax.lax.broadcasted_iota(jnp.int32, (nct, B), 0)
            off_t = jax.lax.broadcasted_iota(jnp.int32, (Ct, B), 0)

            def refs_at(s):
                smt = s - Lt * jnp.floor(s / Lt)
                ff = smt * inv_dst
                i0 = jnp.clip(ff.astype(jnp.int32), 0, n_ref - 1)
                i1 = (i0 + 1) % n_ref
                tt = ff - i0.astype(f32)
                outs = []
                for idx, w in ((i0, 1.0 - tt), (i1, tt)):
                    ohc = (rowc_t == (idx // Ct)[None, :]).astype(f32)
                    ohw = (off_t == (idx % Ct)[None, :]).astype(f32) \
                        * w[None, :]
                    row = []
                    for tab in (rvx_t, rey_t, rep_t):
                        sel = jax.lax.dot_general(
                            tab, ohc, (((0,), (0,)), ((), ())),
                            preferred_element_type=f32)
                        row.append((sel * ohw).sum(axis=0))
                    outs.append(row)
                return tuple(a + b for a, b in zip(outs[0], outs[1]))

        zB = jnp.zeros((B,), f32)
        for k in range(N + 1):
            # the SHIFTED schedule's s (megastep_refs row semantics):
            # row 0 = the filtered state, rows 1..N = X_pred[min(k+1, N)]
            s_k = xf[4] if k == 0 else Xp_ref[min(k + 1, N)][4]
            vxk, eyk, ep = refs_at(s_k)
            xref_s[k] = jnp.stack([vxk, zB, zB, ep, zB, eyk])
        xref_in = xref_s
    else:
        xref_in = xref_ref

    # ---- 4. tracker: the shared megastep MPC core at mu-hat ------------
    u0 = _mpc_core(
        xf, pv_hat, kap_at,
        Xp_ref, Up_ref, sw_ref, lamw_ref, uprev_ref, rho, xref_in,
        *consts,
        Xp_out, Up_out, s_out, lam_out, u0_out, stats_out,
        *scratch,
        N=N, dt=dt, max_iter=max_iter, sigma=sigma, alpha=alpha,
        tire=tire, eps_abs=eps_abs, eps_rel=eps_rel,
        eps_fallback=eps_fallback, check=check, early_exit=early_exit,
        vx_min=vx_min, vx_max=vx_max, ey_max=ey_max, delta_max=delta_max,
        a_min=a_min, a_max=a_max, ddelta_max=ddelta_max, da_max=da_max,
        kappa_speed_cap=kappa_speed_cap, a_lat_frac=a_lat_frac,
        squarings=squarings, order=order, unroll_sweeps=unroll_sweeps,
        unroll_iters=unroll_iters, model="dynamic", eyb_ref=eyb_ref,
    )
    # stats row 5: the UPDATED mu-hat (race_loop logs fric2.mu)
    stats_out[5] = mu

    # ---- 5. plant: world-frame fine Euler at mu-TRUE --------------------
    pv_plant = dict(pv, mu=mtrue_ref[0])
    hp = dt / n_sub

    def sub(_i, xc):
        return xc + hp * f_global_bl(pv_plant, xc, u0, sim_tire)

    xg_out[...] = jax.lax.fori_loop(0, n_sub, sub, xg)
    xf_out[...] = xf


def _ref_epsi_nodes(table, probe: float = 0.15):
    """Racing-line heading reference at the table nodes — the EXACT
    refs_from_table slope formula (+-probe central difference of the
    linear-interp line, atan, seam guard) evaluated host-side once, so
    the kernel needs one channel fetch instead of four +-probe e_y
    fetches per stage. Between nodes the kernel's linear interp of these
    values differs from atan-of-interp only at the second-order level
    (and smooths the seam guard's jump across one cell)."""
    n = table.vx.shape[-1]
    ds = jnp.reshape(jnp.asarray(table.ds, jnp.float32), (-1,))[0]
    s_nodes = jnp.arange(n, dtype=jnp.float32) * ds

    def one(tbl):
        eyp = tbl.lookup(s_nodes + probe)[1]
        eym = tbl.lookup(s_nodes - probe)[1]
        ep = jnp.arctan2(eyp - eym, 2.0 * probe)
        return jnp.where(jnp.abs(ep) > 0.3, 0.0, ep)

    if jnp.ndim(table.vx) == 2:          # per-lane tables (B, n)
        return jax.vmap(one)(table)
    return one(table)


_REF_SINGLE_LEVEL_MAX = 4096   # nodes; above this, chunked MXU lookup


def _ref_table_inputs(table, probe: float = 0.15):
    """RefTable vx/ey node arrays + the precomputed e_psi node channel
    as kernel operands + aux [length, 1/ds] (the delta_ff channel is not
    part of the tracking reference — refs_from_table consumes only
    vx/ey/slope). Small tables ship as (n_pad, 1) columns for the
    single-level VPU soft-one-hot fetch; very long tables fall back to
    the chunked (n_chunks, 128) MXU layout."""
    n = table.vx.shape[0]
    single = n <= _REF_SINGLE_LEVEL_MAX
    if single:
        n_pad = -(-n // 8) * 8

        def shape(a):
            a = jnp.concatenate([a, jnp.zeros((n_pad - n,), jnp.float32)])
            return a[:, None]
    else:
        C = 128
        n_pad = -(-n // C) * C

        def shape(a):
            a = jnp.concatenate([a, jnp.zeros((n_pad - n,), jnp.float32)])
            return a.reshape(n_pad // C, C)

    rtaux = jnp.stack([table.length, 1.0 / table.ds])[:, None]
    return (shape(table.vx), shape(table.ey),
            shape(_ref_epsi_nodes(table, probe)), rtaux, n, single)


def _pose_table_inputs(track: Track):
    """Centerline pose tables as kernel operands, (n_chunks, 128) each
    (same chunk layout as the curvature table; node rows [0, n) =
    track.X[:-1] etc., matching global_to_frenet's candidate set).

    Tables longer than two chunks carry a C-cell REPLICATED HEAD (cells
    [n, n+C) repeat cells [0, C)): the measurement window's C consecutive
    cells starting at (i_hint - C/2) mod n then never wrap the track-end
    seam in table space, so they span at most TWO aligned chunks — the
    dynamic two-chunk fetch in the kernel is seam-free by construction."""
    C = 128
    n = track.kappa.shape[0]
    ext = C if -(-n // C) > 2 else 0
    n_pad = -(-(n + ext) // C) * C

    def chunked(a):
        a = a[:n]
        if ext:
            a = jnp.concatenate([a, a[:C]])
        a = jnp.concatenate([a, jnp.zeros((n_pad - n - ext,), jnp.float32)])
        return a.reshape(n_pad // C, C)

    return chunked(track.X), chunked(track.Y), chunked(track.psi)


def racestep_init(
    p: VehicleParams, cfg: MPCConfig, track: Track, x0_b: jnp.ndarray,
    mu0: float, p0_ekf: float = 0.1, p0_rls: float = 0.25,
) -> RaceMegaCarry:
    """Batch-last composed carry from (B, 6) Frenet initial states
    (loop/race.py::batched_race_sweep's per-lane init, kernel layout)."""
    from ..loop.mpc import mpc_init
    from ..track.track import frenet_to_global

    f32 = jnp.float32
    x0_b = jnp.asarray(x0_b, f32)
    B = x0_b.shape[0]
    p_ctrl = p.replace(mu=jnp.asarray(mu0, f32))
    carry = jax.vmap(lambda x: mpc_init(p_ctrl, cfg, track, x))(x0_b)
    bl = lambda a: jnp.moveaxis(a, 0, -1)
    Xw, Yw, psiw = jax.vmap(
        lambda x: frenet_to_global(track, x[4], x[5], x[3]))(x0_b)
    xg0 = jnp.stack([x0_b[:, 0], x0_b[:, 1], x0_b[:, 2], Xw, Yw, psiw])
    return RaceMegaCarry(
        xg=xg0,
        ekx=bl(x0_b),
        ekP=p0_ekf * jnp.eye(6, dtype=f32)[:, :, None]
        * jnp.ones((1, 1, B), f32),
        fr=jnp.stack([jnp.full((B,), mu0, f32), jnp.full((B,), p0_rls, f32)]),
        x_prev_f=bl(x0_b),
        X_pred=bl(carry.X_pred), U_pred=bl(carry.U_pred),
        s=bl(carry.s), lam=bl(carry.lam), u_prev=bl(carry.u_prev),
        rho=carry.rho,
    )


def racestep(
    cfg: MPCConfig,
    scfg: SolverConfig,
    track: Track,
    prm: jnp.ndarray,            # (10, B) NOMINAL params (mu row = mu0)
    x_ref,                       # shared (N+1, NX) / batch-last / RefTable
    carry: RaceMegaCarry,
    noise: jnp.ndarray,          # (6, B) pre-scaled sensor noise
    mu_true: jnp.ndarray,        # (B,) per-lane plant friction
    ekf_q,                       # (6,) process-noise variances
    ekf_r,                       # (6,) measurement-noise variances
    n_sub: int = 10,
    n_sub_ekf: int = 4,
    sim_tire: str | None = None,
    use_ekf: bool = True,
    adapt_mu: bool = True,
    gate_sigma: float = 0.0,     # >0: per-channel innovation gating
    forgetting: float = 0.995,
    min_sensitivity: float = 0.05,
    window_m: float = 3.0,
    interpret: bool = False,
    block: int = PALLAS_BLOCK,
    unroll_sweeps: bool = True,
    eyb=None,                    # optional (N+1, 2, B) e_y corridor
    kap_window: bool = False,    # block-local windowed curvature lookup
):
    """One composed deployment step for every lane, in one kernel launch.

    Returns (new_carry, u0 (NU, B), diag (6, B): r_prim, r_dual, converged,
    rho_next, iters, mu_hat)."""
    assert cfg.model == "dynamic", "the composed step needs the dynamic model"
    assert cfg.linearization == "lpv"
    N = cfg.N
    B = carry.rho.shape[-1]
    f32 = jnp.float32
    PB = block
    Bp = -(-B // PB) * PB
    pad = Bp - B

    def padl(leaf):
        if pad:
            reps = jnp.repeat(leaf[..., :1], pad, axis=-1)
            leaf = jnp.concatenate([leaf, reps], axis=-1)
        return leaf

    from ..planner.reftable import RefTable
    from .megastep_kernel import megastep_refs

    use_table_refs = isinstance(x_ref, RefTable)
    per_lane_refs = use_table_refs and jnp.ndim(x_ref.vx) == 2
    if per_lane_refs:
        # PER-LANE tables (leaves (B, n)): ride along as (n_pad, B)
        # BATCHED operands, fetched by plain one-hot in-kernel
        n_ref = x_ref.vx.shape[1]
        n_pad_t = -(-n_ref // 8) * 8

        def col(a):                    # (B, n) -> (n_pad, B)
            a = jnp.moveaxis(jnp.asarray(a, f32), 0, -1)
            return jnp.concatenate(
                [a, jnp.zeros((n_pad_t - n_ref, a.shape[1]), f32)], axis=0)

        # all lanes share the grid (same ds/length — one track), so the
        # aux stays a constant even when the value leaves are batched
        len0 = jnp.reshape(jnp.asarray(x_ref.length, f32), (-1,))[0]
        ds0 = jnp.reshape(jnp.asarray(x_ref.ds, f32), (-1,))[0]
        rvx, rey = padl(col(x_ref.vx)), padl(col(x_ref.ey))
        rep = padl(col(_ref_epsi_nodes(x_ref)))
        rtaux = jnp.stack([len0, 1.0 / ds0])[:, None]
        ref_tabs = (rvx, rey, rep, rtaux)
        ref_single = True          # per-lane tables use the row fetch
        xref_bl = jnp.zeros((1, B), f32)
    elif use_table_refs:
        # the table is sampled IN-KERNEL (host-side refs_from_table was
        # measured at ~24 ms/step — XLA TPU gathers); the xref operand
        # degenerates to a dummy row to keep the operand layout static
        rvx, rey, rep, rtaux, n_ref, ref_single = _ref_table_inputs(x_ref)
        ref_tabs = (rvx, rey, rep, rtaux)
        xref_bl = jnp.zeros((1, B), f32)
    else:
        # megastep_refs reads carry.x for ref row 0; the composed carry's
        # best pre-step estimate is the EKF mean. Row 0 of the reference is
        # solution-irrelevant anyway (stage-0 state rows are disabled and
        # the backward sweep never consumes q0[0] for u0).
        class _RefView(NamedTuple):
            x: jnp.ndarray
            X_pred: jnp.ndarray

        ref_tabs = ()
        n_ref = 0
        ref_single = False
        xref_bl = megastep_refs(cfg, x_ref,
                                _RefView(x=carry.ekx, X_pred=carry.X_pred))
    from .megastep_kernel import (
        _KAP_SINGLE_LEVEL_MAX,
        _table_inputs_windowed,
    )

    C = 128
    n_track = track.kappa.shape[0]
    kap_back, kap_chunks = 0, 0
    if kap_window and n_track > _KAP_SINGLE_LEVEL_MAX:
        # back margin 24 cells: the hint (EKF s) trails/leads the measured
        # s_w by < ~10 cells per frame in a healthy loop (predict-side
        # hint; glitches hit z, not the hint) — 24 covers it with slack.
        # Forward sized exactly like the tracker's window.
        kap_back = 24
        ahead = int(-(-cfg.N * float(cfg.bounds.vx_max) * float(cfg.dt)
                      // float(track.ds))) + 24
        kap_chunks = (kap_back + ahead + C - 1) // C + 1
        if n_track > (kap_chunks - 1) * C:
            ktab, taux, n_cells = _table_inputs_windowed(
                track, kap_chunks - 1)
        else:
            kap_back, kap_chunks = 0, 0
            ktab, taux, n_cells = _table_inputs(track)
    else:
        ktab, taux, n_cells = _table_inputs(track)
    xtab, ytab, ptab = _pose_table_inputs(track)
    win_cells = max(2, int(window_m / float(track.ds)))

    has_eyb = eyb is not None
    eyb_ins = (padl(jnp.asarray(eyb, f32)),) if has_eyb else ()
    batched = tuple(padl(a) for a in (
        carry.xg, carry.ekx, carry.ekP, carry.fr, carry.x_prev_f,
        jnp.asarray(noise, f32), jnp.asarray(mu_true, f32)[None, :],
        carry.X_pred, carry.U_pred, carry.s, carry.lam, carry.u_prev,
        carry.rho[None, :], xref_bl, prm,
    )) + eyb_ins
    consts_in = (
        ktab, taux, xtab, ytab, ptab,
        jnp.asarray(ekf_q, f32).reshape(6, 1),
        jnp.asarray(ekf_r, f32).reshape(6, 1),
    ) + ref_tabs + _make_consts(cfg, scfg)
    ins = batched + consts_in

    b = cfg.bounds
    kernel = functools.partial(
        _racestep_kernel,
        N=N, dt=float(cfg.dt), max_iter=scfg.max_iter,
        sigma=float(scfg.sigma), alpha=float(scfg.alpha),
        tire=cfg.tire, sim_tire=sim_tire or cfg.tire,
        n_sub=n_sub, n_sub_ekf=n_sub_ekf, n_cells=n_cells,
        eps_abs=float(scfg.eps_abs), eps_rel=float(scfg.eps_rel),
        eps_fallback=float(scfg.eps_fallback),
        check=max(1, scfg.check_termination),
        early_exit=bool(scfg.early_exit),
        vx_min=float(b.vx_min), vx_max=float(b.vx_max),
        ey_max=float(b.ey_max), delta_max=float(b.delta_max),
        a_min=float(b.a_min), a_max=float(b.a_max),
        ddelta_max=float(b.ddelta_max), da_max=float(b.da_max),
        kappa_speed_cap=bool(cfg.kappa_speed_cap),
        a_lat_frac=float(cfg.a_lat_frac),
        squarings=4, order=6,
        unroll_sweeps=unroll_sweeps, unroll_iters=False,
        use_ekf=use_ekf, adapt_mu=adapt_mu,
        gate_sigma=float(gate_sigma),
        forgetting=float(forgetting),
        min_sensitivity=float(min_sensitivity),
        win_cells=win_cells, fd_eps=3e-3, has_eyb=has_eyb,
        use_table_refs=use_table_refs, n_ref=n_ref,
        per_lane_refs=per_lane_refs, ref_single_level=ref_single,
        kap_back=kap_back, kap_chunks=kap_chunks,
    )

    NA = NX + NU
    out_shapes = (
        jax.ShapeDtypeStruct((6, Bp), f32),             # xg
        jax.ShapeDtypeStruct((6, Bp), f32),             # ekx
        jax.ShapeDtypeStruct((6, 6, Bp), f32),          # ekP
        jax.ShapeDtypeStruct((2, Bp), f32),             # fr
        jax.ShapeDtypeStruct((6, Bp), f32),             # xf
        jax.ShapeDtypeStruct((6, Bp), f32),             # z (raw meas.)
        jax.ShapeDtypeStruct((N + 1, NX, Bp), f32),     # X_pred
        jax.ShapeDtypeStruct((N, NU, Bp), f32),         # U_pred
        jax.ShapeDtypeStruct((N + 1, NC, Bp), f32),     # s
        jax.ShapeDtypeStruct((N + 1, NC, Bp), f32),     # lam
        jax.ShapeDtypeStruct((NU, Bp), f32),            # u0
        jax.ShapeDtypeStruct((8, Bp), f32),             # stats
    )

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

    in_specs = [bspec(a.shape) for a in batched] + [
        cspec(a.shape) for a in consts_in
    ]
    if per_lane_refs:
        # rvx/rey/rep sit at consts_in[7:10] but are per-lane BATCHED
        # operands
        off = len(batched) + 7
        in_specs[off] = bspec(rvx.shape)
        in_specs[off + 1] = bspec(rey.shape)
        in_specs[off + 2] = bspec(rep.shape)
    out_specs = tuple(bspec(s.shape) for s in out_shapes)
    scratch = [
        pltpu.VMEM((N + 1, NX, PB), f32),    # Xs
        pltpu.VMEM((N, NU, PB), f32),        # Us
        pltpu.VMEM((N + 1, PB), f32),        # kap
        pltpu.VMEM((N + 1, NC, PB), f32),    # lb
        pltpu.VMEM((N + 1, NC, PB), f32),    # ub
        pltpu.VMEM((N, NA, NA, PB), f32),    # A
        pltpu.VMEM((N, NA, NU, PB), f32),    # B
        pltpu.VMEM((N + 1, NA, PB), f32),    # q0
        pltpu.VMEM((N, NU, NA, PB), f32),    # K
        pltpu.VMEM((N, NU, NU, PB), f32),    # Hiv
        pltpu.VMEM((N, NU, NA, PB), f32),    # Hux
        pltpu.VMEM((N, NU, PB), f32),        # d
        pltpu.VMEM((N + 1, NC, PB), f32),    # v
        pltpu.VMEM((N + 1, NC, PB), f32),    # s_prev
        pltpu.VMEM((N + 1, NC, PB), f32),    # G
        pltpu.VMEM((N + 1, NA, PB), f32),    # Xsol
        pltpu.VMEM((N, NU, PB), f32),        # Usol
    ]
    if use_table_refs:
        scratch.append(pltpu.VMEM((N + 1, NX, PB), f32))   # in-kernel xref

    outs = pl.pallas_call(
        kernel,
        grid=(Bp // PB,),
        out_shape=out_shapes,
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch,
        interpret=interpret,
    )(*ins)

    trim = lambda a: a[..., :B]
    (xg, ekx, ekP, fr, xf, z, Xp, Up, s, lam, u0, stats) = map(trim, outs)
    new_carry = RaceMegaCarry(
        xg=xg, ekx=ekx, ekP=ekP, fr=fr, x_prev_f=xf,
        X_pred=Xp, U_pred=Up, s=s, lam=lam, u_prev=u0, rho=stats[3],
    )
    # diag rows: r_prim, r_dual, converged, rho_next, iters, mu_hat
    return new_carry, u0, stats[:6], z
