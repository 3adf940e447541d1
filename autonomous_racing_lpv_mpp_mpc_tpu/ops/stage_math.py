"""Shared batch-last (lane-dim) stage math for the fused Pallas kernels.

Everything here operates on values whose LAST axis is the scenario batch
(the TPU lane dimension), shaped so every small-matrix operation is a full
(sublane, 128) VPU tile. Used by ops/fused_kernel.py (fused assembly+solve)
and ops/megastep_kernel.py (the whole receding-horizon step in one kernel).

Reference parity: the LPV A(theta)/B(theta) entries mirror models/lpv.py
(SURVEY.md §2 "LPV model builder"); the plant ODE mirrors
models/dynamics.py::f_dynamic (SURVEY.md §3.5).
"""

from __future__ import annotations

import jax.numpy as jnp

from .admm_kernel import _mm

NX, NU, NA, NC = 6, 2, 8, 6            # dynamic-bicycle dims (flagship)
KIN_NX, KIN_NA = 4, 6                  # kinematic bicycle (BASELINE config 1)
VX_EPS = 0.05
DENOM_EPS = 0.1
PACEJKA_C = 1.3


def model_dims(model: str):
    """(nx, na) for a model; na = nx + NU (the (x, u_prev) augmentation)."""
    if model == "dynamic":
        return NX, NA
    if model == "kinematic":
        return KIN_NX, KIN_NA
    raise ValueError(model)


def model_s_ey(model: str):
    """(s_idx, ey_idx) in the model's state vector."""
    return (4, 5) if model == "dynamic" else (2, 3)


def _sinc(x):
    return jnp.sinc(x / jnp.pi)


# ---- arctangent: Mosaic has no atan/atan2 lowering (NotImplementedError:
# "Unimplemented primitive in Pallas TPU lowering: atan"), so the kernels
# use a branch-free implementation: two double-angle reductions
# atan(x) = 2 atan(x / (1 + sqrt(1 + x^2))) map [0, 1] -> [0, 0.199], where
# a 4-term odd series is exact to ~2 f32 ulps. ----

def _atan_unit(z):
    """atan for z in [0, 1]."""
    for _ in range(2):
        z = z / (1.0 + jnp.sqrt(1.0 + z * z))
    z2 = z * z
    p = z * (1.0 + z2 * (-1.0 / 3.0 + z2 * (1.0 / 5.0 + z2 * (-1.0 / 7.0))))
    return 4.0 * p


def atan_bl(x):
    """Branch-free atan for any x (kernel-safe arctan replacement)."""
    t = jnp.abs(x)
    big = t > 1.0
    z = jnp.where(big, 1.0 / jnp.maximum(t, 1e-30), t)
    a = _atan_unit(z)
    a = jnp.where(big, jnp.pi / 2 - a, a)
    return jnp.sign(x) * a


def atan2_bl(y, x):
    """Branch-free atan2 (kernel-safe arctan2 replacement)."""
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    swap = ay > ax
    num = jnp.where(swap, ax, ay)
    den = jnp.maximum(jnp.where(swap, ay, ax), 1e-30)
    a = _atan_unit(num / den)                  # [0, pi/4]
    a = jnp.where(swap, jnp.pi / 2 - a, a)
    a = jnp.where(x < 0, jnp.pi - a, a)
    return jnp.where(y < 0, -a, a)


def unpack_params(prm_ref):
    """(10, B) vehicle-parameter rows -> named (B,) values."""
    return dict(
        m=prm_ref[0], Iz=prm_ref[1], lf=prm_ref[2], lr=prm_ref[3],
        Cf=prm_ref[4], Cr=prm_ref[5], mu=prm_ref[6], g=prm_ref[7],
        cd0=prm_ref[8], cd1=prm_ref[9],
    )


def secant_stiffness(pv, delta, vy, wz, vxs, tire: str):
    """Per-lane cornering stiffnesses: linear constants or the Pacejka
    secant stiffness at the scheduled slip (models/lpv.py semantics)."""
    if tire != "pacejka":
        return pv["Cf"], pv["Cr"]
    lf, lr = pv["lf"], pv["lr"]
    fzf = pv["mu"] * pv["m"] * pv["g"] * lr / (lf + lr)
    fzr = pv["mu"] * pv["m"] * pv["g"] * lf / (lf + lr)
    af = delta - atan2_bl(vy + lf * wz, vxs)
    ar = -atan2_bl(vy - lr * wz, vxs)
    eps = 1e-4
    af = jnp.where(jnp.abs(af) < eps, eps, af)
    ar = jnp.where(jnp.abs(ar) < eps, eps, ar)
    Bf_ = pv["Cf"] / (PACEJKA_C * jnp.maximum(fzf, 1e-6))
    Br_ = pv["Cr"] / (PACEJKA_C * jnp.maximum(fzr, 1e-6))
    Cf = fzf * jnp.sin(PACEJKA_C * atan_bl(Bf_ * af)) / af
    Cr = fzr * jnp.sin(PACEJKA_C * atan_bl(Br_ * ar)) / ar
    return Cf, Cr


def _ab_cont_dynamic(x, u, kap, pv, tire: str):
    """Continuous-time LPV (A, B) stacks for the dynamic bicycle, batch-last.

    x: (NX, B), u: (NU, B), kap: (B,). Mirrors models/lpv.py::
    lpv_ab_dynamic. Returns (A6 (NX,NX,B), B6 (NX,NU,B)).
    """
    m_, Iz, lf, lr = pv["m"], pv["Iz"], pv["lf"], pv["lr"]
    cd0, cd1 = pv["cd0"], pv["cd1"]
    vx, vy, wz, epsi, ey = x[0], x[1], x[2], x[3], x[5]
    delta = u[0]
    vxs = jnp.maximum(vx, VX_EPS)
    Cf, Cr = secant_stiffness(pv, delta, vy, wz, vxs, tire)

    sd, cd_ = jnp.sin(delta), jnp.cos(delta)
    se, ce = jnp.sin(epsi), jnp.cos(epsi)
    den = jnp.maximum(1.0 - kap * ey, DENOM_EPS)
    z = jnp.zeros_like(vx)

    a00 = -(cd1 + cd0 / vxs) / m_
    a01 = Cf * sd / (m_ * vxs) + wz
    a02 = Cf * lf * sd / (m_ * vxs)
    a11 = -(Cf * cd_ + Cr) / (m_ * vxs)
    a12 = (-Cf * lf * cd_ + Cr * lr) / (m_ * vxs) - vxs
    a21 = (-lf * Cf * cd_ + lr * Cr) / (Iz * vxs)
    a22 = -(lf**2 * Cf * cd_ + lr**2 * Cr) / (Iz * vxs)
    a30 = -kap * ce / den
    a31 = kap * se / den
    a40 = ce / den
    a41 = -se / den
    a51 = ce
    a53 = vxs * _sinc(epsi)
    one = jnp.ones_like(vx)
    A6 = jnp.stack([
        jnp.stack([a00, a01, a02, z, z, z]),
        jnp.stack([z, a11, a12, z, z, z]),
        jnp.stack([z, a21, a22, z, z, z]),
        jnp.stack([a30, a31, one, z, z, z]),
        jnp.stack([a40, a41, z, z, z, z]),
        jnp.stack([z, a51, z, a53, z, z]),
    ])                                           # (NX, NX, B)
    b00 = -Cf * sd / m_
    b10 = Cf * cd_ / m_
    b20 = lf * Cf * cd_ / Iz
    B6 = jnp.stack([
        jnp.stack([b00, one]),
        jnp.stack([b10, z]),
        jnp.stack([b20, z]),
        jnp.stack([z, z]),
        jnp.stack([z, z]),
        jnp.stack([z, z]),
    ])                                           # (NX, NU, B)
    return A6, B6


def _ab_cont_kinematic(x, u, kap, pv):
    """Continuous-time LPV (A, B) stacks for the kinematic bicycle,
    batch-last (models/lpv.py::lpv_ab_kinematic, BASELINE config 1).

    x = (vx, e_psi, s, e_y): (KIN_NX, B), u: (NU, B), kap: (B,).
    """
    m_, lf, lr = pv["m"], pv["lf"], pv["lr"]
    cd0, cd1 = pv["cd0"], pv["cd1"]
    vx, epsi, ey = x[0], x[1], x[3]
    vxs = jnp.maximum(vx, VX_EPS)
    L = lf + lr
    se, ce = jnp.sin(epsi), jnp.cos(epsi)
    den = jnp.maximum(1.0 - kap * ey, DENOM_EPS)
    z = jnp.zeros_like(vx)
    one = jnp.ones_like(vx)

    a00 = -(cd1 + cd0 / vxs) / m_
    a10 = -kap * ce / den
    a20 = ce / den
    a31 = vxs * _sinc(epsi)
    A4 = jnp.stack([
        jnp.stack([a00, z, z, z]),
        jnp.stack([a10, z, z, z]),
        jnp.stack([a20, z, z, z]),
        jnp.stack([z, a31, z, z]),
    ])                                           # (KIN_NX, KIN_NX, B)
    B4 = jnp.stack([
        jnp.stack([z, one]),
        jnp.stack([vxs / L, z]),
        jnp.stack([z, z]),
        jnp.stack([z, z]),
    ])                                           # (KIN_NX, NU, B)
    return A4, B4


def _vanloan_aug(A_c, B_c, Iav, I2_mat, Sel, *, dt: float,
                 squarings: int, order: int):
    """Van Loan exp([[A, B], [0, 0]] dt) + (x, u_prev) augmentation,
    batch-last, generic in nx (na = nx + NU).

    A_c: (nx, nx, B), B_c: (nx, NU, B), Iav: (na, na, 1), I2_mat: (NU, NU),
    Sel: (na, NU) constant column selector (offset slices of matmul-chain
    results crash Mosaic->LLO; see ops/fused_kernel.py).
    Returns (Aa, Ba): (na, na, B), (na, NU, B).
    """
    f32 = jnp.float32
    nx = A_c.shape[0]
    na = nx + NU
    B = A_c.shape[-1]
    top = jnp.concatenate([A_c, B_c], axis=1)    # (nx, na, B)
    Mv = jnp.concatenate(
        [top, jnp.zeros((NU, na, B), f32)], axis=0
    ) * (dt / (2.0 ** squarings))
    E = Iav + Mv / order
    for j in range(order - 1, 0, -1):
        E = Iav + _mm(Mv, E) / j
    for _ in range(squarings):
        E = _mm(E, E)
    Ad = E[:nx, :nx]
    Bd = (E[:, :, None, :] * Sel[None, :, :, None]).sum(axis=1)[:nx]

    Aa = jnp.concatenate([
        jnp.concatenate([Ad, jnp.zeros((nx, NU, B), f32)], axis=1),
        jnp.zeros((NU, na, B), f32),
    ], axis=0)
    I2v = I2_mat[:, :, None] * jnp.ones((1, 1, B), f32)
    Ba = jnp.concatenate([Bd, I2v], axis=0)
    return Aa, Ba


def stage_aug_ab(
    x, u, kap, pv, I8v, I2_mat, Sel,
    *, dt: float, tire: str, squarings: int = 4, order: int = 6,
    model: str = "dynamic",
):
    """One scheduled stage: LPV linearization + Van Loan discretization +
    (x, u_prev) augmentation, batch-last.

    x: (nx, B), u: (NU, B), kap: (B,), pv: unpack_params dict,
    I8v: (na, na, 1), I2_mat: (NU, NU), Sel: (na, NU) constant column
    selector. Returns (Aa, Ba): (na, na, B), (na, NU, B). ``model`` selects
    the dynamic (nx=6) or kinematic (nx=4, BASELINE config 1) LPV.
    """
    if model == "kinematic":
        A_c, B_c = _ab_cont_kinematic(x, u, kap, pv)
    else:
        A_c, B_c = _ab_cont_dynamic(x, u, kap, pv, tire)
    return _vanloan_aug(A_c, B_c, I8v, I2_mat, Sel,
                        dt=dt, squarings=squarings, order=order)


def f_dynamic_bl(pv, x, u, kap, tire: str):
    """Batch-last nonlinear dynamic-bicycle Frenet ODE (models/dynamics.py
    ::f_dynamic, SURVEY.md §3.5). x: (NX, B), u: (NU, B), kap: (B,)."""
    vx, vy, wz, epsi, ey = x[0], x[1], x[2], x[3], x[5]
    delta, a = u[0], u[1]
    m_, Iz, lf, lr = pv["m"], pv["Iz"], pv["lf"], pv["lr"]
    vxs = jnp.maximum(vx, VX_EPS)

    alpha_f = delta - atan2_bl(vy + lf * wz, vxs)
    alpha_r = -atan2_bl(vy - lr * wz, vxs)
    L = lf + lr
    fzf = pv["mu"] * m_ * pv["g"] * lr / L
    fzr = pv["mu"] * m_ * pv["g"] * lf / L
    if tire == "pacejka":
        Bf_ = pv["Cf"] / (PACEJKA_C * jnp.maximum(fzf, 1e-6))
        Br_ = pv["Cr"] / (PACEJKA_C * jnp.maximum(fzr, 1e-6))
        fyf = fzf * jnp.sin(PACEJKA_C * atan_bl(Bf_ * alpha_f))
        fyr = fzr * jnp.sin(PACEJKA_C * atan_bl(Br_ * alpha_r))
    else:
        fyf = pv["Cf"] * alpha_f
        fyr = pv["Cr"] * alpha_r

    sd, cd_ = jnp.sin(delta), jnp.cos(delta)
    dvx = a - (fyf * sd) / m_ + wz * vy - (pv["cd0"] + pv["cd1"] * vx) / m_
    dvy = (fyf * cd_ + fyr) / m_ - wz * vx
    dwz = (lf * fyf * cd_ - lr * fyr) / Iz

    se, ce = jnp.sin(epsi), jnp.cos(epsi)
    denom = jnp.maximum(1.0 - kap * ey, DENOM_EPS)
    sdot = (vx * ce - vy * se) / denom
    depsi = wz - kap * sdot
    dey = vx * se + vy * ce
    return jnp.stack([dvx, dvy, dwz, depsi, sdot, dey])


def f_kinematic_bl(pv, x, u, kap):
    """Batch-last kinematic-bicycle Frenet ODE (models/dynamics.py::
    f_kinematic, BASELINE config 1). x: (KIN_NX, B), u: (NU, B), kap: (B,).
    tan(delta) via sin/cos (no Mosaic tan lowering needed)."""
    vx, epsi, ey = x[0], x[1], x[3]
    delta, a = u[0], u[1]
    L = pv["lf"] + pv["lr"]
    dvx = a - (pv["cd0"] + pv["cd1"] * vx) / pv["m"]
    psidot = vx * jnp.sin(delta) / (jnp.cos(delta) * L)
    se, ce = jnp.sin(epsi), jnp.cos(epsi)
    denom = jnp.maximum(1.0 - kap * ey, DENOM_EPS)
    sdot = vx * ce / denom
    depsi = psidot - kap * sdot
    dey = vx * se
    return jnp.stack([dvx, depsi, sdot, dey])


def f_model_bl(model: str, pv, x, u, kap, tire: str):
    if model == "kinematic":
        return f_kinematic_bl(pv, x, u, kap)
    return f_dynamic_bl(pv, x, u, kap, tire)


def f_global_bl(pv, xg, u, tire: str):
    """Batch-last WORLD-frame dynamic-bicycle ODE (loop/global_loop.py::
    f_global, SURVEY.md §2 "Nonlinear vehicle simulator": the reference
    simulates the plant in the global frame). xg: (6, B) =
    (vx, vy, wz, X, Y, psi), u: (NU, B). No curvature dependence — the
    Frenet state is recovered by the in-kernel measurement stage."""
    vx, vy, wz, psi = xg[0], xg[1], xg[2], xg[5]
    delta, a = u[0], u[1]
    m_, Iz, lf, lr = pv["m"], pv["Iz"], pv["lf"], pv["lr"]
    vxs = jnp.maximum(vx, VX_EPS)

    alpha_f = delta - atan2_bl(vy + lf * wz, vxs)
    alpha_r = -atan2_bl(vy - lr * wz, vxs)
    L = lf + lr
    fzf = pv["mu"] * m_ * pv["g"] * lr / L
    fzr = pv["mu"] * m_ * pv["g"] * lf / L
    if tire == "pacejka":
        Bf_ = pv["Cf"] / (PACEJKA_C * jnp.maximum(fzf, 1e-6))
        Br_ = pv["Cr"] / (PACEJKA_C * jnp.maximum(fzr, 1e-6))
        fyf = fzf * jnp.sin(PACEJKA_C * atan_bl(Bf_ * alpha_f))
        fyr = fzr * jnp.sin(PACEJKA_C * atan_bl(Br_ * alpha_r))
    else:
        fyf = pv["Cf"] * alpha_f
        fyr = pv["Cr"] * alpha_r

    sd, cd_ = jnp.sin(delta), jnp.cos(delta)
    dvx = a - (fyf * sd) / m_ + wz * vy - (pv["cd0"] + pv["cd1"] * vx) / m_
    dvy = (fyf * cd_ + fyr) / m_ - wz * vx
    dwz = (lf * fyf * cd_ - lr * fyr) / Iz
    sp, cp = jnp.sin(psi), jnp.cos(psi)
    dX = vx * cp - vy * sp
    dY = vx * sp + vy * cp
    return jnp.stack([dvx, dvy, dwz, dX, dY, wz])
