"""Fused KKT linearization + Schur condensation: one Pallas kernel.

Combines the work of the reference's KKT kernel
(reference include/common/kkt.cuh:24-163) and Schur/preconditioner
formation kernel (include/pcg/linsys_setup.cuh:141-612) into a single
lane-batched Pallas kernel: one lane per knot, all stages straight-line
VPU code --

  dynamics gradients : RNEA tangents via 2*nq in-kernel jvp pushes,
                       composed with Minv (CRBA + block-recursive SPD
                       inverse) exactly as the reference
                       (iiwa_eepos_plant.cuh:128-156);
  cost grad/Hessian  : FK prefix/suffix chains with the dH tables
                       (iiwa_eepos_plant.cuh:297-378);
  Schur blocks       : per-lane products with lane-roll neighbor shifts
                       standing in for the reference's block-row indexing
                       (theta, Phi, gamma, stair Pinv -- ops/schur.py
                       documents the math).

Outputs stay in lane layout ((d, N) / (d, d, N)) so the fused PCG kernel
consumes them without transposes.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mpcgpu_tpu.models.robot import RobotModel
from mpcgpu_tpu.ops.pallas import lanedyn as ld


class LaneSchur(NamedTuple):
    """Lane-layout Schur system + cached blocks for primal recovery."""

    SL: jnp.ndarray   # (nx, nx, N) lower band
    SD: jnp.ndarray   # diag band
    SU: jnp.ndarray   # upper band
    PL: jnp.ndarray   # stair preconditioner bands
    PD: jnp.ndarray
    PU: jnp.ndarray
    gamma: jnp.ndarray  # (nx, N)
    Qinv: jnp.ndarray   # (nx, nx, N)
    Rinv: jnp.ndarray   # (nu, nu, N)  (lane N-1 unused)
    A: jnp.ndarray      # (nx, nx, N)  A_k in lane k (lane N-1 unused)
    B: jnp.ndarray      # (nx, nu, N)
    q: jnp.ndarray      # (nx, N) cost gradient
    r: jnp.ndarray      # (nu, N) control gradient (lane N-1 unused)


def _lane_mask(n, lo, hi, dtype):
    k = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    return ((k >= lo) & (k < hi)).astype(dtype)


def _wrap_lane(q):
    """Lane-batched angleWrap: the portable ops/integrator.angle_wrap
    (pure jnp.where -- traces identically inside a kernel), kept under
    its historical kernel-local name for the merit/mega kernel imports."""
    from mpcgpu_tpu.ops.integrator import angle_wrap

    return angle_wrap(q)


def _perknot(nq: int, nu: int, dt: float, qd_cost: float, r_cost: float,
             integrator_type: int, gravity: float, hessian: str,
             rho, X, U, goals, x_tab, h_tab, dh_tab, I_tab,
             wrap: bool = False, tracking: str = "eepos",
             q_cost: float = 1.0):
    """All strictly per-knot work for a lane batch: heavy dynamics with
    tangents, cost derivatives, regularized inverses, and the per-knot
    Schur products.  No cross-knot (roll/halo) terms -- callable from
    both the single full-width kernel and the 128-lane tiled grid kernel.

    Returns (A, B, f_pred, Qinv, Rinv, qg, rg, AQi, T, t_vec, Qiq)."""
    return _perknot_rest(
        nq, nu, dt, qd_cost, r_cost, integrator_type, gravity, hessian,
        rho, X, U, goals,
        _perknot_dyn(nq, gravity, X, U, x_tab, h_tab, dh_tab, I_tab,
                     tracking),
        wrap=wrap, tracking=tracking, q_cost=q_cost)


def _perknot_dyn(nq: int, gravity: float, X, U, x_tab, h_tab, dh_tab,
                 I_tab, tracking: str = "eepos"):
    """The single-tile-bound slice of the per-knot stage: heavy dynamics
    with tangent pushes (and the EE forward kinematics + Jacobian for the
    eepos plant).  The tangent-RNEA chain is the one routine that must
    stay at <= 128 lanes (the round-1 Mosaic lesson, CLAUDE.md) -- this
    split lets _perknot_tiled run everything downstream at full
    multi-tile width.

    Returns (qdd, Minv, dfdq, dfdqd[, ee, J])."""
    q, qd = X[:nq], X[nq:]

    # ---- forward dynamics + gradient (reference fd_and_gradient comp.)
    M = ld.crba_M_lane(x_tab, I_tab, q)
    Minv = ld.spd_inverse_lane(M)
    bias = ld.rnea_lane(x_tab, I_tab, q, qd, q * 0.0, gravity)
    qdd = ld.lane_matvec(Minv, U - bias)

    # 2*nq tangent pushes: dtau/d(q,qd) columns, composed to dqdd = -Minv dtau
    # (shared-primal unit-direction forward mode -- see
    # lanedyn.rnea_lane_dtau_units; round-5 replacement of 2*nq generic
    # rnea_lane_jvp calls, ~3x fewer vreg ops, same math)
    dtau_cols = ld.rnea_lane_dtau_units(x_tab, I_tab, q, qd, qdd, gravity)
    dqdd_cols = [-ld.lane_matvec(Minv, dtau_j)              # (nq, N)
                 for dtau_j in dtau_cols]
    dfdq = jnp.stack(dqdd_cols[:nq], axis=1)                # (nq, nq, N)
    dfdqd = jnp.stack(dqdd_cols[nq:], axis=1)
    if tracking == "joint":
        return qdd, Minv, dfdq, dfdqd
    ee, J = ld.fk_ee_and_jac(h_tab, dh_tab, X[:nq])         # (3,N), (3,nq,N)
    return qdd, Minv, dfdq, dfdqd, ee, J


def _perknot_rest(nq: int, nu: int, dt: float, qd_cost: float,
                  r_cost: float, integrator_type: int, gravity: float,
                  hessian: str, rho, X, U, goals, dyn,
                  wrap: bool = False, tracking: str = "eepos",
                  q_cost: float = 1.0):
    """Everything per-knot downstream of the dynamics tangents: integrator
    gradient assembly, cost derivatives, regularized inverses, and the
    per-knot Schur products.  Multi-tile-safe (the same op families run
    at full width in the megakernel's cross-knot assembly), so the tiled
    path calls this ONCE at full lane width."""
    nx = 2 * nq
    n = X.shape[1]
    dtype = X.dtype
    q, qd = X[:nq], X[nq:]
    if tracking == "joint":
        qdd, Minv, dfdq, dfdqd = dyn
    else:
        qdd, Minv, dfdq, dfdqd, ee, J = dyn

    # ---- integrator gradient (integrator.cuh:61-100)
    # constant tensors are materialized (iota-zero add): Mosaic crashes
    # extracting from replicated (lazily-broadcast) constants at
    # multi-tile lane widths (see lanedyn.materialize)
    eye_q = ld.materialize(jnp.eye(nq, dtype=dtype)[:, :, None], n)
    zer_q = ld.materialize(jnp.zeros((nq, nq, 1), dtype), n)
    if integrator_type == 0:
        A_top = jnp.concatenate([eye_q, dt * eye_q], axis=1)
        A_bot = jnp.concatenate([dt * dfdq, eye_q + dt * dfdqd], axis=1)
        B_top = ld.materialize(jnp.zeros((nq, nu, 1), dtype), n)
        B_bot = dt * Minv
        qn = q + dt * qd
        qdn = qd + dt * qdd
    else:
        A_top = jnp.concatenate(
            [eye_q + dt * dt * dfdq, dt * eye_q + dt * dt * dfdqd], axis=1
        )
        A_bot = jnp.concatenate([dt * dfdq, eye_q + dt * dfdqd], axis=1)
        B_top = dt * dt * Minv
        B_bot = dt * Minv
        qdn = qd + dt * qdd
        qn = q + dt * qdn
    A = jnp.concatenate([A_top, A_bot], axis=0)             # (nx, nx, N)
    Bm = jnp.concatenate([B_top, B_bot], axis=0)            # (nx, nu, N)
    if wrap:
        # ANGLE_WRAP affects only the integrated value (the defect),
        # never the gradient (integrator.cuh:149-156)
        qn = _wrap_lane(qn)
    f_pred = jnp.concatenate([qn, qdn], axis=0)

    eye_x = ld.materialize(jnp.eye(nx, dtype=dtype)[:, :, None], n)
    zq = zer_q
    qd_eye = qd_cost * eye_q
    if tracking == "joint":
        # joint-space tracking variant (iiwa_plant.cuh:40-332): quadratic
        # tracking of the recorded states; goals is (nx, N) state refs
        g_q = q_cost * (q - goals[:nq])
        qg = jnp.concatenate([g_q, qd_cost * (qd - goals[nq:])], axis=0)
        rg = r_cost * U
        Q_pos = q_cost * eye_q
    else:
        # ---- cost gradient / Hessian (iiwa_eepos_plant.cuh:297-378)
        # (ee, J computed in _perknot_dyn alongside the dynamics)
        e3 = ee - goals
        g_q = ld.lane_matvec_T(J, e3)                       # (nq, N)
        qg = jnp.concatenate([g_q, qd_cost * qd], axis=0)   # (nx, N)
        rg = r_cost * U

        if hessian == "reference":
            Q_pos = g_q[:, None, :] * g_q[None, :, :]
        else:  # gauss_newton
            Q_pos = ld.lane_matmul_T1(J, J)
    # Q = [[Q_pos, 0], [0, qd_cost I]]  (plant :358-368), built by
    # concatenation -- Mosaic has no in-kernel scatter/update-slice.
    Q = jnp.concatenate(
        [jnp.concatenate([Q_pos, zq], axis=1),
         jnp.concatenate([zq, qd_eye], axis=1)],
        axis=0,
    )
    eye_u = ld.materialize(jnp.eye(nu, dtype=dtype)[:, :, None], n)
    R = r_cost * (eye_u * jnp.ones((1, 1, n), dtype))

    # ---- regularize + invert (utils/matrix.cuh Gauss-Jordan equivalent)
    if getattr(rho, "ndim", 0) == 2:
        # packed per-arm rho: an (nx, n) full-width field (each arm's
        # scalar replicated over rows; see sqp_megakernel._arm_lane_masks).
        # Sliced to (1, s, n) so it broadcasts along the LEADING dim only
        # -- Mosaic has no sublane broadcast for such values.  Explicit
        # lax.slice + expand_dims: jnp's newaxis+slice indexing falls
        # through to a gather, which Mosaic cannot lower here.
        rho_x = jnp.expand_dims(jax.lax.slice_in_dim(rho, 0, nx, axis=0), 0)
        rho_u = jnp.expand_dims(jax.lax.slice_in_dim(rho, 0, nu, axis=0), 0)
    else:
        rho_x = rho_u = rho
    Qr = Q + rho_x * eye_x
    Rr = R + rho_u * eye_u
    Qinv = ld.spd_inverse_lane(Qr)
    Rinv = ld.spd_inverse_lane(Rr)

    # ---- per-knot Schur products (linsys_setup.cuh:141-562; ops/schur.py)
    AQi = ld.lane_matmul(A, Qinv)                           # lane k: A_k Qr_k^-1
    BRi = ld.lane_matmul(Bm, Rinv)
    T = ld.lane_matmul_T2(AQi, A) + ld.lane_matmul_T2(BRi, Bm)
    Qiq = ld.lane_matvec(Qinv, qg)
    t_vec = ld.lane_matvec(AQi, qg) + ld.lane_matvec(BRi, rg)
    return A, Bm, f_pred, Qinv, Rinv, qg, rg, AQi, T, t_vec, Qiq


def _perknot_tiled(nq: int, nu: int, dt: float, qd_cost: float,
                   r_cost: float, integrator_type: int, gravity: float,
                   hessian: str, rho, X, U, goals, x_tab, h_tab, dh_tab,
                   I_tab, wrap: bool = False, tracking: str = "eepos",
                   q_cost: float = 1.0, tile: int = 128):
    """_perknot at multi-tile lane widths: the single-tile-bound dynamics
    slice (_perknot_dyn: tangent-RNEA + FK/Jacobian) runs as an unrolled
    in-kernel loop over 128-lane tiles (static, tile-aligned slices),
    reassembled by lane-axis concatenation; everything downstream
    (_perknot_rest: integrator/cost assembly, inverses, Schur products)
    runs ONCE at full multi-tile width -- the same op families already
    run full-width in the megakernel's cross-knot assembly, and the
    round-5 split removes the per-tile constant materializations and the
    11-output concat glue the old everything-tiled loop paid
    (results/round5/mega_cg_probe fixed-cost reduction at N=256).

    The tangent-RNEA stage is the one routine that must stay at
    single-tile lane widths (the round-1 Mosaic lesson, CLAUDE.md);
    everything per-knot is lane-local, so slicing the knot axis is exact.
    This is the in-kernel counterpart of form_kkt_schur_tiled's Pallas
    grid -- used by the whole-solve megakernel, whose SQP/CG loops cannot
    cross a grid boundary."""
    n = X.shape[1]
    if n <= tile:
        return _perknot(nq, nu, dt, qd_cost, r_cost, integrator_type,
                        gravity, hessian, rho, X, U, goals, x_tab, h_tab,
                        dh_tab, I_tab, wrap=wrap, tracking=tracking,
                        q_cost=q_cost)
    assert n % tile == 0, f"multi-tile lane width {n} must be a multiple of {tile}"
    parts = []
    for t in range(n // tile):
        sl = lambda a: jax.lax.slice_in_dim(a, t * tile, (t + 1) * tile,
                                            axis=a.ndim - 1)
        parts.append(_perknot_dyn(nq, gravity, sl(X), sl(U), x_tab,
                                  h_tab, dh_tab, I_tab, tracking))
    dyn = tuple(jnp.concatenate(ps, axis=ps[0].ndim - 1)
                for ps in zip(*parts))
    return _perknot_rest(nq, nu, dt, qd_cost, r_cost, integrator_type,
                         gravity, hessian, rho, X, U, goals, dyn,
                         wrap=wrap, tracking=tracking, q_cost=q_cost)


def _kernel(nq: int, nu: int, dt: float, qd_cost: float, r_cost: float,
            integrator_type: int, gravity: float, hessian: str,
            precond: bool, wrap: bool, tracking: str, q_cost: float,
            rho_ref, x_ref, u_ref, goals_ref, xs_ref,
            hc, hs, hk, dhc, dhs, dhk, xc, xs_t, xk, i_ref,
            sl_o, sd_o, su_o, pl_o, pd_o, pu_o, gam_o, qinv_o, rinv_o,
            a_o, b_o, qg_o, rg_o):
    nx = 2 * nq
    X = x_ref[:]                # (nx, N)
    U = u_ref[:]                # (nu, N)
    goals = goals_ref[:]        # (3, N) ee goals, or (nx, N) joint refs
    del xs_ref  # c_0 is omitted from gamma, as in the reference
                # (linsys_setup.cuh:273-276; the MPC loop re-injects x_0=xs)
    rho = rho_ref[0]
    n = X.shape[1]
    dtype = X.dtype

    x_tab = (xc[:], xs_t[:], xk[:])
    h_tab = (hc[:], hs[:], hk[:])
    dh_tab = (dhc[:], dhs[:], dhk[:])
    I_tab = i_ref[:]

    (A, Bm, f_pred, Qinv, Rinv, qg, rg, AQi, T, t_vec, Qiq) = _perknot(
        nq, nu, dt, qd_cost, r_cost, integrator_type, gravity, hessian,
        rho, X, U, goals, x_tab, h_tab, dh_tab, I_tab,
        wrap=wrap, tracking=tracking, q_cost=q_cost,
    )
    eye_x = ld.materialize(jnp.eye(nx, dtype=dtype)[:, :, None], n)

    # defect c_{k+1} = x_{k+1} - f(x_k, u_k), shifted so lane k holds c_k
    x_next = pltpu.roll(X, n - 1, axis=1)
    err = x_next - f_pred                                   # lane k: c_{k+1}
    c = pltpu.roll(err, 1, axis=1) * _lane_mask(n, 1, n, dtype)  # lane k: c_k

    # ---- cross-knot Schur assembly
    m1 = _lane_mask(n, 1, n, dtype)[None]                   # (1,1,N): k >= 1
    mN = _lane_mask(n, 0, n - 1, dtype)[None]               # k <= N-2
    theta = Qinv + pltpu.roll(T, 1, axis=2) * m1
    phi = -pltpu.roll(AQi, 1, axis=2) * m1                  # lane k: Phi_k
    SU = -ld.lane_transpose(AQi) * mN                       # lane k: Phi_{k+1}'

    gamma = Qiq - pltpu.roll(t_vec, 1, axis=1) * m1[0] - c

    if precond:
        theta_inv = ld.spd_inverse_lane(theta)
        PL = -ld.lane_matmul(
            ld.lane_matmul(theta_inv, phi), pltpu.roll(theta_inv, 1, axis=2)
        ) * m1
        PU = -ld.lane_matmul(
            ld.lane_matmul(theta_inv, SU),
            pltpu.roll(theta_inv, n - 1, axis=2),
        ) * mN
        PD = theta_inv
    else:
        PD = eye_x
        PL = theta * 0.0
        PU = theta * 0.0

    sl_o[:] = phi
    sd_o[:] = theta
    su_o[:] = SU
    pl_o[:] = PL
    pd_o[:] = PD
    pu_o[:] = PU
    gam_o[:] = gamma
    qinv_o[:] = Qinv
    rinv_o[:] = Rinv
    a_o[:] = A
    b_o[:] = Bm
    qg_o[:] = qg
    rg_o[:] = rg


@functools.partial(
    jax.jit,
    static_argnames=("dt", "qd_cost", "r_cost", "integrator_type", "gravity",
                     "hessian", "precond", "wrap", "tracking", "q_cost",
                     "interpret"),
)
def form_kkt_schur_pallas(model: RobotModel, X, U, goals, xs, rho,
                          dt: float, qd_cost: float, r_cost: float,
                          integrator_type: int = 0, gravity: float = 0.0,
                          hessian: str = "reference", precond: bool = True,
                          wrap: bool = False, tracking: str = "eepos",
                          q_cost: float = 1.0,
                          interpret: bool = None) -> LaneSchur:
    """X (N, nx), U (N-1, nu) -> lane-layout Schur system.

    goals is the (N, >=3) end-effector trace for tracking="eepos", or the
    (N, nx) reference state trajectory for tracking="joint"."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n, nx = X.shape
    nu = U.shape[1]
    nq = nx // 2
    f32 = X.dtype

    Xl = X.T
    Ul = jnp.concatenate([U, jnp.zeros((1, nu), U.dtype)]).T
    goals_l = goals.T if tracking == "joint" else goals[:, :3].T

    kern = functools.partial(
        _kernel, nq, nu, float(dt), float(qd_cost), float(r_cost),
        int(integrator_type), float(gravity), str(hessian), bool(precond),
        bool(wrap), str(tracking), float(q_cost),
    )
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    sds = jax.ShapeDtypeStruct
    outs = pl.pallas_call(
        kern,
        out_shape=(
            sds((nx, nx, n), f32), sds((nx, nx, n), f32), sds((nx, nx, n), f32),
            sds((nx, nx, n), f32), sds((nx, nx, n), f32), sds((nx, nx, n), f32),
            sds((nx, n), f32),
            sds((nx, nx, n), f32), sds((nu, nu, n), f32),
            sds((nx, nx, n), f32), sds((nx, nu, n), f32),
            sds((nx, n), f32), sds((nu, n), f32),
        ),
        in_specs=[smem] + [vmem] * 14,
        out_specs=(vmem,) * 13,
        interpret=interpret,
    )(
        jnp.asarray(rho, f32).reshape(1),
        Xl, Ul, goals_l, xs[:, None],
        model.Hc, model.Hs, model.Hk, model.dHc, model.dHs, model.dHk,
        model.Xc, model.Xs, model.Xk, model.I,
    )
    return LaneSchur(*outs)


def _tile_kernel(nq: int, nu: int, dt: float, qd_cost: float, r_cost: float,
                 integrator_type: int, gravity: float, hessian: str,
                 wrap: bool, tracking: str, q_cost: float,
                 rho_ref, x_ref, u_ref, goals_ref,
                 hc, hs, hk, dhc, dhs, dhk, xc, xs_t, xk, i_ref,
                 a_o, b_o, f_o, qinv_o, rinv_o, qg_o, rg_o,
                 aqi_o, t_o, tvec_o, qiq_o):
    """Per-knot stage over one 128-lane tile of the horizon.

    This is the grid form of the fused kernel: every kernel instance sees
    exactly one (sublane x 128-lane) tile, which sidesteps the Mosaic
    layout-pass failure the monolithic kernel hits at multi-tile lane
    widths N >= 256 (the round-1 open bug).  All cross-knot terms are
    assembled outside in plain XLA from these per-knot outputs."""
    x_tab = (xc[:], xs_t[:], xk[:])
    h_tab = (hc[:], hs[:], hk[:])
    dh_tab = (dhc[:], dhs[:], dhk[:])
    outs = _perknot(
        nq, nu, dt, qd_cost, r_cost, integrator_type, gravity, hessian,
        rho_ref[0], x_ref[:], u_ref[:], goals_ref[:],
        x_tab, h_tab, dh_tab, i_ref[:],
        wrap=wrap, tracking=tracking, q_cost=q_cost,
    )
    for ref, val in zip(
        (a_o, b_o, f_o, qinv_o, rinv_o, qg_o, rg_o, aqi_o, t_o, tvec_o,
         qiq_o),
        outs,
    ):
        ref[:] = val


def _spd_inv_tile_kernel(in_ref, out_ref):
    """theta -> theta^{-1} over one lane tile (stair-preconditioner diag)."""
    out_ref[:] = ld.spd_inverse_lane(in_ref[:])


def _stair_tile_kernel(ti_ref, tip_ref, tin_ref, phi_ref, su_ref,
                       pl_ref, pu_ref):
    """Stair off-diagonal products over one lane tile.

    PL = -theta^-1 phi theta_prev^-1, PU = -theta^-1 SU theta_next^-1
    as in-kernel FMA chains (lanedyn.lane_matmul), the same composition
    the monolithic N<=128 kernel uses.  Replaces the XLA einsum glue:
    batched (14,14)x(14,14) matmuls over a trailing N batch axis lower
    to MXU-padded batched dots that dominate the tiled stage cost at
    N>=256 (reference stair setup: include/pcg/linsys_setup.cuh:11-49).
    Boundary masks (m1/mN) are applied by the caller.
    """
    ti = ti_ref[:]
    pl_ref[:] = -ld.lane_matmul(ld.lane_matmul(ti, phi_ref[:]), tip_ref[:])
    pu_ref[:] = -ld.lane_matmul(ld.lane_matmul(ti, su_ref[:]), tin_ref[:])


_TILE = 128


@functools.partial(
    jax.jit,
    static_argnames=("dt", "qd_cost", "r_cost", "integrator_type", "gravity",
                     "hessian", "precond", "wrap", "tracking", "q_cost",
                     "interpret"),
)
def form_kkt_schur_tiled(model: RobotModel, X, U, goals, xs, rho,
                         dt: float, qd_cost: float, r_cost: float,
                         integrator_type: int = 0, gravity: float = 0.0,
                         hessian: str = "reference", precond: bool = True,
                         wrap: bool = False, tracking: str = "eepos",
                         q_cost: float = 1.0,
                         interpret: bool = None) -> LaneSchur:
    """Long-horizon fused KKT+Schur: Pallas grid over 128-knot tiles.

    Same math and outputs as form_kkt_schur_pallas, restructured for
    N > 128: the heavy per-knot stage (tangent RNEA, CRBA, FK chains,
    SPD inverses) runs as a gridded kernel with single-tile lane widths,
    and the cheap cross-knot assembly (neighbor rolls, stair off-diag
    products) runs as batched XLA ops on the (14,14,N) outputs.
    Covers the reference's tuned range through N = 512
    (settings.cuh:135-156)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n, nx = X.shape
    nu = U.shape[1]
    nq = nx // 2
    f32 = X.dtype
    assert n % _TILE == 0, (
        f"tiled fused stages need knot_points % {_TILE} == 0, got {n}; "
        f"use form_kkt_schur_pallas for N <= 128"
    )
    tiles = n // _TILE

    Xl = X.T
    Ul = jnp.concatenate([U, jnp.zeros((1, nu), U.dtype)]).T
    goals_l = goals.T if tracking == "joint" else goals[:, :3].T
    g_dim = goals_l.shape[0]

    kern = functools.partial(
        _tile_kernel, nq, nu, float(dt), float(qd_cost), float(r_cost),
        int(integrator_type), float(gravity), str(hessian),
        bool(wrap), str(tracking), float(q_cost),
    )
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    rep = pl.BlockSpec(memory_space=pltpu.VMEM)     # whole array every tile
    vec = lambda d: pl.BlockSpec((d, _TILE), lambda t: (0, t),
                                 memory_space=pltpu.VMEM)
    mat = lambda d1, d2: pl.BlockSpec((d1, d2, _TILE), lambda t: (0, 0, t),
                                      memory_space=pltpu.VMEM)
    sds = jax.ShapeDtypeStruct
    (A, B, f_pred, Qinv, Rinv, qg, rg, AQi, T, t_vec, Qiq) = pl.pallas_call(
        kern,
        grid=(tiles,),
        out_shape=(
            sds((nx, nx, n), f32), sds((nx, nu, n), f32), sds((nx, n), f32),
            sds((nx, nx, n), f32), sds((nu, nu, n), f32),
            sds((nx, n), f32), sds((nu, n), f32),
            sds((nx, nx, n), f32), sds((nx, nx, n), f32),
            sds((nx, n), f32), sds((nx, n), f32),
        ),
        in_specs=[smem, vec(nx), vec(nu), vec(g_dim)] + [rep] * 10,
        out_specs=(
            mat(nx, nx), mat(nx, nu), vec(nx),
            mat(nx, nx), mat(nu, nu), vec(nx), vec(nu),
            mat(nx, nx), mat(nx, nx), vec(nx), vec(nx),
        ),
        interpret=interpret,
    )(
        jnp.asarray(rho, f32).reshape(1),
        Xl, Ul, goals_l,
        model.Hc, model.Hs, model.Hk, model.dHc, model.dHs, model.dHk,
        model.Xc, model.Xs, model.Xk, model.I,
    )

    # ---- cross-knot assembly in XLA (cheap batched ops on (.., N) arrays)
    lane = jnp.arange(n)
    m1v = (lane >= 1).astype(f32)[None, :]          # (1, N)
    m1 = m1v[None]                                  # (1, 1, N)
    mN = (lane < n - 1).astype(f32)[None, None, :]

    err = jnp.roll(Xl, -1, axis=1) - f_pred         # lane k: c_{k+1}
    c = jnp.roll(err, 1, axis=1) * m1v              # lane k: c_k (c_0 = 0)

    theta = Qinv + jnp.roll(T, 1, axis=2) * m1
    phi = -jnp.roll(AQi, 1, axis=2) * m1
    SU = -jnp.swapaxes(AQi, 0, 1) * mN
    gamma = Qiq - jnp.roll(t_vec, 1, axis=1) * m1v - c

    if precond:
        theta_inv = pl.pallas_call(
            _spd_inv_tile_kernel,
            grid=(tiles,),
            out_shape=sds((nx, nx, n), f32),
            in_specs=[mat(nx, nx)],
            out_specs=mat(nx, nx),
            interpret=interpret,
        )(theta)
        ti_prev = jnp.roll(theta_inv, 1, axis=2)
        ti_next = jnp.roll(theta_inv, -1, axis=2)
        PL, PU = pl.pallas_call(
            _stair_tile_kernel,
            grid=(tiles,),
            out_shape=(sds((nx, nx, n), f32), sds((nx, nx, n), f32)),
            in_specs=[mat(nx, nx)] * 5,
            out_specs=(mat(nx, nx), mat(nx, nx)),
            interpret=interpret,
        )(theta_inv, ti_prev, ti_next, phi, SU)
        PL = PL * m1
        PU = PU * mN
        PD = theta_inv
    else:
        PD = jnp.broadcast_to(jnp.eye(nx, dtype=f32)[:, :, None],
                              (nx, nx, n))
        PL = jnp.zeros_like(theta)
        PU = jnp.zeros_like(theta)

    return LaneSchur(SL=phi, SD=theta, SU=SU, PL=PL, PD=PD, PU=PU,
                     gamma=gamma, Qinv=Qinv, Rinv=Rinv, A=A, B=B,
                     q=qg, r=rg)


def compute_dz_lanes(ls: LaneSchur, lam_l):
    """Primal step from the lane-layout system; lam_l is (nx, N).

    Same math as ops/dz.py: dx_k = -Qinv_k (q_k - lam_k + A_k' lam_{k+1}),
    du_k = -Rinv_k (r_k + B_k' lam_{k+1}).  Returns (dX (N,nx), dU (N-1,nu)).
    """
    n = lam_l.shape[1]
    lam_next = jnp.concatenate(
        [lam_l[:, 1:], jnp.zeros((lam_l.shape[0], 1), lam_l.dtype)], axis=1
    )
    At_lam = jnp.einsum("jik,jk->ik", ls.A, lam_next)
    mask = (jnp.arange(n) < n - 1).astype(lam_l.dtype)[None, :]
    rhs_x = ls.q - lam_l + At_lam * mask
    dX = -jnp.einsum("ijk,jk->ik", ls.Qinv, rhs_x)
    Bt_lam = jnp.einsum("jik,jk->ik", ls.B, lam_next)
    dU = -jnp.einsum("ijk,jk->ik", ls.Rinv, ls.r + Bt_lam)
    return dX.T, dU.T[:-1]
