"""Whole-SQP-iteration megakernel: ONE Pallas dispatch per iteration.

The reference's flagship design point is a persistent cooperative CUDA
kernel cooperating across the whole GPU per solver stage, with the SQP
loop stitching stages from the host (reference include/pcg/sqp.cuh:203-423).
The TPU endpoint of that trajectory is fusing the ENTIRE iteration into
one kernel so the Schur system, duals, step, and line-search candidates
never leave VMEM:

  KKT linearization + Schur condensation   (kkt_schur_kernel._perknot)
  dual solve: exact block cyclic reduction (bcr_kernel._bcr_lanes) OR
              warm-started stair-PCG      (pcg_kernel._pcg_loop)
  primal recovery dz                       (common/dz.cuh semantics)
  8-alpha line-search merit evaluation     (common/merit.cuh semantics)
  accept / Levenberg rho update            (pcg/sqp.cuh:373-389 semantics)

per-iteration I/O shrinks to the iterate itself: (X, U, scalars) in,
(X, U, lam, scalars) out -- ~60 KB at N=64 vs the ~3.6 MB of Schur-system
HBM traffic the staged path round-trips between its three kernels.

The PCG variant (sqp_iter_mega_pcg) is the tracking-grade flagship: the
stair preconditioner is formed in-kernel (linsys_setup.cuh:11-49
semantics) and the dual solve is the warm-started CG loop -- no BCR
drift (see RESULTS.md round-2 analysis), same single-dispatch latency
profile.

Constraints: N <= 128 (single-tile lane width for the tangent-RNEA
stage -- the round-1 Mosaic lesson; power-of-2 additionally required for
the BCR solver), eepos tracking, no angle wrap -- i.e. exactly the
fused-stage envelope.  The line-search batch runs at 8N lanes (<= 1024),
using only routines hardware-verified at those widths (fk_ee_xyz /
aba_qdd / row_sum).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mpcgpu_tpu.models.robot import RobotModel
from mpcgpu_tpu.ops.pallas import lanedyn as ld
from mpcgpu_tpu.ops.pallas.bcr_kernel import _bcr_refined
from mpcgpu_tpu.ops.pallas.kkt_schur_kernel import (_lane_mask, _perknot,
                                                    _perknot_tiled)
from mpcgpu_tpu.ops.pallas.pcg_kernel import _band_spmv_lead, _pcg_loop


# The line-search candidate batch runs at (candidates * N) lanes; widths
# through 9 * 512 = 4608 are hardware-proven (the staged merit kernel at
# N = 512, ops/pallas/merit_kernel.py, horizon-scaling runs).  Beyond the
# budget, candidates are evaluated in lane-budget-sized groups (an
# unrolled outer loop) -- the running argmin preserves the candidate
# order, so selection semantics are unchanged.
_LS_MAX_LANES = 4096


def _ls_contrib(nq: int, nu: int, dt: float, qd_cost: float, r_cost: float,
                integrator_type: int, gravity: float, mu: float,
                group, X, U, dX, dU, goals, xs,
                x_tab, h_tab, I_tab, wrap: bool,
                tracking: str, q_cost: float):
    """Per-lane merit contributions for a group of alpha candidates,
    candidate-major lane batch b = a*N + k (common/merit.cuh semantics).
    Returns contrib (1, len(group)*N)."""
    n = X.shape[1]
    dtype = X.dtype
    g = len(group)
    one = _lane_mask(n, 0, n, dtype)  # forces materialized layouts for concat
    Xc = jnp.concatenate([X + (a * one) * dX for a in group], axis=1)
    Uc = jnp.concatenate([U + (a * one) * dU for a in group], axis=1)
    goals_c = jnp.concatenate([goals] * g, axis=1)

    b = jax.lax.broadcasted_iota(jnp.int32, (1, g * n), 1)
    k_idx = b % n
    mc_last = (k_idx < n - 1).astype(dtype)
    mc0 = (k_idx == 0).astype(dtype)

    q_c, qd_c = Xc[:nq], Xc[nq:]
    if tracking == "joint":
        dq_c = q_c - goals_c[:nq]
        dqd_c = qd_c - goals_c[nq:]
        cost = 0.5 * q_cost * ld.row_sum(dq_c * dq_c)
        cost = cost + 0.5 * qd_cost * ld.row_sum(dqd_c * dqd_c)
    else:
        ee = ld.fk_ee_xyz(h_tab, q_c)
        e3 = ee - goals_c
        cost = 0.5 * ld.row_sum(e3 * e3)
        cost = cost + 0.5 * qd_cost * ld.row_sum(qd_c * qd_c)
    cost = cost + mc_last * 0.5 * r_cost * ld.row_sum(Uc * Uc)
    qdd_c = ld.aba_qdd(x_tab, I_tab, q_c, qd_c, Uc, gravity)
    if integrator_type == 0:
        qn = q_c + dt * qd_c
        qdn = qd_c + dt * qdd_c
    else:
        qdn = qd_c + dt * qdd_c
        qn = q_c + dt * qdn
    if wrap:
        from mpcgpu_tpu.ops.pallas.kkt_schur_kernel import _wrap_lane

        qn = _wrap_lane(qn)
    f_c = jnp.concatenate([qn, qdn], axis=0)
    xc_next = pltpu.roll(Xc, Xc.shape[1] - 1, axis=1)
    defect = ld.row_sum(jnp.abs(xc_next - f_c)) * mc_last
    c0 = ld.row_sum(jnp.abs(Xc - xs)) * mc0
    return cost + mu * (defect + c0), b       # (1, g*N)


def _line_search(nq: int, nu: int, dt: float, qd_cost: float, r_cost: float,
                 integrator_type: int, gravity: float, mu: float,
                 num_alphas: int, X, U, dX, dU, goals, xs,
                 x_tab, h_tab, I_tab, wrap: bool = False,
                 tracking: str = "eepos", q_cost: float = 1.0):
    """8-alpha candidate merit evaluation (the incumbent merit arrives
    from the previous iteration).  Candidates run as one lane batch up to
    _LS_MAX_LANES, in groups beyond (N >= 256).  Returns
    (best_merit, best_alpha)."""
    n = X.shape[1]
    dtype = X.dtype
    alphas = [1.0 / 2 ** i for i in range(num_alphas)]
    chunk = max(1, min(num_alphas, _LS_MAX_LANES // n))

    best_merit = best_alpha = None
    for c0 in range(0, num_alphas, chunk):
        group = alphas[c0:c0 + chunk]
        contrib, b = _ls_contrib(
            nq, nu, dt, qd_cost, r_cost, integrator_type, gravity, mu,
            group, X, U, dX, dU, goals, xs, x_tab, h_tab, I_tab,
            wrap, tracking, q_cost)
        cand = b // n
        for i, a in enumerate(group):
            m_i = jnp.sum(jnp.where(cand == i, contrib, 0.0))
            if best_merit is None:
                best_merit = m_i
                best_alpha = jnp.asarray(a, dtype)
            else:
                take = m_i < best_merit
                best_alpha = jnp.where(take, jnp.asarray(a, dtype),
                                       best_alpha)
                best_merit = jnp.where(take, m_i, best_merit)
    return best_merit, best_alpha


def _rho_schedule(rho, drho, merit_prev, best_merit, best_alpha,
                  rho_factor: float, rho_min: float, rho_max: float,
                  rho_reset: float, dtype):
    """Accept test + Levenberg rho schedule (pcg/sqp.cuh:373-389).

    Returns (accept, step, rho_new, drho_new, merit_new, bail)."""
    accept = best_merit < merit_prev
    f = jnp.asarray(rho_factor, dtype)
    drho_rej = jnp.maximum(drho * f, f)
    rho_rej = jnp.maximum(rho * drho_rej, rho_min)
    drho_acc = jnp.minimum(drho / f, 1.0 / f)
    rho_acc = jnp.maximum(rho * drho_acc, rho_min)
    drho_new = jnp.where(accept, drho_acc, drho_rej)
    rho_new = jnp.where(accept, rho_acc, rho_rej)
    bail = jnp.logical_and(jnp.logical_not(accept), rho_new > rho_max)
    rho_new = jnp.where(bail, rho_reset, rho_new)
    step = jnp.where(accept, best_alpha, jnp.asarray(0.0, dtype))
    merit_new = jnp.where(accept, best_merit, merit_prev)
    return accept, step, rho_new, drho_new, merit_new, bail


def _mega_kernel(nq: int, nu: int, dt: float, qd_cost: float, r_cost: float,
                 integrator_type: int, gravity: float, hessian: str,
                 mu: float, num_alphas: int, rho_factor: float,
                 rho_min: float, rho_max: float, rho_reset: float,
                 wrap: bool, tracking: str, q_cost: float,
                 rho_ref, drho_ref, merit_ref,
                 x_ref, u_ref, goals_ref, xs_ref,
                 hc, hs, hk, dhc, dhs, dhk, xc, xs_t, xk, i_ref,
                 x_out, u_out, lam_out,
                 rho_out, drho_out, merit_out, accept_out, bail_out):
    nx = 2 * nq
    X = x_ref[:]                  # (nx, N) lane layout
    U = u_ref[:]                  # (nu, N), lane N-1 zero
    goals = goals_ref[:]          # (3, N) ee / (nx, N) joint refs
    xs = xs_ref[:]                # (nx, 1)
    rho = rho_ref[0]
    drho = drho_ref[0]
    merit_prev = merit_ref[0]
    n = X.shape[1]
    dtype = X.dtype

    x_tab = (xc[:], xs_t[:], xk[:])
    h_tab = (hc[:], hs[:], hk[:])
    dh_tab = (dhc[:], dhs[:], dhk[:])
    I_tab = i_ref[:]

    # ---- KKT linearization + per-knot Schur products
    (A, Bm, f_pred, Qinv, Rinv, qg, rg, AQi, T, t_vec, Qiq) = _perknot(
        nq, nu, dt, qd_cost, r_cost, integrator_type, gravity, hessian,
        rho, X, U, goals, x_tab, h_tab, dh_tab, I_tab,
        wrap=wrap, tracking=tracking, q_cost=q_cost,
    )

    # ---- cross-knot Schur assembly (kkt_schur_kernel._kernel, no Pinv:
    # the BCR solve is exact and unpreconditioned)
    x_next = pltpu.roll(X, n - 1, axis=1)
    err = x_next - f_pred
    c = pltpu.roll(err, 1, axis=1) * _lane_mask(n, 1, n, dtype)
    m1 = _lane_mask(n, 1, n, dtype)[None]
    mN = _lane_mask(n, 0, n - 1, dtype)[None]
    theta = Qinv + pltpu.roll(T, 1, axis=2) * m1
    phi = -pltpu.roll(AQi, 1, axis=2) * m1
    SU = -ld.lane_transpose(AQi) * mN
    gamma = Qiq - pltpu.roll(t_vec, 1, axis=1) * m1[0] - c

    # ---- exact dual solve (block cyclic reduction + refinement)
    lam = _bcr_refined(theta, phi, SU, gamma)

    # ---- primal recovery (common/dz.cuh:125 semantics)
    m_last = _lane_mask(n, 0, n - 1, dtype)
    lam_next = pltpu.roll(lam, n - 1, axis=1) * m_last
    At_lam = ld.lane_matvec_T(A, lam_next) * m_last
    dX = -ld.lane_matvec(Qinv, qg - lam + At_lam)
    dU = -ld.lane_matvec(Rinv, rg + ld.lane_matvec_T(Bm, lam_next)) * m_last

    # ---- 8-alpha line search + accept / Levenberg rho schedule
    best_merit, best_alpha = _line_search(
        nq, nu, dt, qd_cost, r_cost, integrator_type, gravity, mu,
        num_alphas, X, U, dX, dU, goals, xs, x_tab, h_tab, I_tab,
        wrap=wrap, tracking=tracking, q_cost=q_cost,
    )
    accept, step, rho_new, drho_new, merit_new, bail = _rho_schedule(
        rho, drho, merit_prev, best_merit, best_alpha,
        rho_factor, rho_min, rho_max, rho_reset, dtype,
    )
    x_out[:] = X + step * dX
    u_out[:] = U + step * dU
    lam_out[:] = lam
    rho_out[0] = rho_new
    drho_out[0] = drho_new
    merit_out[0] = merit_new
    accept_out[0] = accept.astype(jnp.int32)
    bail_out[0] = bail.astype(jnp.int32)


def _canon(x):
    """Force a canonical-layout copy of an in-kernel value.

    Band operands reaching the CG loop as lazily-rolled / transposed
    values keep Mosaic offset layouts; every use inside the loop body
    then pays a relayout PER CG ITERATION.  Adding a computed (iota-
    derived) zero forces one materialization up front instead.
    """
    n = x.shape[-1]
    z = (jax.lax.broadcasted_iota(jnp.int32, (1, n), 1) < 0).astype(x.dtype)
    return x + z


def _iteration_pcg(nq: int, nu: int, dt: float, qd_cost: float,
                   r_cost: float, integrator_type: int, gravity: float,
                   hessian: str, mu: float, num_alphas: int,
                   rho_factor: float, rho_min: float, rho_max: float,
                   rho_reset: float, wrap: bool, tracking: str, q_cost: float,
                   X, U, goals, xs, lam0, rho, drho, merit_prev,
                   max_iter, tol, x_tab, h_tab, dh_tab, I_tab,
                   mat_bands: bool = False):
    """One full SQP iteration with the stair-PCG dual solve, as pure
    lane-value math (no refs) -- shared by the single-iteration kernel
    (_mega_kernel_pcg) and the whole-solve kernel (_solve_kernel_pcg).

    Returns (X', U', lam, rho', drho', merit', accept, bail, iters, hit)."""
    n = X.shape[1]
    dtype = X.dtype

    # ---- KKT linearization + per-knot Schur products (tiled in-kernel
    # beyond 128 lanes: the tangent-RNEA stage is single-tile-bound)
    (A, Bm, f_pred, Qinv, Rinv, qg, rg, AQi, T, t_vec, Qiq) = _perknot_tiled(
        nq, nu, dt, qd_cost, r_cost, integrator_type, gravity, hessian,
        rho, X, U, goals, x_tab, h_tab, dh_tab, I_tab,
        wrap=wrap, tracking=tracking, q_cost=q_cost,
    )

    # ---- cross-knot Schur assembly (kkt_schur_kernel._kernel semantics)
    x_next = pltpu.roll(X, n - 1, axis=1)
    err = x_next - f_pred
    c = pltpu.roll(err, 1, axis=1) * _lane_mask(n, 1, n, dtype)
    m1 = _lane_mask(n, 1, n, dtype)[None]
    mN = _lane_mask(n, 0, n - 1, dtype)[None]
    theta = Qinv + pltpu.roll(T, 1, axis=2) * m1
    phi = -pltpu.roll(AQi, 1, axis=2) * m1
    SU = -ld.lane_transpose(AQi) * mN
    gamma = Qiq - pltpu.roll(t_vec, 1, axis=1) * m1[0] - c

    # ---- stair preconditioner (linsys_setup.cuh:11-49)
    theta_inv = ld.spd_inverse_lane(theta)
    PL = -ld.lane_matmul(
        ld.lane_matmul(theta_inv, phi), pltpu.roll(theta_inv, 1, axis=2)
    ) * m1
    PU = -ld.lane_matmul(
        ld.lane_matmul(theta_inv, SU), pltpu.roll(theta_inv, n - 1, axis=2)
    ) * mN

    # ---- warm-started CG dual solve (the staged kernel's _pcg_loop)
    if mat_bands:
        phi, theta, SU = _canon(phi), _canon(theta), _canon(SU)
        PL, theta_inv, PU = _canon(PL), _canon(theta_inv), _canon(PU)
        gamma = _canon(gamma)
    # lead (j, i, N) band layout: one swapaxes per band per SQP iteration
    # buys leading-dim slab picks instead of sublane extracts in EVERY CG
    # iteration (see pcg_kernel._band_spmv_lead; bit-identical results)
    phi_t, theta_t, SU_t = (ld.lane_transpose(phi), ld.lane_transpose(theta),
                            ld.lane_transpose(SU))
    PL_t, PD_t, PU_t = (ld.lane_transpose(PL), ld.lane_transpose(theta_inv),
                        ld.lane_transpose(PU))
    lam, iters, eta = _pcg_loop(phi_t, theta_t, SU_t, PL_t, PD_t, PU_t,
                                gamma, lam0, max_iter, tol,
                                spmv=_band_spmv_lead)
    hit = (jnp.abs(eta) > tol).astype(jnp.int32)

    # ---- primal recovery (common/dz.cuh:125 semantics)
    m_last = _lane_mask(n, 0, n - 1, dtype)
    lam_next = pltpu.roll(lam, n - 1, axis=1) * m_last
    At_lam = ld.lane_matvec_T(A, lam_next) * m_last
    dX = -ld.lane_matvec(Qinv, qg - lam + At_lam)
    dU = -ld.lane_matvec(Rinv, rg + ld.lane_matvec_T(Bm, lam_next)) * m_last

    # ---- 8-alpha line search + accept / Levenberg rho schedule
    best_merit, best_alpha = _line_search(
        nq, nu, dt, qd_cost, r_cost, integrator_type, gravity, mu,
        num_alphas, X, U, dX, dU, goals, xs, x_tab, h_tab, I_tab,
        wrap=wrap, tracking=tracking, q_cost=q_cost,
    )
    accept, step, rho_new, drho_new, merit_new, bail = _rho_schedule(
        rho, drho, merit_prev, best_merit, best_alpha,
        rho_factor, rho_min, rho_max, rho_reset, dtype,
    )
    return (X + step * dX, U + step * dU, lam, rho_new, drho_new,
            merit_new, accept, bail, iters, hit)


def _mega_kernel_pcg(nq: int, nu: int, dt: float, qd_cost: float,
                     r_cost: float, integrator_type: int, gravity: float,
                     hessian: str, mu: float, num_alphas: int,
                     rho_factor: float, rho_min: float, rho_max: float,
                     rho_reset: float,
                     wrap: bool, tracking: str, q_cost: float,
                     mat_bands: bool,
                     max_iter_ref, tol_ref, rho_ref, drho_ref, merit_ref,
                     x_ref, u_ref, goals_ref, xs_ref, lam0_ref,
                     hc, hs, hk, dhc, dhs, dhk, xc, xs_t, xk, i_ref,
                     x_out, u_out, lam_out,
                     rho_out, drho_out, merit_out, accept_out, bail_out,
                     iters_out, hit_out):
    """The tracking-grade megakernel: stair-PCG dual solve instead of BCR.

    Identical per-knot / cross-knot stages, plus the in-kernel stair
    preconditioner (linsys_setup.cuh:11-49 semantics) and the warm-started
    CG loop (_pcg_loop, the same routine the staged fused kernel runs)."""
    x_tab = (xc[:], xs_t[:], xk[:])
    h_tab = (hc[:], hs[:], hk[:])
    dh_tab = (dhc[:], dhs[:], dhk[:])

    (Xn, Un, lam, rho_new, drho_new, merit_new, accept, bail, iters,
     hit) = _iteration_pcg(
        nq, nu, dt, qd_cost, r_cost, integrator_type, gravity, hessian,
        mu, num_alphas, rho_factor, rho_min, rho_max, rho_reset,
        wrap, tracking, q_cost,
        x_ref[:], u_ref[:], goals_ref[:], xs_ref[:], lam0_ref[:],
        rho_ref[0], drho_ref[0], merit_ref[0],
        max_iter_ref[0], tol_ref[0], x_tab, h_tab, dh_tab, i_ref[:],
        mat_bands=mat_bands,
    )
    x_out[:] = Xn
    u_out[:] = Un
    lam_out[:] = lam
    rho_out[0] = rho_new
    drho_out[0] = drho_new
    merit_out[0] = merit_new
    accept_out[0] = accept.astype(jnp.int32)
    bail_out[0] = bail.astype(jnp.int32)
    iters_out[0] = iters
    hit_out[0] = hit


_STATS_LANES = 128  # lane-width-padded per-iteration stats rows


def _solve_kernel_pcg(nq: int, nu: int, n_sqp_iter: int, dt: float,
                      qd_cost: float, r_cost: float, integrator_type: int,
                      gravity: float, hessian: str, mu: float,
                      num_alphas: int, rho_factor: float, rho_min: float,
                      rho_max: float, rho_reset: float,
                      wrap: bool, tracking: str, q_cost: float,
                      mat_bands: bool,
                      max_iter_ref, tol_ref, rho_ref, drho_ref, merit_ref,
                      x_ref, u_ref, goals_ref, xs_ref, lam0_ref,
                      hc, hs, hk, dhc, dhs, dhk, xc, xs_t, xk, i_ref,
                      x_out, u_out, lam_out,
                      rho_out, drho_out, merit_out, it_out, bailed_out,
                      iters_out, hit_out, accept_out):
    """The WHOLE SQP solve in one dispatch: an in-kernel fori_loop over
    n_sqp_iter iterations of _iteration_pcg, with rho-bail masking (the
    staged while_loop exits on bail; here the state freezes instead --
    identical final state and stats).  The iterate, duals, and Schur
    system never leave VMEM between SQP iterations.

    Per-iteration stats (pcg iters / hit-max / accepted) accumulate into
    (1, _STATS_LANES) rows via iota masks -- Mosaic has no scatter."""
    x_tab = (xc[:], xs_t[:], xk[:])
    h_tab = (hc[:], hs[:], hk[:])
    dh_tab = (dhc[:], dhs[:], dhk[:])
    I_tab = i_ref[:]
    goals = goals_ref[:]
    xs = xs_ref[:]
    max_iter = max_iter_ref[0]
    tol = tol_ref[0]
    slot_iota = jax.lax.broadcasted_iota(jnp.int32, (1, _STATS_LANES), 1)

    def body(i, carry):
        (X, U, lam, rho, drho, merit, done, itc,
         iters_v, hit_v, acc_v) = carry
        (Xn, Un, lamn, rhon, drhon, meritn, accept, bail, iters,
         hit) = _iteration_pcg(
            nq, nu, dt, qd_cost, r_cost, integrator_type, gravity, hessian,
            mu, num_alphas, rho_factor, rho_min, rho_max, rho_reset,
            wrap, tracking, q_cost,
            X, U, goals, xs, lam, rho, drho, merit,
            max_iter, tol, x_tab, h_tab, dh_tab, I_tab,
            mat_bands=mat_bands,
        )
        live = jnp.logical_not(done)
        livef = live.astype(X.dtype)
        sel = lambda new, old: jnp.where(live, new, old)
        slot = jnp.logical_and(slot_iota == i, live)
        return (
            sel(Xn, X), sel(Un, U), sel(lamn, lam),
            sel(rhon, rho), sel(drhon, drho), sel(meritn, merit),
            jnp.logical_or(done, bail), itc + live.astype(jnp.int32),
            jnp.where(slot, iters, iters_v),
            jnp.where(slot, hit, hit_v),
            jnp.where(slot, accept.astype(jnp.int32), acc_v),
        )

    neg1 = jnp.full((1, _STATS_LANES), -1, jnp.int32)
    zero = jnp.zeros((1, _STATS_LANES), jnp.int32)
    init = (x_ref[:], u_ref[:], lam0_ref[:],
            rho_ref[0], drho_ref[0], merit_ref[0],
            jnp.bool_(False), jnp.int32(0), neg1, zero, zero)
    (X, U, lam, rho, drho, merit, done, itc,
     iters_v, hit_v, acc_v) = jax.lax.fori_loop(0, n_sqp_iter, body, init)

    x_out[:] = X
    u_out[:] = U
    lam_out[:] = lam
    rho_out[0] = rho
    drho_out[0] = drho
    merit_out[0] = merit
    it_out[0] = itc
    bailed_out[0] = done.astype(jnp.int32)
    iters_out[:] = iters_v
    hit_out[:] = hit_v
    accept_out[:] = acc_v


# ---------------------------------------------------------------------------
# Arm-packed variant: B independent arms share the 128-lane width
# (lanes b = a*N + k).  One v5e chip is one TensorCore, so on-chip
# multi-arm throughput is LANE FILL: at N=64 a single arm leaves half
# the lanes idle; packing B arms with B*N <= 128 runs them for the
# price of one (results/round3/batched_throughput.json documented the
# vmap route's failure; this is the batch-grid fix it called for).
# All cross-knot rolls stay full-width -- the per-arm edge masks
# (k = lane % N) zero the band blocks whose circular wrap-around would
# couple neighboring arms, exactly like the single-arm edge blocks.
# Scalars (rho, merit, accept, ...) become per-arm LANE ROWS (1, B*N),
# constant within each arm's segment; CG dots reduce per arm via
# segment masks.
# ---------------------------------------------------------------------------


def _arm_lane_masks(b_arms: int, n_arm: int, dtype, rows: int = 1):
    """Per-arm lane masks at (rows, nt).  Packed per-arm quantities are
    kept at FULL sublane width (rows = nx) inside the kernel: Mosaic has
    no sublane broadcast for loop-carried (1, nt) rows ("Not
    implemented: Sublane broadcast"), so every per-arm row is built and
    carried already expanded instead of broadcast at use sites."""
    nt = b_arms * n_arm
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, nt), 1)
    return [((lane // n_arm) == a).astype(dtype) for a in range(b_arms)]


def _seg_masks(n_arm: int, nt: int, dtype):
    """Per-arm edge masks at full width: m1 (k >= 1), mN (k <= N-2),
    k = lane % n_arm."""
    k = jax.lax.broadcasted_iota(jnp.int32, (1, nt), 1) % n_arm
    return (k >= 1).astype(dtype), (k <= n_arm - 2).astype(dtype)


def _pdot(a, b, arm_masks):
    """Per-arm <a, b> at full width: arm_masks are (rows, nt) matching
    a/b, and each arm's scalar dot is written back over its whole
    (rows x lane-segment) block -- no (1, nt) intermediates, so nothing
    ever needs a Mosaic sublane broadcast."""
    prod = a * b
    out = jnp.zeros_like(a)
    for m in arm_masks:
        out = out + m * jnp.sum(prod * m)
    return out


def _safe_div(num, den):
    """num/den with 0/0 -> 0: a converged arm (r = 0 exactly) freezes
    instead of poisoning its lanes with NaN while other arms iterate."""
    live = jnp.abs(num) > 0
    return jnp.where(live, num / jnp.where(live, den, 1.0), 0.0)


def _pcg_loop_packed(SLt, SDt, SUt, PLt, PDt, PUt, gamma, lam0, max_iter,
                     tol, arm_masks):
    """_pcg_loop with per-arm dots (lead-layout bands).  Runs until every
    arm meets the tolerance or the shared cap.  arm_masks and eta are
    full-width (nx, nt) per-arm fields.  Returns (lam, iters, eta)."""
    r0 = gamma - _band_spmv_lead(SLt, SDt, SUt, lam0)
    rt0 = _band_spmv_lead(PLt, PDt, PUt, r0)
    eta0 = _pdot(r0, rt0, arm_masks)

    def step(carry):
        lam, r, p, eta, i = carry
        ups = _band_spmv_lead(SLt, SDt, SUt, p)
        alpha = _safe_div(eta, _pdot(p, ups, arm_masks))
        lam = lam + alpha * p
        r = r - alpha * ups
        rt = _band_spmv_lead(PLt, PDt, PUt, r)
        eta_new = _pdot(r, rt, arm_masks)
        p = rt + _safe_div(eta_new, eta) * p
        return lam, r, p, eta_new, i + 1

    def cond(carry):
        _, _, _, eta, i = carry
        return jnp.logical_and(i < max_iter, jnp.max(jnp.abs(eta)) > tol)

    lam, _r, _p, eta, iters = jax.lax.while_loop(
        cond, step, (lam0, r0, rt0, eta0, jnp.int32(0)))
    return lam, iters, eta


def _line_search_packed(nq: int, nu: int, dt: float, qd_cost: float,
                        r_cost: float, integrator_type: int, gravity: float,
                        mu: float, num_alphas: int, b_arms: int, n_arm: int,
                        X, U, dX, dU, goals, xs_l,
                        x_tab, h_tab, I_tab, wrap: bool = False,
                        tracking: str = "eepos", q_cost: float = 1.0):
    """_line_search for packed arms: candidate-major, arm-middle lane
    batch b = c*(B*N) + a*N + k, merit reduced per (candidate, arm),
    argmin per arm.  xs_l is (nx, B*N) with each arm's start state
    broadcast over its segment (only the k=0 lane survives the mask).
    Returns per-arm fields at full width (best_merit (nx, B*N),
    best_alpha (nx, B*N); each arm's scalar replicated over its block).
    num_alphas=1 with dX=dU=0 evaluates the incumbent merit."""
    nt = b_arms * n_arm
    dtype = X.dtype
    alphas = [1.0 / 2 ** i for i in range(num_alphas)]
    chunk = max(1, min(num_alphas, _LS_MAX_LANES // nt))
    arm_masks = _arm_lane_masks(b_arms, n_arm, dtype, rows=2 * nq)
    one = _lane_mask(nt, 0, nt, dtype)

    # per-arm running argmin over candidate groups (candidate order
    # preserved, so selection semantics match the single-batch form);
    # bm_a / ba_a hold each arm's scalar chain
    bm_arm = [None] * b_arms
    ba_arm = [None] * b_arms
    for g0 in range(0, num_alphas, chunk):
        group = alphas[g0:g0 + chunk]
        g = len(group)
        Xc = jnp.concatenate([X + (a * one) * dX for a in group], axis=1)
        Uc = jnp.concatenate([U + (a * one) * dU for a in group], axis=1)
        goals_c = jnp.concatenate([goals] * g, axis=1)
        xs_c = jnp.concatenate([xs_l] * g, axis=1)

        b = jax.lax.broadcasted_iota(jnp.int32, (1, g * nt), 1)
        k_idx = b % n_arm
        mc_last = (k_idx < n_arm - 1).astype(dtype)
        mc0 = (k_idx == 0).astype(dtype)

        q_c, qd_c = Xc[:nq], Xc[nq:]
        if tracking == "joint":
            dq_c = q_c - goals_c[:nq]
            dqd_c = qd_c - goals_c[nq:]
            cost = 0.5 * q_cost * ld.row_sum(dq_c * dq_c)
            cost = cost + 0.5 * qd_cost * ld.row_sum(dqd_c * dqd_c)
        else:
            ee = ld.fk_ee_xyz(h_tab, q_c)
            e3 = ee - goals_c
            cost = 0.5 * ld.row_sum(e3 * e3)
            cost = cost + 0.5 * qd_cost * ld.row_sum(qd_c * qd_c)
        cost = cost + mc_last * 0.5 * r_cost * ld.row_sum(Uc * Uc)
        qdd_c = ld.aba_qdd(x_tab, I_tab, q_c, qd_c, Uc, gravity)
        if integrator_type == 0:
            qn = q_c + dt * qd_c
            qdn = qd_c + dt * qdd_c
        else:
            qdn = qd_c + dt * qdd_c
            qn = q_c + dt * qdn
        if wrap:
            from mpcgpu_tpu.ops.pallas.kkt_schur_kernel import _wrap_lane

            qn = _wrap_lane(qn)
        f_c = jnp.concatenate([qn, qdn], axis=0)
        xc_next = pltpu.roll(Xc, Xc.shape[1] - 1, axis=1)
        defect = ld.row_sum(jnp.abs(xc_next - f_c)) * mc_last
        c0 = ld.row_sum(jnp.abs(Xc - xs_c)) * mc0
        contrib = cost + mu * (defect + c0)    # (1, g*B*N)

        # per-(candidate, arm) reduction: group index grp = c*B + a
        grp = b // n_arm
        for a in range(b_arms):
            for i, alpha in enumerate(group):
                m_ia = jnp.sum(jnp.where(grp == i * b_arms + a,
                                         contrib, 0.0))
                if bm_arm[a] is None:
                    bm_arm[a] = m_ia
                    ba_arm[a] = jnp.asarray(alpha, dtype)
                else:
                    take = m_ia < bm_arm[a]
                    ba_arm[a] = jnp.where(take, jnp.asarray(alpha, dtype),
                                          ba_arm[a])
                    bm_arm[a] = jnp.where(take, m_ia, bm_arm[a])

    # results assembled at full (nx, nt) width (scalar-times-mask only;
    # see _arm_lane_masks on why no (1, nt) rows)
    best_merit = jnp.zeros((2 * nq, nt), dtype)
    best_alpha = jnp.zeros((2 * nq, nt), dtype)
    for a in range(b_arms):
        best_merit = best_merit + arm_masks[a] * bm_arm[a]
        best_alpha = best_alpha + arm_masks[a] * ba_arm[a]
    return best_merit, best_alpha


def _iteration_pcg_packed(nq: int, nu: int, dt: float, qd_cost: float,
                          r_cost: float, integrator_type: int,
                          gravity: float, hessian: str, mu: float,
                          num_alphas: int, rho_factor: float, rho_min: float,
                          rho_max: float, rho_reset: float, wrap: bool,
                          tracking: str, q_cost: float, b_arms: int,
                          n_arm: int,
                          X, U, goals, xs_l, lam0, rho_l, drho_l,
                          merit_prev_l, max_iter, tol,
                          x_tab, h_tab, dh_tab, I_tab):
    """_iteration_pcg for B packed arms: identical stage structure, with
    per-arm edge masks, per-arm CG dots, and per-arm accept/rho fields.
    rho_l/drho_l/merit_prev_l are (nx, B*N) full-width per-arm fields
    (each arm's scalar replicated over its rows x lane-segment block --
    see _arm_lane_masks).  Returns (X', U', lam, rho', drho', merit',
    accept (nx,nt) bool, bail (nx,nt) bool, iters, eta (nx,nt))."""
    nt = X.shape[1]
    dtype = X.dtype

    # rho enters _perknot only as Q/R regularization -- a (1, nt) lane row
    # broadcasts through Q + rho*I per knot, giving each arm its own rho.
    # Tiled beyond 128 lanes (per-knot work is arm-agnostic, so tiling the
    # packed lane axis is exact as long as nt % 128 == 0 keeps arm
    # segments intact -- asserted by the caller).
    (A, Bm, f_pred, Qinv, Rinv, qg, rg, AQi, T, t_vec, Qiq) = _perknot_tiled(
        nq, nu, dt, qd_cost, r_cost, integrator_type, gravity, hessian,
        rho_l, X, U, goals, x_tab, h_tab, dh_tab, I_tab,
        wrap=wrap, tracking=tracking, q_cost=q_cost,
    )

    m1v, mNv = _seg_masks(n_arm, nt, dtype)
    m1 = m1v[None]
    mN = mNv[None]
    x_next = pltpu.roll(X, nt - 1, axis=1)
    err = x_next - f_pred
    c = pltpu.roll(err, 1, axis=1) * m1v
    theta = Qinv + pltpu.roll(T, 1, axis=2) * m1
    phi = -pltpu.roll(AQi, 1, axis=2) * m1
    SU = -ld.lane_transpose(AQi) * mN
    gamma = Qiq - pltpu.roll(t_vec, 1, axis=1) * m1v - c

    theta_inv = ld.spd_inverse_lane(theta)
    PL = -ld.lane_matmul(
        ld.lane_matmul(theta_inv, phi), pltpu.roll(theta_inv, 1, axis=2)
    ) * m1
    PU = -ld.lane_matmul(
        ld.lane_matmul(theta_inv, SU), pltpu.roll(theta_inv, nt - 1, axis=2)
    ) * mN

    arm_masks = _arm_lane_masks(b_arms, n_arm, dtype, rows=X.shape[0])
    lam, iters, eta = _pcg_loop_packed(
        ld.lane_transpose(phi), ld.lane_transpose(theta),
        ld.lane_transpose(SU), ld.lane_transpose(PL),
        ld.lane_transpose(theta_inv), ld.lane_transpose(PU),
        gamma, lam0, max_iter, tol, arm_masks)

    lam_next = pltpu.roll(lam, nt - 1, axis=1) * mNv
    At_lam = ld.lane_matvec_T(A, lam_next) * mNv
    dX = -ld.lane_matvec(Qinv, qg - lam + At_lam)
    dU = -ld.lane_matvec(Rinv, rg + ld.lane_matvec_T(Bm, lam_next)) * mNv

    best_merit_l, best_alpha_l = _line_search_packed(
        nq, nu, dt, qd_cost, r_cost, integrator_type, gravity, mu,
        num_alphas, b_arms, n_arm, X, U, dX, dU, goals, xs_l,
        x_tab, h_tab, I_tab, wrap=wrap, tracking=tracking, q_cost=q_cost,
    )
    accept, step, rho_new, drho_new, merit_new, bail = _rho_schedule(
        rho_l, drho_l, merit_prev_l, best_merit_l, best_alpha_l,
        rho_factor, rho_min, rho_max, rho_reset, dtype,
    )
    return (X + step * dX, U + step[: U.shape[0]] * dU, lam, rho_new,
            drho_new, merit_new, accept, bail, iters, eta)


def _solve_kernel_pcg_packed(nq: int, nu: int, n_sqp_iter: int, b_arms: int,
                             dt: float, qd_cost: float, r_cost: float,
                             integrator_type: int, gravity: float,
                             hessian: str, mu: float, num_alphas: int,
                             rho_factor: float, rho_min: float,
                             rho_max: float, rho_reset: float,
                             wrap: bool, tracking: str, q_cost: float,
                             max_iter_ref, tol_ref,
                             x_ref, u_ref, goals_ref, xs_ref, lam0_ref,
                             rho_ref, drho_ref,
                             hc, hs, hk, dhc, dhs, dhk, xc, xs_t, xk, i_ref,
                             x_out, u_out, lam_out, rho_out, drho_out,
                             merit_out, it_out, bailed_out, pcg_out):
    """The whole packed SQP solve in one dispatch: per-arm rho-bail
    freezes that arm's lanes while the rest keep iterating (per-arm
    analogue of _solve_kernel_pcg's done flag).  The incumbent merit is
    evaluated in-kernel (1-candidate packed line search), so no merit0
    input is needed.  All per-arm state (rho, drho, merit, done, iter
    counts) lives at full (nx, nt) width inside the kernel; the (1, nt)
    output refs take row 0."""
    x_tab = (xc[:], xs_t[:], xk[:])
    h_tab = (hc[:], hs[:], hk[:])
    dh_tab = (dhc[:], dhs[:], dhk[:])
    I_tab = i_ref[:]
    goals = goals_ref[:]
    xs_l = xs_ref[:]
    max_iter = max_iter_ref[0]
    tol = tol_ref[0]
    X0 = x_ref[:]
    U0 = u_ref[:]
    nt = X0.shape[1]
    n_arm = nt // b_arms
    dtype = X0.dtype

    merit0_l, _ = _line_search_packed(
        nq, nu, dt, qd_cost, r_cost, integrator_type, gravity, mu,
        1, b_arms, n_arm, X0, U0, X0 * 0.0, U0 * 0.0, goals, xs_l,
        x_tab, h_tab, I_tab, wrap=wrap, tracking=tracking, q_cost=q_cost,
    )

    def body(_i, carry):
        X, U, lam, rho_l, drho_l, merit_l, done_f, itc_f, pcg_tot = carry
        (Xn, Un, lamn, rhon, drhon, meritn, _accept, bail, iters,
         _eta) = _iteration_pcg_packed(
            nq, nu, dt, qd_cost, r_cost, integrator_type, gravity, hessian,
            mu, num_alphas, rho_factor, rho_min, rho_max, rho_reset,
            wrap, tracking, q_cost, b_arms, n_arm,
            X, U, goals, xs_l, lam, rho_l, drho_l, merit_l,
            max_iter, tol, x_tab, h_tab, dh_tab, I_tab,
        )
        live = done_f == 0.0                     # (nx, nt) per-arm
        livef = 1.0 - done_f
        sel = lambda new, old: jnp.where(live, new, old)
        sel_u = lambda new, old: jnp.where(live[: U.shape[0]], new, old)
        return (
            sel(Xn, X), sel_u(Un, U), sel(lamn, lam),
            sel(rhon, rho_l), sel(drhon, drho_l), sel(meritn, merit_l),
            jnp.where(jnp.logical_and(live, bail),
                      jnp.asarray(1.0, dtype), done_f),
            itc_f + livef,
            pcg_tot + jnp.where(jnp.sum(livef) > 0.0, iters, 0),
        )

    # Per-arm done/iteration-count state is carried as f32 FIELDS like
    # X/U/lam (the hardware-proven carry dtype): bool (i1) and int32
    # full-width carries kill the Mosaic compiler at the fori_loop
    # back-edge (results/round3/packed_bisect.json -- every sub-stage
    # compiles, only the loop wrapper with bool/int carries dies).
    # Inits derive from computed values (X0 * 0), never splat
    # constants, so they enter the loop with concrete layouts.
    zeros_f = X0 * jnp.asarray(0.0, dtype)
    init = (X0, U0, lam0_ref[:], rho_ref[:], drho_ref[:],
            merit0_l + zeros_f, zeros_f, zeros_f,
            jnp.int32(0))
    (X, U, lam, rho_l, drho_l, merit_l, done_f, itc_f,
     pcg_tot) = jax.lax.fori_loop(0, n_sqp_iter, body, init)

    x_out[:] = X
    u_out[:] = U
    lam_out[:] = lam
    rho_out[:] = rho_l[:1]
    drho_out[:] = drho_l[:1]
    merit_out[:] = merit_l[:1]
    it_out[:] = itc_f[:1].astype(jnp.int32)
    bailed_out[:] = done_f[:1].astype(jnp.int32)
    pcg_out[0] = pcg_tot


@functools.partial(
    jax.jit,
    static_argnames=("b_arms", "n_sqp_iter", "dt", "qd_cost", "r_cost",
                     "integrator_type", "gravity", "hessian", "mu",
                     "num_alphas", "rho_factor", "rho_min", "rho_max",
                     "rho_reset", "wrap", "tracking", "q_cost", "interpret"),
)
def sqp_solve_mega_pcg_packed(model: RobotModel, Xl, Ul, goals_l, xs_l,
                              lam0_l, rho_l, drho_l, max_iter, exit_tol,
                              b_arms: int, n_sqp_iter: int,
                              dt: float, qd_cost: float, r_cost: float,
                              integrator_type: int, gravity: float,
                              hessian: str, mu: float, num_alphas: int,
                              rho_factor: float, rho_min: float,
                              rho_max: float, rho_reset: float,
                              wrap: bool = False, tracking: str = "eepos",
                              q_cost: float = 1.0, interpret: bool = None):
    """Whole SQP solve for B arms packed into one lane batch, ONE Pallas
    dispatch.  Xl (nx, B*N), Ul (nu, B*N; each arm's lane N-1 zero),
    goals_l ((3, B*N) ee / (nx, B*N) joint refs), xs_l (nx, B*N; per-arm
    start broadcast over its segment), lam0_l (nx, B*N) warm duals,
    rho_l/drho_l (1, B*N) per-arm rows.  B*N <= 128 (single-tile limit
    of the tangent-RNEA stage), num_alphas*B*N <= 1024.  Returns
    (Xl', Ul', lam_l, rho_l', merit_l', sqp_iters_l (1, B*N) int32,
    bailed_l (1, B*N) bool, pcg_iters_total int32)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    nx, nt = Xl.shape
    nu = Ul.shape[0]
    nq = nx // 2
    f32 = Xl.dtype
    assert nt % b_arms == 0
    # multi-tile packed widths tile the per-knot stage in 128-lane slices
    # (_perknot_tiled) and chunk the line search (_LS_MAX_LANES)
    assert nt <= 128 or nt % 128 == 0, (
        f"packed lane width {nt} must be <= 128 or a multiple of 128")
    kern = functools.partial(
        _solve_kernel_pcg_packed, nq, nu, int(n_sqp_iter), int(b_arms),
        float(dt), float(qd_cost), float(r_cost), int(integrator_type),
        float(gravity), str(hessian), float(mu), int(num_alphas),
        float(rho_factor), float(rho_min), float(rho_max), float(rho_reset),
        bool(wrap), str(tracking), float(q_cost),
    )
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    sds = jax.ShapeDtypeStruct
    outs = pl.pallas_call(
        kern,
        out_shape=(
            sds((nx, nt), f32), sds((nu, nt), f32), sds((nx, nt), f32),
            sds((1, nt), f32), sds((1, nt), f32), sds((1, nt), f32),
            sds((1, nt), jnp.int32), sds((1, nt), jnp.int32),
            sds((1,), jnp.int32),
        ),
        in_specs=[smem, smem] + [vmem] * 17,
        out_specs=(vmem, vmem, vmem, vmem, vmem, vmem, vmem, vmem, smem),
        interpret=interpret,
    )(
        jnp.asarray(max_iter, jnp.int32).reshape(1),
        jnp.asarray(exit_tol, f32).reshape(1),
        Xl, Ul, goals_l, xs_l, lam0_l,
        # per-arm rows expanded to full width OUTSIDE the kernel (XLA
        # broadcast); Mosaic cannot sublane-broadcast them in-kernel
        jnp.broadcast_to(rho_l, (nx, nt)),
        jnp.broadcast_to(drho_l, (nx, nt)),
        model.Hc, model.Hs, model.Hk, model.dHc, model.dHs, model.dHk,
        model.Xc, model.Xs, model.Xk, model.I,
    )
    (Xn, Un, lam_l, rho_n, _drho_n, merit_n, itc, bailed, pcg_tot) = outs
    return (Xn, Un, lam_l, rho_n, merit_n, itc, bailed != 0, pcg_tot[0])


@functools.partial(
    jax.jit,
    static_argnames=("dt", "qd_cost", "r_cost", "integrator_type", "gravity",
                     "hessian", "mu", "num_alphas", "rho_factor", "rho_min",
                     "rho_max", "rho_reset", "wrap", "tracking", "q_cost",
                     "interpret"),
)
def sqp_iter_mega(model: RobotModel, Xl, Ul, goals_l, xs, rho, drho, merit,
                  dt: float, qd_cost: float, r_cost: float,
                  integrator_type: int, gravity: float, hessian: str,
                  mu: float, num_alphas: int, rho_factor: float,
                  rho_min: float, rho_max: float, rho_reset: float,
                  wrap: bool = False, tracking: str = "eepos",
                  q_cost: float = 1.0, interpret: bool = None):
    """One SQP iteration in lane layout: Xl (nx, N), Ul (nu, N; lane N-1
    zero), goals_l ((3, N) ee / (nx, N) joint refs), xs (nx,).  Returns
    (Xl', Ul', lam_l, rho', drho', merit', accept, bail)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    nx, n = Xl.shape
    nu = Ul.shape[0]
    nq = nx // 2
    f32 = Xl.dtype
    kern = functools.partial(
        _mega_kernel, nq, nu, float(dt), float(qd_cost), float(r_cost),
        int(integrator_type), float(gravity), str(hessian), float(mu),
        int(num_alphas), float(rho_factor), float(rho_min), float(rho_max),
        float(rho_reset), bool(wrap), str(tracking), float(q_cost),
    )
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    sds = jax.ShapeDtypeStruct
    outs = pl.pallas_call(
        kern,
        out_shape=(
            sds((nx, n), f32), sds((nu, n), f32), sds((nx, n), f32),
            sds((1,), f32), sds((1,), f32), sds((1,), f32),
            sds((1,), jnp.int32), sds((1,), jnp.int32),
        ),
        in_specs=[smem, smem, smem] + [vmem] * 14,
        out_specs=(vmem, vmem, vmem, smem, smem, smem, smem, smem),
        interpret=interpret,
    )(
        jnp.asarray(rho, f32).reshape(1), jnp.asarray(drho, f32).reshape(1),
        jnp.asarray(merit, f32).reshape(1),
        Xl, Ul, goals_l, xs[:, None],
        model.Hc, model.Hs, model.Hk, model.dHc, model.dHs, model.dHk,
        model.Xc, model.Xs, model.Xk, model.I,
    )
    Xn, Un, lam_l, rho_n, drho_n, merit_n, acc, bail = outs
    return (Xn, Un, lam_l, rho_n[0], drho_n[0], merit_n[0],
            acc[0] != 0, bail[0] != 0)


@functools.partial(
    jax.jit,
    static_argnames=("dt", "qd_cost", "r_cost", "integrator_type", "gravity",
                     "hessian", "mu", "num_alphas", "rho_factor", "rho_min",
                     "rho_max", "rho_reset", "wrap", "tracking", "q_cost",
                     "interpret", "mat_bands"),
)
def sqp_iter_mega_pcg(model: RobotModel, Xl, Ul, goals_l, xs, lam0_l,
                      rho, drho, merit, max_iter, exit_tol,
                      dt: float, qd_cost: float, r_cost: float,
                      integrator_type: int, gravity: float, hessian: str,
                      mu: float, num_alphas: int, rho_factor: float,
                      rho_min: float, rho_max: float, rho_reset: float,
                      wrap: bool = False, tracking: str = "eepos",
                      q_cost: float = 1.0, interpret: bool = None,
                      mat_bands: bool = False):
    """One SQP iteration with the warm-started stair-PCG dual solve,
    fused end-to-end in one dispatch.  Xl (nx, N), Ul (nu, N; lane N-1
    zero), goals_l ((3, N) ee / (nx, N) joint refs), xs (nx,), lam0_l
    (nx, N) warm duals.  Returns (Xl', Ul', lam_l, rho', drho', merit',
    accept, bail, pcg_iters, hit_max)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    nx, n = Xl.shape
    nu = Ul.shape[0]
    nq = nx // 2
    f32 = Xl.dtype
    kern = functools.partial(
        _mega_kernel_pcg, nq, nu, float(dt), float(qd_cost), float(r_cost),
        int(integrator_type), float(gravity), str(hessian), float(mu),
        int(num_alphas), float(rho_factor), float(rho_min), float(rho_max),
        float(rho_reset), bool(wrap), str(tracking), float(q_cost),
        bool(mat_bands),
    )
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    sds = jax.ShapeDtypeStruct
    outs = pl.pallas_call(
        kern,
        out_shape=(
            sds((nx, n), f32), sds((nu, n), f32), sds((nx, n), f32),
            sds((1,), f32), sds((1,), f32), sds((1,), f32),
            sds((1,), jnp.int32), sds((1,), jnp.int32),
            sds((1,), jnp.int32), sds((1,), jnp.int32),
        ),
        in_specs=[smem] * 5 + [vmem] * 15,
        out_specs=(vmem, vmem, vmem, smem, smem, smem, smem, smem, smem,
                   smem),
        interpret=interpret,
    )(
        jnp.asarray(max_iter, jnp.int32).reshape(1),
        jnp.asarray(exit_tol, f32).reshape(1),
        jnp.asarray(rho, f32).reshape(1), jnp.asarray(drho, f32).reshape(1),
        jnp.asarray(merit, f32).reshape(1),
        Xl, Ul, goals_l, xs[:, None], lam0_l,
        model.Hc, model.Hs, model.Hk, model.dHc, model.dHs, model.dHk,
        model.Xc, model.Xs, model.Xk, model.I,
    )
    Xn, Un, lam_l, rho_n, drho_n, merit_n, acc, bail, iters, hit = outs
    return (Xn, Un, lam_l, rho_n[0], drho_n[0], merit_n[0],
            acc[0] != 0, bail[0] != 0, iters[0], hit[0] != 0)


@functools.partial(
    jax.jit,
    static_argnames=("n_sqp_iter", "dt", "qd_cost", "r_cost",
                     "integrator_type", "gravity", "hessian", "mu",
                     "num_alphas", "rho_factor", "rho_min", "rho_max",
                     "rho_reset", "wrap", "tracking", "q_cost", "interpret",
                     "mat_bands"),
)
def sqp_solve_mega_pcg(model: RobotModel, Xl, Ul, goals_l, xs, lam0_l,
                       rho, drho, merit0, max_iter, exit_tol,
                       n_sqp_iter: int,
                       dt: float, qd_cost: float, r_cost: float,
                       integrator_type: int, gravity: float, hessian: str,
                       mu: float, num_alphas: int, rho_factor: float,
                       rho_min: float, rho_max: float, rho_reset: float,
                       wrap: bool = False, tracking: str = "eepos",
                       q_cost: float = 1.0, interpret: bool = None,
                       mat_bands: bool = False):
    """The whole SQP solve (up to n_sqp_iter iterations, rho-bail exit)
    in ONE Pallas dispatch.  Same lane layout as sqp_iter_mega_pcg;
    merit0 is the incumbent merit of (Xl, Ul) (computed by the caller,
    same provenance as the staged loop's merit_of).  Returns
    (Xl', Ul', lam_l, rho', drho', merit', sqp_iters, bailed,
    pcg_iters (n_sqp_iter,), hit_max (n_sqp_iter,), accepted (n_sqp_iter,))."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    assert n_sqp_iter <= _STATS_LANES
    nx, n = Xl.shape
    nu = Ul.shape[0]
    nq = nx // 2
    f32 = Xl.dtype
    kern = functools.partial(
        _solve_kernel_pcg, nq, nu, int(n_sqp_iter), float(dt),
        float(qd_cost), float(r_cost), int(integrator_type), float(gravity),
        str(hessian), float(mu), int(num_alphas), float(rho_factor),
        float(rho_min), float(rho_max), float(rho_reset), bool(wrap),
        str(tracking), float(q_cost), bool(mat_bands),
    )
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    sds = jax.ShapeDtypeStruct
    outs = pl.pallas_call(
        kern,
        out_shape=(
            sds((nx, n), f32), sds((nu, n), f32), sds((nx, n), f32),
            sds((1,), f32), sds((1,), f32), sds((1,), f32),
            sds((1,), jnp.int32), sds((1,), jnp.int32),
            sds((1, _STATS_LANES), jnp.int32),
            sds((1, _STATS_LANES), jnp.int32),
            sds((1, _STATS_LANES), jnp.int32),
        ),
        in_specs=[smem] * 5 + [vmem] * 15,
        out_specs=(vmem, vmem, vmem, smem, smem, smem, smem, smem,
                   vmem, vmem, vmem),
        interpret=interpret,
    )(
        jnp.asarray(max_iter, jnp.int32).reshape(1),
        jnp.asarray(exit_tol, f32).reshape(1),
        jnp.asarray(rho, f32).reshape(1), jnp.asarray(drho, f32).reshape(1),
        jnp.asarray(merit0, f32).reshape(1),
        Xl, Ul, goals_l, xs[:, None], lam0_l,
        model.Hc, model.Hs, model.Hk, model.dHc, model.dHs, model.dHk,
        model.Xc, model.Xs, model.Xk, model.I,
    )
    (Xn, Un, lam_l, rho_n, drho_n, merit_n, itc, bailed,
     iters_v, hit_v, acc_v) = outs
    k = n_sqp_iter
    return (Xn, Un, lam_l, rho_n[0], drho_n[0], merit_n[0],
            itc[0], bailed[0] != 0,
            iters_v[0, :k], hit_v[0, :k] != 0, acc_v[0, :k] != 0)
