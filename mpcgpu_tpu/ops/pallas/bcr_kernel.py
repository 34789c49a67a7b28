"""Fused single-kernel block-cyclic-reduction solve + primal recovery.

Lane-layout twin of ops/btsolve.py: the block-tridiagonal Schur system
stays VMEM-resident and is solved EXACTLY in log2(N) elimination levels
of lane-parallel (s, s, N) products -- the TPU-native alternative to the
reference's iterative GBD-PCG kernel (SURVEY.md C20), trading ~100+ CG
iterations per SQP step for ~2 log2(N) batched block products with no
exit-tolerance tuning.

Mosaic-safe full-width formulation: every level computes candidate
updates for ALL lanes (rolls for the +-2^l neighbors, iota masks for
existence/keep predicates) and selects -- strided lane slicing and
compaction shuffles are not available in-kernel.  Eliminated lanes'
blocks freeze automatically (never selected again), which is exactly
the state back-substitution needs.

The dz (primal recovery) tail is identical to the PCG kernel's
(ops/pallas/pcg_kernel.py:_pcg_dz_kernel).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mpcgpu_tpu.ops.pallas import lanedyn as ld


def _bcr_lanes(D, L, U, g):
    """Solve the block-tridiagonal system in lane layout.

    D, L, U: (s, s, N); g: (s, N).  L[:, :, 0] and U[:, :, N-1] must be
    zero (the LaneSchur convention).  N must be a power of 2.
    Returns lam (s, N).
    """
    n = g.shape[1]
    levels = n.bit_length() - 1
    assert 1 << levels == n, f"lane BCR needs power-of-2 N, got {n}"
    dtype = g.dtype
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)

    def mask_m(pred):   # (1,1,N) matrix mask
        return pred.astype(dtype)[None]

    def mask_v(pred):   # (1,N) vector mask
        return pred.astype(dtype)

    for l in range(levels):
        h = 1 << l
        kept = lane % (2 * h) == 0
        has_l = jnp.logical_and(kept, lane >= h)
        has_r = jnp.logical_and(kept, lane + h <= n - 1)
        mLm, mRm = mask_m(has_l), mask_m(has_r)
        mLv, mRv = mask_v(has_l), mask_v(has_r)

        Dinv = ld.spd_inverse_lane(D)
        # lane i reads i-h via roll(+h), i+h via roll(n-h); masks kill wrap
        Dm = pltpu.roll(Dinv, h, axis=2)
        Lm = pltpu.roll(L, h, axis=2)
        Um = pltpu.roll(U, h, axis=2)
        gm = pltpu.roll(g, h, axis=1)
        Dp = pltpu.roll(Dinv, n - h, axis=2)
        Lp = pltpu.roll(L, n - h, axis=2)
        Up = pltpu.roll(U, n - h, axis=2)
        gp = pltpu.roll(g, n - h, axis=1)

        LDm = ld.lane_matmul(L, Dm)   # L_i Dinv_{i-h}
        UDp = ld.lane_matmul(U, Dp)   # U_i Dinv_{i+h}

        D_new = (D - mLm * ld.lane_matmul(LDm, Um)
                 - mRm * ld.lane_matmul(UDp, Lp))
        g_new = (g - mLv * ld.lane_matvec(LDm, gm)
                 - mRv * ld.lane_matvec(UDp, gp))
        L_new = -mLm * ld.lane_matmul(LDm, Lm)
        U_new = -mRm * ld.lane_matmul(UDp, Up)

        km, kv = mask_m(kept), mask_v(kept)
        D = km * D_new + (1.0 - km) * D
        L = km * L_new + (1.0 - km) * L
        U = km * U_new + (1.0 - km) * U
        g = kv * g_new + (1.0 - kv) * g

    # every lane's D/L/U/g is now frozen at its elimination level (lane 0
    # at the final level); one full-width inverse serves the root solve
    # and all back-substitution levels.
    Dinv = ld.spd_inverse_lane(D)
    lam = ld.lane_matvec(Dinv, g) * mask_v(lane == 0)

    for l in range(levels - 1, -1, -1):
        h = 1 << l
        elim = lane % (2 * h) == h
        has_r = jnp.logical_and(elim, lane + h <= n - 1)
        lam_left = pltpu.roll(lam, h, axis=1)
        lam_right = pltpu.roll(lam, n - h, axis=1) * mask_v(has_r)
        rhs = (g - ld.lane_matvec(L, lam_left)
               - ld.lane_matvec(U, lam_right))
        lam_new = ld.lane_matvec(Dinv, rhs)
        ev = mask_v(elim)
        lam = ev * lam_new + (1.0 - ev) * lam

    return lam


def _bcr_refined(D, L, U, g):
    """Exact solve + one iterative-refinement pass.

    Plain f32 cyclic reduction compounds rounding through log2(N)
    elimination levels; on the ill-conditioned long-horizon Schur systems
    (cond ~ 1/rho and up) the solution noise reaches ~1e-2 relative by
    N = 64 (results/kernel_regression_tpu.json, round 2).  One residual
    re-solve r = g - S lam, lam += BCR(r) restores near-f32-eps residuals
    for 2x the (tiny) solve cost."""
    from mpcgpu_tpu.ops.pallas.pcg_kernel import _band_spmv

    lam = _bcr_lanes(D, L, U, g)
    r = g - _band_spmv(L, D, U, lam)
    return lam + _bcr_lanes(D, L, U, r)


def _pcg_loop_bcrM(D, L, U, g, lam0, max_iter, tol):
    """Warm-started CG with the cyclic-reduction solve as preconditioner.

    Context: f32 cyclic reduction is not backward stable on these
    cond~1e7 Schur systems -- its solution noise concentrates in S's
    near-null (long-horizon) modes, which the eta = r'M^-1 r exit metric
    barely weights, and the closed loop drifts (RESULTS.md round-2
    analysis).  This hybrid reduces the drift ~5x vs plain BCR (the
    noise enters only through the M-applies, scaled by the residual) but
    measured 256-update tracking still degrades vs the stair-PCG
    flagship -- use `pcg` where long-run tracking matters and this mode
    for throughput studies / short horizons.

    Returns (lam, iters, eta)."""
    from mpcgpu_tpu.ops.pallas.pcg_kernel import _band_spmv, _dot

    r0 = g - _band_spmv(L, D, U, lam0)
    z0 = _bcr_lanes(D, L, U, r0)
    eta0 = _dot(r0, z0)

    def cond(carry):
        _, _, _, eta, i = carry
        return jnp.logical_and(i < max_iter, jnp.abs(eta) > tol)

    def body(carry):
        lam, r, p, eta, i = carry
        up = _band_spmv(L, D, U, p)
        alpha = eta / _dot(p, up)
        lam = lam + alpha * p
        r = r - alpha * up
        z = _bcr_lanes(D, L, U, r)
        eta_new = _dot(r, z)
        p = z + (eta_new / eta) * p
        return lam, r, p, eta_new, i + 1

    lam, r, p, eta, iters = jax.lax.while_loop(
        cond, body, (lam0, r0, z0, eta0, jnp.int32(0))
    )
    return lam, iters, eta


def _bcr_dz_kernel(s: int, nu: int,
                   sl_ref, sd_ref, su_ref, gamma_ref,
                   a_ref, b_ref, qg_ref, rg_ref, qinv_ref, rinv_ref,
                   lam_out_ref, dx_out_ref, du_out_ref):
    lam = _bcr_refined(sd_ref[:], sl_ref[:], su_ref[:], gamma_ref[:])
    lam_out_ref[:] = lam

    # primal recovery, identical math to pcg_kernel._pcg_dz_kernel
    n = lam.shape[1]
    k = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    m_last = (k < n - 1).astype(lam.dtype)
    lam_next = pltpu.roll(lam, n - 1, axis=1) * m_last

    A = a_ref[:]
    B = b_ref[:]
    At_lam = ld.lane_matvec_T(A, lam_next) * m_last
    rhs_x = qg_ref[:] - lam + At_lam
    dx_out_ref[:] = -ld.lane_matvec(qinv_ref[:], rhs_x)
    Bt_lam = ld.lane_matvec_T(B, lam_next)
    du_out_ref[:] = -ld.lane_matvec(rinv_ref[:], rg_ref[:] + Bt_lam)


def _bcr_pcg_dz_kernel(s: int, nu: int, max_iter_ref, tol_ref,
                       sl_ref, sd_ref, su_ref, gamma_ref, lam0_ref,
                       a_ref, b_ref, qg_ref, rg_ref, qinv_ref, rinv_ref,
                       lam_out_ref, dx_out_ref, du_out_ref,
                       iters_ref, hit_ref):
    lam, iters, eta = _pcg_loop_bcrM(
        sd_ref[:], sl_ref[:], su_ref[:], gamma_ref[:], lam0_ref[:],
        max_iter_ref[0], tol_ref[0])
    lam_out_ref[:] = lam
    iters_ref[0] = iters
    hit_ref[0] = (jnp.abs(eta) > tol_ref[0]).astype(jnp.int32)

    n = lam.shape[1]
    k = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    m_last = (k < n - 1).astype(lam.dtype)
    lam_next = pltpu.roll(lam, n - 1, axis=1) * m_last
    A = a_ref[:]
    B = b_ref[:]
    At_lam = ld.lane_matvec_T(A, lam_next) * m_last
    dx_out_ref[:] = -ld.lane_matvec(qinv_ref[:], qg_ref[:] - lam + At_lam)
    Bt_lam = ld.lane_matvec_T(B, lam_next)
    du_out_ref[:] = -ld.lane_matvec(rinv_ref[:], rg_ref[:] + Bt_lam)


@functools.partial(jax.jit, static_argnames=("interpret", "split"))
def bcr_pcg_dz_pallas_lanes(ls, lam0_l, max_iter, exit_tol,
                            interpret: bool = None, split: bool = None):
    """Warm-started BCR-preconditioned CG + primal recovery, one kernel.

    Drop-in for pcg_dz_pallas_lanes; needs no stair preconditioner (ls
    may be formed with precond=False).  Returns
    (lam (s,N), dX (N,s), dU (N-1,nu), iters, hit_max).

    N <= 256 runs the whole hybrid (CG loop + BCR preconditioner applies
    + dz) in ONE kernel; beyond that the in-kernel refinement/CG buffers
    exceed the ~16 MB scoped VMEM (19.67M at N=512, kernel regression
    round 4), so the CG loop becomes XLA glue with each z = M^-1 r apply
    dispatched as the solve-only BCR kernel -- same split strategy as
    bcr_dz_pallas_lanes.  `split` forces the choice (tests exercise the
    split path at small N against the single-kernel path).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    s, n = ls.gamma.shape
    nu = ls.Rinv.shape[0]
    f32 = ls.gamma.dtype
    if split is None:
        split = n > 256
    if split:
        from mpcgpu_tpu.ops.pallas.kkt_schur_kernel import compute_dz_lanes

        def solve(rhs):
            return bcr_solve_pallas_lanes(ls.SL, ls.SD, ls.SU, rhs,
                                          interpret=interpret)

        tol = jnp.asarray(exit_tol, f32)
        r0 = ls.gamma - _band_spmv_xla(ls.SL, ls.SD, ls.SU, lam0_l)
        z0 = solve(r0)
        eta0 = jnp.sum(r0 * z0)

        def cond(carry):
            _, _, _, eta, i = carry
            return jnp.logical_and(i < max_iter, jnp.abs(eta) > tol)

        def body(carry):
            lam, r, p, eta, i = carry
            up = _band_spmv_xla(ls.SL, ls.SD, ls.SU, p)
            alpha = eta / jnp.sum(p * up)
            lam = lam + alpha * p
            r = r - alpha * up
            z = solve(r)
            eta_new = jnp.sum(r * z)
            p = z + (eta_new / eta) * p
            return lam, r, p, eta_new, i + 1

        lam_t, _, _, eta, iters = jax.lax.while_loop(
            cond, body, (lam0_l, r0, z0, eta0, jnp.int32(0)))
        dX, dU = compute_dz_lanes(ls, lam_t)
        return lam_t, dX, dU, iters, jnp.abs(eta) > tol
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    lam_t, dx_t, du_t, iters, hit = pl.pallas_call(
        functools.partial(_bcr_pcg_dz_kernel, s, nu),
        out_shape=(
            jax.ShapeDtypeStruct((s, n), f32),
            jax.ShapeDtypeStruct((s, n), f32),
            jax.ShapeDtypeStruct((nu, n), f32),
            jax.ShapeDtypeStruct((1,), jnp.int32),
            jax.ShapeDtypeStruct((1,), jnp.int32),
        ),
        in_specs=[smem, smem] + [vmem] * 11,
        out_specs=(vmem, vmem, vmem, smem, smem),
        interpret=interpret,
    )(
        jnp.asarray(max_iter, jnp.int32).reshape(1),
        jnp.asarray(exit_tol, f32).reshape(1),
        ls.SL, ls.SD, ls.SU, ls.gamma, lam0_l,
        ls.A, ls.B, ls.q, ls.r, ls.Qinv, ls.Rinv,
    )
    return (lam_t, dx_t.T, du_t.T[:-1], iters[0],
            jnp.asarray(hit[0] != 0))


@functools.partial(jax.jit, static_argnames=("interpret",))
def bcr_dz_pallas_lanes(ls, interpret: bool = None):
    """Exact solve + primal recovery from a LaneSchur system.

    Drop-in for pcg_dz_pallas_lanes (no warm start / tolerance needed):
    returns (lam (s,N), dX (N,s), dU (N-1,nu), iters=0, hit_max=False).

    N <= 256 runs everything (solve + refinement + dz) in ONE kernel;
    beyond that the refinement buffers push the single kernel past the
    ~16 MB VMEM, so N = 512 dispatches the solve-only kernel twice
    (solve, then refine on the residual -- the SAME compiled program)
    with the banded residual and dz recovery as XLA glue.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    s, n = ls.gamma.shape
    nu = ls.Rinv.shape[0]
    f32 = ls.gamma.dtype
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    if n > 256:
        from mpcgpu_tpu.ops.pallas.kkt_schur_kernel import compute_dz_lanes

        lam0 = bcr_solve_pallas_lanes(ls.SL, ls.SD, ls.SU, ls.gamma,
                                      interpret=interpret)
        r = ls.gamma - _band_spmv_xla(ls.SL, ls.SD, ls.SU, lam0)
        lam_t = lam0 + bcr_solve_pallas_lanes(ls.SL, ls.SD, ls.SU, r,
                                              interpret=interpret)
        dX, dU = compute_dz_lanes(ls, lam_t)
        return lam_t, dX, dU, jnp.int32(0), jnp.bool_(False)
    lam_t, dx_t, du_t = pl.pallas_call(
        functools.partial(_bcr_dz_kernel, s, nu),
        out_shape=(
            jax.ShapeDtypeStruct((s, n), f32),
            jax.ShapeDtypeStruct((s, n), f32),
            jax.ShapeDtypeStruct((nu, n), f32),
        ),
        in_specs=[vmem] * 10,
        out_specs=(vmem, vmem, vmem),
        interpret=interpret,
    )(
        ls.SL, ls.SD, ls.SU, ls.gamma,
        ls.A, ls.B, ls.q, ls.r, ls.Qinv, ls.Rinv,
    )
    return lam_t, dx_t.T, du_t.T[:-1], jnp.int32(0), jnp.bool_(False)


def _band_spmv_xla(SL, SD, SU, x):
    """Banded y = S x in lane layout ((s, s, N) bands, (s, N) vector) as
    plain XLA einsums -- glue for the split long-horizon BCR path.  The
    zero edge blocks (SL[:, :, 0], SU[:, :, N-1]) absorb the roll
    wrap-around, as in pcg_kernel._band_spmv."""
    xm = jnp.roll(x, 1, axis=1)
    xp = jnp.roll(x, -1, axis=1)
    return (jnp.einsum("ijk,jk->ik", SD, x)
            + jnp.einsum("ijk,jk->ik", SL, xm)
            + jnp.einsum("ijk,jk->ik", SU, xp))


def _bcr_solve_kernel(sl_ref, sd_ref, su_ref, gamma_ref, lam_out_ref):
    """Solve-only cyclic reduction (no refinement, no dz): the minimal
    VMEM footprint form, dispatched twice for N = 512 (solve + refine)."""
    lam_out_ref[:] = _bcr_lanes(sd_ref[:], sl_ref[:], su_ref[:],
                                gamma_ref[:])


@functools.partial(jax.jit, static_argnames=("interpret",))
def bcr_solve_pallas_lanes(SL, SD, SU, gamma, interpret: bool = None):
    """One unrefined BCR solve in lane layout; returns lam (s, N)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    s, n = gamma.shape
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _bcr_solve_kernel,
        out_shape=jax.ShapeDtypeStruct((s, n), gamma.dtype),
        in_specs=[vmem] * 4,
        out_specs=vmem,
        interpret=interpret,
    )(SL, SD, SU, gamma)
