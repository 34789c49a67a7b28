"""Exact block-tridiagonal solve via block cyclic reduction (BCR).

A TPU-native alternative to the reference's iterative GBD-PCG solver
(reference GBD-PCG submodule; SURVEY.md C20): the Schur system
S lam = gamma is block tridiagonal SPD with N blocks of size s, and
cyclic reduction eliminates all odd-indexed blocks per level --
log2(N) levels of *batched* s x s matmuls and inverses, each level
halving the active set.  On a lane-parallel machine this is an exact
solve for roughly the cost of a handful of PCG iterations, where the
closed loop otherwise spends ~100+ iterations per SQP step.

Elimination on an SPD matrix under a symmetric permutation (odd-even
ordering) is Cholesky-stable, so no pivoting is needed.

This module is the portable XLA implementation (strided slices over the
block axis) -- the numerical oracle for the fused lane-layout kernel in
ops/pallas/bcr_kernel.py, and a registered "bcr" linsys backend in its
own right.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from mpcgpu_tpu.ops.btridiag import BlockTri


def _spd_inv(mats):
    from mpcgpu_tpu.ops.smallinv import spd_inverse

    return spd_inverse(mats)


def bcr_solve(S: BlockTri, gamma: jnp.ndarray, refine: int = 1) -> jnp.ndarray:
    """Solve S lam = gamma exactly; N (block count) must be a power of 2.

    S.lower[k] multiplies lam_{k-1} (lower[0] unused/zero), S.upper[k]
    multiplies lam_{k+1} (upper[N-1] unused/zero) -- the BlockTri
    convention of ops/btridiag.py.

    refine: iterative-refinement passes (residual re-solves).  f32 cyclic
    reduction compounds rounding through log2(N) levels; one pass restores
    near-eps residuals on the ill-conditioned long-horizon systems.
    """
    lam = _bcr_once(S, gamma)
    for _ in range(refine):
        from mpcgpu_tpu.ops.btridiag import spmv

        lam = lam + _bcr_once(S, gamma - spmv(S, lam))
    return lam


def _bcr_once(S: BlockTri, gamma: jnp.ndarray) -> jnp.ndarray:
    n = gamma.shape[0]
    assert n & (n - 1) == 0, f"bcr_solve needs power-of-2 block count, got {n}"

    D, L, U, g = S.diag, S.lower, S.upper, gamma

    # forward elimination: level arrays shrink 2x per level; element i of
    # level-l arrays corresponds to original index i * 2^l.
    frozen = []  # per level: (D, L, U, g, Dinv) of the lanes eliminated
    while D.shape[0] > 1:
        Dinv = _spd_inv(D)
        # odd entries are eliminated, even entries remain
        De, Do = D[0::2], D[1::2]
        Le, Lo = L[0::2], L[1::2]
        Ue, Uo = U[0::2], U[1::2]
        ge, go = g[0::2], g[1::2]
        Dinv_o = Dinv[1::2]

        m = De.shape[0]
        # neighbor products for the kept (even) rows.
        # left neighbor of even row j (>0) is odd row j-1.
        LDm = jnp.einsum("kij,kjl->kil", Le[1:], Dinv_o[: m - 1])
        # right neighbor of even row j (< last when n even... always exists
        # here: with n = 2^l the last row is odd, so every even row has a
        # right odd neighbor).
        UDp = jnp.einsum("kij,kjl->kil", Ue, Dinv_o)

        D_new = De - jnp.einsum("kij,kjl->kil", UDp, Lo)
        D_new = D_new.at[1:].add(-jnp.einsum("kij,kjl->kil", LDm, Uo[: m - 1]))
        g_new = ge - jnp.einsum("kij,kj->ki", UDp, go)
        g_new = g_new.at[1:].add(-jnp.einsum("kij,kj->ki", LDm, go[: m - 1]))
        L_new = jnp.zeros_like(De)
        L_new = L_new.at[1:].set(-jnp.einsum("kij,kjl->kil", LDm,
                                             Lo[: m - 1]))
        U_new = -jnp.einsum("kij,kjl->kil", UDp, Uo)
        U_new = U_new.at[m - 1].set(jnp.zeros_like(U_new[0]))

        frozen.append((Do, Lo, Uo, go, Dinv_o))
        D, L, U, g = D_new, L_new, U_new, g_new

    lam = jnp.einsum("kij,kj->ki", _spd_inv(D), g)  # (1, s)

    # back substitution: reconstruct the odd rows of each level.
    for Do, Lo, Uo, go, Dinv_o in reversed(frozen):
        m = Do.shape[0]          # odd rows at this level
        # lam currently holds the even rows (m entries: every odd row has a
        # left even neighbor; right neighbor absent for the last odd row
        # only when the level size was odd -- never here).
        lam_left = lam                                   # even j   -> odd j
        lam_right = jnp.concatenate(
            [lam[1:], jnp.zeros_like(lam[:1])], axis=0)  # even j+1 -> odd j
        rhs = (go
               - jnp.einsum("kij,kj->ki", Lo, lam_left)
               - jnp.einsum("kij,kj->ki", Uo, lam_right))
        lam_odd = jnp.einsum("kij,kj->ki", Dinv_o, rhs)
        # interleave even/odd back to the level's full ordering
        full = jnp.stack([lam, lam_odd], axis=1).reshape(2 * m, -1)
        lam = full

    return lam


def _solve_linsys_bcr(cfg, schur, lam, pcg_exit_tol):
    """Linsys-backend adapter: exact solve, so the iteration count is 0
    and the max-iter exit flag is always False.

    Caveat (measured, round 2): f32 cyclic reduction is not backward
    stable on the cond~1e7 long-horizon Schur systems; its solution noise
    sits in S's near-null modes and slowly biases the closed loop.  Use
    the "bcr_pcg" hybrid for production tracking; this exact mode remains
    for linear-solve studies and as the hybrid's building block."""
    del lam, pcg_exit_tol  # exact and warm-start-free
    lam_new = bcr_solve(schur.S, schur.gamma)
    return lam_new, jnp.int32(0), jnp.bool_(False)


def _solve_linsys_bcr_pcg(cfg, schur, lam, pcg_exit_tol):
    """Warm-started CG with the BCR solve as preconditioner.

    Converges in a handful of iterations thanks to the near-exact
    preconditioner; reduces but does not eliminate the BCR null-mode
    drift (each M-apply re-injects residual-scaled noise) -- see the
    caveat on _solve_linsys_bcr and RESULTS.md.  Portable twin of
    ops/pallas/bcr_kernel._pcg_loop_bcrM."""
    from mpcgpu_tpu.ops.btridiag import spmv

    S, gamma = schur.S, schur.gamma
    tol = pcg_exit_tol

    r0 = gamma - spmv(S, lam)
    z0 = bcr_solve(S, r0, refine=0)
    eta0 = jnp.sum(r0 * z0)
    # same iteration policy as the fused twin (bcr_pcg_dz_pallas_lanes):
    # honor the configured cap; the near-exact M converges in a handful of
    # iterations regardless, so the cap is a safety net, not a tuning knob.
    max_iter = int(cfg.pcg.max_iter)

    def cond(c):
        _, _, _, eta, i = c
        return jnp.logical_and(i < max_iter, jnp.abs(eta) > tol)

    def body(c):
        lam, r, p, eta, i = c
        up = spmv(S, p)
        alpha = eta / jnp.sum(p * up)
        lam = lam + alpha * p
        r = r - alpha * up
        z = bcr_solve(S, r, refine=0)
        eta_new = jnp.sum(r * z)
        p = z + (eta_new / eta) * p
        return lam, r, p, eta_new, i + 1

    lam1, _, _, eta, iters = jax.lax.while_loop(
        cond, body, (lam, r0, z0, eta0, jnp.int32(0))
    )
    return lam1, iters, jnp.abs(eta) > tol


def register_backend():
    from mpcgpu_tpu.sqp import register_linsys_backend

    register_linsys_backend("bcr", _solve_linsys_bcr)
    register_linsys_backend("bcr_pcg", _solve_linsys_bcr_pcg)


register_backend()
