"""Schur-complement condensation and the symmetric-stair preconditioner.

TPU-native equivalent of the reference cooperative formation kernel
(reference include/pcg/linsys_setup.cuh:141-562 ``form_S_gamma_and_jacobi_
Pinv_blockrow`` and :11-137 ``complete_SS_Pinv_blockrow``; ablation variant
include/pcg/linsys_setup_no_precond.cuh).  The reference negates S, gamma
and Pinv in storage and un-negates downstream; here everything is in
"true" space: S is the positive-definite Schur complement

    S = C G^{-1} C',   gamma = C G^{-1} g - c

of the KKT system min 0.5 z'Gz + g'z  s.t.  Cz + c = 0, with the
Levenberg regularization rho*I folded into G.  Blocks (row k, s = nx):

    theta_0 = Qr_0^{-1}
    theta_k = A_{k-1} Qr_{k-1}^{-1} A_{k-1}' + B_{k-1} Rr_{k-1}^{-1} B_{k-1}'
              + Qr_k^{-1}
    Phi_k   = -A_{k-1} Qr_{k-1}^{-1}                    (S[k, k-1])
    gamma_0 = Qr_0^{-1} q_0        (the reference omits the -c_0 term here,
                                    linsys_setup.cuh:273-276; the MPC loop
                                    re-injects x_0 = xs so c_0 = 0 at entry)
    gamma_k = Qr_k^{-1} q_k - A_{k-1} Qr_{k-1}^{-1} q_{k-1}
              - B_{k-1} Rr_{k-1}^{-1} r_{k-1} - c_k

Symmetric-stair preconditioner (linsys_setup.cuh:97-136):

    Pinv.diag[k]  = theta_k^{-1}
    Pinv.lower[k] = -theta_k^{-1} Phi_k      theta_{k-1}^{-1}
    Pinv.upper[k] = -theta_k^{-1} Phi_{k+1}' theta_{k+1}^{-1}

The reference's in-shared-memory Gauss-Jordan inversions
(include/utils/matrix.cuh:122-238) become batched Cholesky solves.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from mpcgpu_tpu.ops.btridiag import BlockTri
from mpcgpu_tpu.ops.kkt import KKTData


def _chol_inverse(mats: jnp.ndarray) -> jnp.ndarray:
    """Batched SPD inverse: block-recursive closed form (see ops/smallinv).

    Replaces the reference's in-smem Gauss-Jordan (utils/matrix.cuh:122-238);
    XLA's Cholesky lowers to deep loops at these sizes, while the block
    recursion is a handful of batched matmuls.
    """
    from mpcgpu_tpu.ops.smallinv import spd_inverse

    return spd_inverse(mats)


class SchurData(NamedTuple):
    S: BlockTri          # PD Schur complement, block tridiagonal
    Pinv: BlockTri       # symmetric-stair preconditioner
    gamma: jnp.ndarray   # (N, nx) right-hand side
    Qinv: jnp.ndarray    # (N, nx, nx) regularized cost-block inverses,
    Rinv: jnp.ndarray    # (N-1, nu, nu) cached for primal recovery (dz)


def form_schur(kkt: KKTData, rho, preconditioned: bool = True) -> SchurData:
    n, nx = kkt.Q.shape[0], kkt.Q.shape[-1]
    eye_x = jnp.eye(nx, dtype=kkt.Q.dtype)
    eye_u = jnp.eye(kkt.R.shape[-1], dtype=kkt.Q.dtype)

    Qinv = _chol_inverse(kkt.Q + rho * eye_x)
    Rinv = _chol_inverse(kkt.R + rho * eye_u)

    AQi = jnp.einsum("kij,kjl->kil", kkt.A, Qinv[:-1])       # A_{k-1} Qr_{k-1}^{-1}
    BRi = jnp.einsum("kij,kjl->kil", kkt.B, Rinv)            # B_{k-1} Rr_{k-1}^{-1}

    theta_rest = (
        jnp.einsum("kij,klj->kil", AQi, kkt.A)
        + jnp.einsum("kij,klj->kil", BRi, kkt.B)
        + Qinv[1:]
    )
    theta = jnp.concatenate([Qinv[:1], theta_rest], axis=0)

    phi = -AQi                                               # rows 1..N-1
    zero_blk = jnp.zeros((1, nx, nx), kkt.Q.dtype)
    lower = jnp.concatenate([zero_blk, phi], axis=0)
    upper = jnp.concatenate([jnp.swapaxes(phi, -1, -2), zero_blk], axis=0)
    S = BlockTri(lower=lower, diag=theta, upper=upper)

    Qiq = jnp.einsum("kij,kj->ki", Qinv, kkt.q)
    gamma_rest = (
        Qiq[1:]
        - jnp.einsum("kij,kj->ki", AQi, kkt.q[:-1])
        - jnp.einsum("kij,kj->ki", BRi, kkt.r)
        - kkt.c[1:]
    )
    gamma = jnp.concatenate([Qiq[:1], gamma_rest], axis=0)

    if preconditioned:
        theta_inv = _chol_inverse(theta)
        # lower[k] = -Ti_k Phi_k Ti_{k-1};  upper[k] = -Ti_k Phi_{k+1}' Ti_{k+1}
        pl = -jnp.einsum(
            "kij,kjl,klm->kim", theta_inv[1:], phi, theta_inv[:-1]
        )
        pu = -jnp.einsum(
            "kij,kjl,klm->kim",
            theta_inv[:-1],
            jnp.swapaxes(phi, -1, -2),
            theta_inv[1:],
        )
        Pinv = BlockTri(
            lower=jnp.concatenate([zero_blk, pl], axis=0),
            diag=theta_inv,
            upper=jnp.concatenate([pu, zero_blk], axis=0),
        )
    else:
        # ENABLE_PRECONDITIONING=0 ablation (linsys_setup_no_precond.cuh):
        # identity preconditioner.
        eye_n = jnp.broadcast_to(eye_x, (n, nx, nx))
        zeros = jnp.zeros((n, nx, nx), kkt.Q.dtype)
        Pinv = BlockTri(lower=zeros, diag=eye_n, upper=zeros)

    return SchurData(S=S, Pinv=Pinv, gamma=gamma, Qinv=Qinv, Rinv=Rinv)
