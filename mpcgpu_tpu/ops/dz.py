"""Primal step recovery from the dual solution.

TPU-native equivalent of the reference dz kernel
(reference include/common/dz.cuh:5-121, ``compute_dz_kernel``), using the
regularized cost-block inverses cached by the Schur formation
(linsys_setup.cuh:372-380).

Sign convention: ``lam`` solves  S lam = gamma  with gamma = C G^{-1} g - c
(the reference's stored dual; see ops/schur.py).  The true KKT multiplier
is -lam, so the descent step applied to the trajectory is

    dx_k = -Qr_k^{-1} (q_k - lam_k + A_k' lam_{k+1})   (no A term at k=N-1)
    du_k = -Rr_k^{-1} (r_k + B_k' lam_{k+1})

which is exactly the step the reference applies via its negated dz and
negative alpha (dz.cuh:5-121 with C = [-A -B]; alpha = -1/2^i at
pcg/sqp.cuh:386).
"""
from __future__ import annotations

import jax.numpy as jnp

from mpcgpu_tpu.ops.kkt import KKTData
from mpcgpu_tpu.ops.schur import SchurData


def compute_dz(kkt: KKTData, schur: SchurData, lam: jnp.ndarray):
    """Returns (dX, dU) with shapes (N, nx) and (N-1, nu)."""
    At_lam = jnp.einsum("kji,kj->ki", kkt.A, lam[1:])     # A_k' lam_{k+1}
    rhs_x = kkt.q - lam
    rhs_x = rhs_x.at[:-1].add(At_lam)
    dX = -jnp.einsum("kij,kj->ki", schur.Qinv, rhs_x)

    Bt_lam = jnp.einsum("kji,kj->ki", kkt.B, lam[1:])     # B_k' lam_{k+1}
    dU = -jnp.einsum("kij,kj->ki", schur.Rinv, kkt.r + Bt_lam)
    return dX, dU
