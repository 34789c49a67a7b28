"""Preconditioned conjugate gradient over the block-tridiagonal system.

TPU-native GBD-PCG (reference: GBD-PCG submodule, launched at
include/pcg/sqp.cuh:275 as one persistent cooperative kernel with a grid
sync between stages).  Here the whole solve is a ``lax.while_loop`` that
XLA keeps on-device: zero host round-trips per iteration, matching the
reference's single-kernel-launch design point.  A fused Pallas kernel that
pins S/Pinv in VMEM lives in mpcgpu_tpu.ops.pallas.pcg_kernel; this module
is the portable reference implementation and the correctness oracle.

Algorithm (MPCGPU paper alg. 2; warm-started, exit on eta = r' Pinv r):

    r = gamma - S lam;  rt = Pinv r;  p = rt;  eta = r.rt
    while i < max_iter and |eta| > tol:
        ups = S p;  alpha = eta / p.ups
        lam += alpha p;  r -= alpha ups
        rt = Pinv r;  eta' = r.rt
        p = rt + (eta'/eta) p;  eta = eta'
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from mpcgpu_tpu.ops.btridiag import BlockTri, spmv


class PCGResult(NamedTuple):
    lam: jnp.ndarray        # (N, s) solution
    iters: jnp.ndarray      # int32 iterations taken
    hit_max: jnp.ndarray    # bool: exited on max_iter (reference d_pcg_exit)


def _dot(a, b):
    return jnp.vdot(a, b)


def pcg(S: BlockTri, Pinv: BlockTri, gamma: jnp.ndarray, lam0: jnp.ndarray,
        max_iter: int, exit_tol) -> PCGResult:
    """Solve S lam = gamma, warm-started at lam0."""
    r0 = gamma - spmv(S, lam0)
    rt0 = spmv(Pinv, r0)
    eta0 = _dot(r0, rt0)

    def cond(state):
        _, _, _, eta, i = state
        return jnp.logical_and(i < max_iter, jnp.abs(eta) > exit_tol)

    def body(state):
        lam, r, p, eta, i = state
        ups = spmv(S, p)
        alpha = eta / _dot(p, ups)
        lam = lam + alpha * p
        r = r - alpha * ups
        rt = spmv(Pinv, r)
        eta_new = _dot(r, rt)
        p = rt + (eta_new / eta) * p
        return lam, r, p, eta_new, i + 1

    lam, r, p, eta, iters = jax.lax.while_loop(
        cond, body, (lam0, r0, rt0, eta0, jnp.int32(0))
    )
    return PCGResult(lam=lam, iters=iters, hit_max=jnp.abs(eta) > exit_tol)
