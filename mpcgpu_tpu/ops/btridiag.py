"""Block-tridiagonal matrix storage and kernels.

TPU-native equivalent of the GBD-PCG block-tridiagonal layout utilities
(`load_block_bd`/`store_block_bd`, reference GBD-PCG submodule; call-site
signatures at include/pcg/linsys_setup_no_precond.cuh:29-49).  The
reference stores 3 row-major s*s blocks per block-row [left|diag|right];
here the three bands live in separate (N, s, s) arrays so every operation
is a single batched einsum over the knot axis.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp


class BlockTri(NamedTuple):
    """Block tridiagonal matrix of N block-rows of size s.

    ``lower[k]`` is row k's block in column k-1 (``lower[0]`` is unused, 0),
    ``diag[k]``  is row k's block in column k,
    ``upper[k]`` is row k's block in column k+1 (``upper[N-1]`` unused, 0).
    """

    lower: jnp.ndarray  # (N, s, s)
    diag: jnp.ndarray   # (N, s, s)
    upper: jnp.ndarray  # (N, s, s)

    @property
    def n_blocks(self) -> int:
        return self.diag.shape[0]

    @property
    def block_size(self) -> int:
        return self.diag.shape[-1]


def spmv(T: BlockTri, x: jnp.ndarray) -> jnp.ndarray:
    """y = T @ x with x shaped (N, s): the 3-block banded matvec that the
    reference runs once per PCG iteration inside its persistent kernel."""
    x_prev = jnp.roll(x, 1, axis=0).at[0].set(0.0)
    x_next = jnp.roll(x, -1, axis=0).at[-1].set(0.0)
    return (
        jnp.einsum("kij,kj->ki", T.diag, x)
        + jnp.einsum("kij,kj->ki", T.lower, x_prev)
        + jnp.einsum("kij,kj->ki", T.upper, x_next)
    )


def from_dense(dense: jnp.ndarray, n: int, s: int) -> BlockTri:
    lower = jnp.zeros((n, s, s), dense.dtype)
    diag = jnp.zeros((n, s, s), dense.dtype)
    upper = jnp.zeros((n, s, s), dense.dtype)
    for k in range(n):
        diag = diag.at[k].set(dense[k * s:(k + 1) * s, k * s:(k + 1) * s])
        if k > 0:
            lower = lower.at[k].set(dense[k * s:(k + 1) * s, (k - 1) * s:k * s])
        if k < n - 1:
            upper = upper.at[k].set(dense[k * s:(k + 1) * s, (k + 1) * s:(k + 2) * s])
    return BlockTri(lower, diag, upper)


def to_dense(T: BlockTri) -> jnp.ndarray:
    n, s = T.n_blocks, T.block_size
    out = jnp.zeros((n * s, n * s), T.diag.dtype)
    for k in range(n):
        out = out.at[k * s:(k + 1) * s, k * s:(k + 1) * s].set(T.diag[k])
        if k > 0:
            out = out.at[k * s:(k + 1) * s, (k - 1) * s:k * s].set(T.lower[k])
        if k < n - 1:
            out = out.at[k * s:(k + 1) * s, (k + 1) * s:(k + 2) * s].set(T.upper[k])
    return out


def identity_like(T: BlockTri) -> BlockTri:
    n, s = T.n_blocks, T.block_size
    eye = jnp.broadcast_to(jnp.eye(s, dtype=T.diag.dtype), (n, s, s))
    z = jnp.zeros((n, s, s), T.diag.dtype)
    return BlockTri(z, eye, z)
