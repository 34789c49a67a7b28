"""Shallow batched inverses for small SPD matrices.

The reference inverts its 14x14 / 7x7 blocks with an in-shared-memory
Gauss-Jordan sweep (reference include/utils/matrix.cuh:122-238).  On TPU,
XLA's batched Cholesky + triangular solves lower to deep sequential loops
that dominate latency at these sizes, so this module implements the
inverse by recursive 2x2 block partitioning

    inv([[P, Q], [Q', S]]) via  Pi = inv(P),  T = S - Q' Pi Q:
      [[Pi + Pi Q inv(T) Q' Pi,  -Pi Q inv(T)],
       [      -inv(T) Q' Pi,          inv(T)]]

with closed-form 1x1..3x3 base cases -- a graph of ~log(n) levels of
batched matmuls, each mapping cleanly onto VPU/MXU.  Inputs are assumed
symmetric positive definite (everything inverted here carries the
reference's rho regularization or is a mass-matrix block).
"""
from __future__ import annotations

import jax.numpy as jnp


def _inv1(A):
    return 1.0 / A


def _inv2(A):
    a = A[..., 0, 0]; b = A[..., 0, 1]
    c = A[..., 1, 0]; d = A[..., 1, 1]
    det = a * d - b * c
    inv = jnp.stack(
        [jnp.stack([d, -b], -1), jnp.stack([-c, a], -1)], -2
    )
    return inv / det[..., None, None]


def _inv3(A):
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    g, h, i = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    co_a = e * i - f * h
    co_b = -(d * i - f * g)
    co_c = d * h - e * g
    det = a * co_a + b * co_b + c * co_c
    adj = jnp.stack(
        [
            jnp.stack([co_a, -(b * i - c * h), b * f - c * e], -1),
            jnp.stack([co_b, a * i - c * g, -(a * f - c * d)], -1),
            jnp.stack([co_c, -(a * h - b * g), a * e - b * d], -1),
        ],
        -2,
    )
    return adj / det[..., None, None]


def spd_inverse(A: jnp.ndarray) -> jnp.ndarray:
    """Inverse of batched SPD matrices (..., n, n); n static and small."""
    n = A.shape[-1]
    if n == 1:
        return _inv1(A)
    if n == 2:
        return _inv2(A)
    if n == 3:
        return _inv3(A)
    m = n // 2
    P = A[..., :m, :m]
    Q = A[..., :m, m:]
    S = A[..., m:, m:]
    Pi = spd_inverse(P)
    PiQ = Pi @ Q
    T = S - jnp.swapaxes(Q, -1, -2) @ PiQ
    Ti = spd_inverse(T)
    TR = -PiQ @ Ti
    TL = Pi - TR @ jnp.swapaxes(PiQ, -1, -2)
    return jnp.concatenate(
        [
            jnp.concatenate([TL, TR], axis=-1),
            jnp.concatenate([jnp.swapaxes(TR, -1, -2), Ti], axis=-1),
        ],
        axis=-2,
    )


def spd_solve(A: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """x = A^{-1} b for batched SPD A (..., n, n), b (..., n)."""
    return jnp.einsum("...ij,...j->...i", spd_inverse(A), b)
