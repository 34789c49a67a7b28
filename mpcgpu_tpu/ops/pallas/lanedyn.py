"""Lane-batched rigid-body dynamics for use inside Pallas kernels.

Every quantity carries the batch in the minor-most (lane) dimension:
vectors are (d, B), matrices (d, d, B) -- so a 6x6 matvec is 6 fused
multiply-adds of (6, B) tiles and the whole articulated-body algorithm
becomes a few hundred straight-line VPU instructions for the entire
batch, instead of thousands of individually-scheduled XLA ops.  This is
the TPU equivalent of the reference's block-level GLASS/GRiD device
routines (one CUDA block per knot; here one lane per batch element).

The functions are pure jnp on values, so they trace both inside
``pallas_call`` kernels (the intended use) and in plain XLA (for tests).
Model tables are the same affine sin/cos decompositions used by
models/dynamics.py.
"""
from __future__ import annotations

import jax.numpy as jnp

_EZ = 2


def matvec6(M, v):
    """(6,6,B) @ (6,B) -> (6,B): 6 lane-wide FMAs."""
    acc = M[:, 0, :] * v[0:1, :]
    for k in range(1, 6):
        acc = acc + M[:, k, :] * v[k:k + 1, :]
    return acc


def matvec6_T(M, v):
    """(6,6,B)' @ (6,B) -> (6,B)."""
    acc = M[0, :, :] * v[0:1, :]
    for k in range(1, 6):
        acc = acc + M[k, :, :] * v[k:k + 1, :]
    return acc


def congruence_T(X, A):
    """X' A X for (6,6,B) operands (the articulated-inertia propagation)."""
    # T1[i] = sum_k X[k,i] * A[k]  -> T1 = X' A
    T1 = [None] * 6
    for i in range(6):
        acc = X[0, i, :][None, :] * A[0]
        for k in range(1, 6):
            acc = acc + X[k, i, :][None, :] * A[k]
        T1[i] = acc                      # (6,B): row i of X'A
    # C[i,j] = sum_k T1[i][k] * X[k,j] -> C = (X'A) X
    rows = []
    for i in range(6):
        acc = T1[i][0:1, :] * X[0]
        for k in range(1, 6):
            acc = acc + T1[i][k:k + 1, :] * X[k]
        rows.append(acc)                 # (6,B): row i of C
    return jnp.stack(rows, axis=0)       # (6,6,B)


def joint_X(tables, j, sin_q, cos_q):
    """X_j(q) as (6,6,B) from the affine tables; sin_q/cos_q are (B,)."""
    Xc, Xs, Xk = tables
    return (
        Xc[j][:, :, None]
        + sin_q[None, None, :] * Xs[j][:, :, None]
        + cos_q[None, None, :] * Xk[j][:, :, None]
    )


def crm_z(v, w):
    """crm(v) (S w) for S = e_z: spatial cross with (0,0,w,0,0,0)."""
    z = jnp.zeros_like(w)
    return jnp.stack(
        [v[1] * w, -v[0] * w, z, v[4] * w, -v[3] * w, z], axis=0
    )


def crf(v, f):
    """Force cross product (v x*) f, lane-batched."""
    w0, w1, w2, l0, l1, l2 = v[0], v[1], v[2], v[3], v[4], v[5]
    f0, f1, f2, f3, f4, f5 = f[0], f[1], f[2], f[3], f[4], f[5]
    return jnp.stack(
        [
            w1 * f2 - w2 * f1 + l1 * f5 - l2 * f4,
            w2 * f0 - w0 * f2 + l2 * f3 - l0 * f5,
            w0 * f1 - w1 * f0 + l0 * f4 - l1 * f3,
            w1 * f5 - w2 * f4,
            w2 * f3 - w0 * f5,
            w0 * f4 - w1 * f3,
        ],
        axis=0,
    )


def aba_qdd(x_tables, I_tables, q, qd, u, gravity: float = 0.0):
    """Articulated-body forward dynamics, lane-batched.

    q, qd, u: (nj, B).  Returns qdd (nj, B).  Mirrors
    models.dynamics.forward_dynamics joint for joint.
    """
    nj = q.shape[0]
    B = q.shape[-1]
    dtype = q.dtype
    sin_q = jnp.sin(q)
    cos_q = jnp.cos(q)
    X = [joint_X(x_tables, j, sin_q[j], cos_q[j]) for j in range(nj)]
    I = [I_tables[j][:, :, None] * jnp.ones((1, 1, B), dtype) for j in range(nj)]

    # pass 1
    v_prev = jnp.zeros((6, B), dtype)
    v, cvel, pA = [], [], []
    for j in range(nj):
        vj = matvec6(X[j], v_prev)
        vj = vj.at[_EZ].add(qd[j])
        v.append(vj)
        cvel.append(crm_z(vj, qd[j]))
        pA.append(crf(vj, matvec6(I[j], vj)))
        v_prev = vj

    # pass 2
    IA = list(I)
    Uc, dc, uc = [None] * nj, [None] * nj, [None] * nj
    for j in range(nj - 1, -1, -1):
        Uj = IA[j][:, _EZ, :]            # (6,B)
        dj = Uj[_EZ]                     # (B,)
        uj = u[j] - pA[j][_EZ]
        Uc[j], dc[j], uc[j] = Uj, dj, uj
        if j > 0:
            inv_d = 1.0 / dj
            Ia = IA[j] - Uj[:, None, :] * (Uj * inv_d[None, :])[None, :, :]
            pa = pA[j] + matvec6(Ia, cvel[j]) + Uj * (uj * inv_d)[None, :]
            IA[j - 1] = IA[j - 1] + congruence_T(X[j], Ia)
            pA[j - 1] = pA[j - 1] + matvec6_T(X[j], pa)

    # pass 3
    a_prev = jnp.zeros((6, B), dtype)
    if gravity:
        a_prev = a_prev.at[5].set(jnp.full((B,), gravity, dtype))
    qdd = []
    for j in range(nj):
        aj = matvec6(X[j], a_prev) + cvel[j]
        qdd_j = (uc[j] - jnp.sum(Uc[j] * aj, axis=0)) / dc[j]
        qdd.append(qdd_j)
        a_prev = aj.at[_EZ].add(qdd_j)
    return jnp.stack(qdd, axis=0)


def hom4(tables, j, sin_q, cos_q):
    Hc, Hs, Hk = tables
    return (
        Hc[j][:, :, None]
        + sin_q[None, None, :] * Hs[j][:, :, None]
        + cos_q[None, None, :] * Hk[j][:, :, None]
    )


def matmul4(A, B):
    """(4,4,B) @ (4,4,B): 16 lane-wide FMAs per output row block."""
    rows = []
    for i in range(4):
        acc = A[i, 0, :][None, :] * B[0]
        for k in range(1, 4):
            acc = acc + A[i, k, :][None, :] * B[k]
        rows.append(acc)
    return jnp.stack(rows, axis=0)


def fk_ee_xyz(h_tables, q):
    """End-effector xyz, lane-batched: (nj, B) -> (3, B)."""
    nj = q.shape[0]
    sin_q = jnp.sin(q)
    cos_q = jnp.cos(q)
    T = hom4(h_tables, 0, sin_q[0], cos_q[0])
    for j in range(1, nj):
        T = matmul4(T, hom4(h_tables, j, sin_q[j], cos_q[j]))
    return T[:3, 3, :]
