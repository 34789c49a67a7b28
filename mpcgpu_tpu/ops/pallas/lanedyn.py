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

import jax
import jax.numpy as jnp

_EZ = 2


def _ez_col(dtype):
    """(6,1) unit-z mask; Mosaic has no scatter, so 'v.at[2].add(w)'
    becomes 'v + _ez_col * w[None]'.  Built from iota rather than a
    literal so Pallas does not see a captured array constant."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (6, 1), 0)
    return (rows == _EZ).astype(dtype)


def row_sum(x):
    """Sum over the leading (small) axis as unrolled adds -> (1, B).

    Mosaic's vector.multi_reduction rejects some offset sublane layouts;
    explicit row adds always lower.
    """
    acc = x[0:1, :]
    for i in range(1, x.shape[0]):
        acc = acc + x[i:i + 1, :]
    return acc


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
        vj = matvec6(X[j], v_prev) + _ez_col(dtype) * qd[j][None, :]
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
    a_prev = jnp.full((6, B), 0.0, dtype)
    if gravity:
        rows = jax.lax.broadcasted_iota(jnp.int32, (6, 1), 0)
        a_prev = a_prev + (rows == 5).astype(dtype) * gravity
    qdd = []
    ez = _ez_col(dtype)
    for j in range(nj):
        aj = matvec6(X[j], a_prev) + cvel[j]
        qdd_j = (uc[j][None, :] - row_sum(Uc[j] * aj)) / dc[j][None, :]
        qdd.append(qdd_j)
        a_prev = aj + ez * qdd_j
    return jnp.concatenate(qdd, axis=0)


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


# ---------------------------------------------------------------------------
# generic lane-batched small linear algebra
# ---------------------------------------------------------------------------

def lane_matmul(A, B):
    """(m,k,B) @ (k,n,B) -> (m,n,B) as m*k lane-wide FMAs."""
    m, k, _ = A.shape
    rows = []
    for i in range(m):
        acc = A[i, 0, :][None, :] * B[0]
        for t in range(1, k):
            acc = acc + A[i, t, :][None, :] * B[t]
        rows.append(acc)
    return jnp.stack(rows, axis=0)


def lane_matmul_T1(A, B):
    """A' @ B for (k,m,B),(k,n,B) -> (m,n,B)."""
    k, m, _ = A.shape
    rows = []
    for i in range(m):
        acc = A[0, i, :][None, :] * B[0]
        for t in range(1, k):
            acc = acc + A[t, i, :][None, :] * B[t]
        rows.append(acc)
    return jnp.stack(rows, axis=0)


def lane_matmul_T2(A, B):
    """A @ B' for (m,k,B),(n,k,B) -> (m,n,B)."""
    m, k, _ = A.shape
    n = B.shape[0]
    rows = []
    for i in range(m):
        cols = []
        acc = None
        for t in range(k):
            term = A[i, t, :][None, :] * B[:, t, :]
            acc = term if acc is None else acc + term
        rows.append(acc)
    return jnp.stack(rows, axis=0)


def lane_matvec(A, v):
    """(m,k,B) @ (k,B) -> (m,B)."""
    k = v.shape[0]
    acc = A[:, 0, :] * v[0:1, :]
    for t in range(1, k):
        acc = acc + A[:, t, :] * v[t:t + 1, :]
    return acc


def lane_matvec_T(A, v):
    """(k,m,B)' @ (k,B) -> (m,B)."""
    k = v.shape[0]
    acc = A[0, :, :] * v[0:1, :]
    for t in range(1, k):
        acc = acc + A[t, :, :] * v[t:t + 1, :]
    return acc


def lane_transpose(A):
    """(m,n,B) -> (n,m,B) (free: leading-dim shuffle)."""
    return jnp.swapaxes(A, 0, 1)


def lane_eye(n, B, dtype):
    return jnp.eye(n, dtype=dtype)[:, :, None] * jnp.ones((1, 1, B), dtype)


def _inv1_lane(A):
    return 1.0 / A


def _inv2_lane(A):
    a, b = A[0, 0], A[0, 1]
    c, d = A[1, 0], A[1, 1]
    det = a * d - b * c
    return jnp.stack(
        [jnp.stack([d, -b], 0), jnp.stack([-c, a], 0)], 0
    ) / det[None, None, :]


def _inv3_lane(A):
    a, b, c = A[0, 0], A[0, 1], A[0, 2]
    d, e, f = A[1, 0], A[1, 1], A[1, 2]
    g, h, i = A[2, 0], A[2, 1], A[2, 2]
    co_a = e * i - f * h
    co_b = -(d * i - f * g)
    co_c = d * h - e * g
    det = a * co_a + b * co_b + c * co_c
    adj = jnp.stack(
        [
            jnp.stack([co_a, -(b * i - c * h), b * f - c * e], 0),
            jnp.stack([co_b, a * i - c * g, -(a * f - c * d)], 0),
            jnp.stack([co_c, -(a * h - b * g), a * e - b * d], 0),
        ],
        0,
    )
    return adj / det[None, None, :]


def spd_inverse_lane(A):
    """Block-recursive SPD inverse for (n,n,B) (see ops/smallinv.py)."""
    n = A.shape[0]
    if n == 1:
        return _inv1_lane(A)
    if n == 2:
        return _inv2_lane(A)
    if n == 3:
        return _inv3_lane(A)
    m = n // 2
    P, Q, S = A[:m, :m], A[:m, m:], A[m:, m:]
    Pi = spd_inverse_lane(P)
    PiQ = lane_matmul(Pi, Q)
    T = S - lane_matmul_T1(Q, PiQ)
    Ti = spd_inverse_lane(T)
    TR = -lane_matmul(PiQ, Ti)
    TL = Pi - lane_matmul_T2(TR, PiQ)
    top = jnp.concatenate([TL, TR], axis=1)
    bot = jnp.concatenate([lane_transpose(TR), Ti], axis=1)
    return jnp.concatenate([top, bot], axis=0)


# ---------------------------------------------------------------------------
# lane-batched RNEA / CRBA / FK jacobian (for the KKT kernel)
# ---------------------------------------------------------------------------

def crm(v, m):
    """Full spatial motion cross product, lane-batched (6,B)x(6,B)."""
    w0, w1, w2, l0, l1, l2 = v
    m0, m1, m2, m3, m4, m5 = m
    return jnp.stack(
        [
            w1 * m2 - w2 * m1,
            w2 * m0 - w0 * m2,
            w0 * m1 - w1 * m0,
            w1 * m5 - w2 * m4 + l1 * m2 - l2 * m1,
            w2 * m3 - w0 * m5 + l2 * m0 - l0 * m2,
            w0 * m4 - w1 * m3 + l0 * m1 - l1 * m0,
        ],
        axis=0,
    )


def rnea_lane(x_tables, I_tables, q, qd, qdd, gravity: float = 0.0):
    """Lane-batched RNEA: (nj,B) inputs -> tau (nj,B).

    Mirrors models.dynamics.rnea; written with jnp.where-free straight-line
    ops so it also serves as the base for in-kernel jvp tangents.
    """
    nj, B = q.shape
    dtype = q.dtype
    sin_q, cos_q = jnp.sin(q), jnp.cos(q)
    X = [joint_X(x_tables, j, sin_q[j], cos_q[j]) for j in range(nj)]
    I = [I_tables[j][:, :, None].astype(dtype) for j in range(nj)]

    v_prev = jnp.zeros((6, B), dtype)
    a_prev = jnp.zeros((6, B), dtype)
    if gravity:
        rows = jax.lax.broadcasted_iota(jnp.int32, (6, 1), 0)
        a_prev = a_prev + (rows == 5).astype(dtype) * gravity
    fs = []
    ez = _ez_col(dtype)
    for j in range(nj):
        vj = matvec6(X[j], v_prev) + ez * qd[j][None, :]
        aj = matvec6(X[j], a_prev) + ez * qdd[j][None, :]
        aj = aj + crm_z(vj, qd[j])
        fj = lane_matvec(I[j], aj) + crf(vj, lane_matvec(I[j], vj))
        fs.append(fj)
        v_prev, a_prev = vj, aj
    tau = [None] * nj
    f = fs[nj - 1]
    for j in range(nj - 1, -1, -1):
        tau[j] = f[_EZ]
        if j > 0:
            f = fs[j - 1] + matvec6_T(X[j], f)
    return jnp.stack(tau, axis=0)


def crba_M_lane(x_tables, I_tables, q):
    """Lane-batched CRBA mass matrix: (nj,B) -> (nj,nj,B)."""
    nj, B = q.shape
    dtype = q.dtype
    sin_q, cos_q = jnp.sin(q), jnp.cos(q)
    X = [joint_X(x_tables, j, sin_q[j], cos_q[j]) for j in range(nj)]
    Ic = [I_tables[j][:, :, None].astype(dtype) * jnp.ones((1, 1, B), dtype)
          for j in range(nj)]
    for j in range(nj - 1, 0, -1):
        Ic[j - 1] = Ic[j - 1] + congruence_T(X[j], Ic[j])
    # F[i] = Ic_i S propagated down; masked backward column sweep
    F = jnp.stack([Ic[i][:, _EZ, :] for i in range(nj)], axis=0)  # (nj,6,B)
    diag = F[:, _EZ, :]                                            # (nj,B)
    cols = [jnp.zeros((nj, B), dtype)] * nj
    for j in range(nj - 1, 0, -1):
        Fp = jnp.stack([matvec6_T(X[j], F[i]) for i in range(nj)], axis=0)
        live = (jnp.arange(nj) >= j)[:, None, None]
        F = jnp.where(live, Fp, F)
        cols[j - 1] = jnp.where(live[:, 0, :], F[:, _EZ, :], 0.0)
    L = jnp.stack(cols, axis=1)  # (nj, nj, B) strictly lower
    M = L + lane_transpose(L)
    idx = jnp.arange(nj)
    return M + (idx[:, None] == idx[None, :])[:, :, None] * diag[:, None, :]


def fk_ee_and_jac(h_tables, dh_tables, q):
    """EE xyz (3,B) and position Jacobian (3,nj,B), lane-batched.

    dT/dq_j = (H_0..H_{j-1}) dH_j (H_{j+1}..H_{nj-1}) via prefix/suffix
    products (same math as models.dynamics.ee_pos_and_jac).
    """
    nj, B = q.shape
    sin_q, cos_q = jnp.sin(q), jnp.cos(q)
    H = [hom4(h_tables, j, sin_q[j], cos_q[j]) for j in range(nj)]
    dH = [hom4(dh_tables, j, sin_q[j], cos_q[j]) for j in range(nj)]
    prefix = [None] * (nj + 1)
    prefix[0] = lane_eye(4, B, q.dtype)
    for j in range(nj):
        prefix[j + 1] = matmul4(prefix[j], H[j])
    suffix = [None] * (nj + 1)
    suffix[nj] = lane_eye(4, B, q.dtype)
    for j in range(nj - 1, -1, -1):
        suffix[j] = matmul4(H[j], suffix[j + 1])
    cols = [matmul4(matmul4(prefix[j], dH[j]), suffix[j + 1])[:3, 3, :]
            for j in range(nj)]
    return prefix[nj][:3, 3, :], jnp.stack(cols, axis=1)  # (3,B), (3,nj,B)
