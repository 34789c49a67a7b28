"""Lane-batched rigid-body dynamics for use inside Pallas kernels.

Every quantity carries the batch in the minor-most (lane) dimension:
vectors are (d, B), matrices (d, d, B) -- so a 6x6 matvec is 6 fused
multiply-adds of (6, B) tiles and the whole articulated-body algorithm
becomes a few hundred straight-line VPU instructions for the entire
batch, instead of thousands of individually-scheduled XLA ops.  This is
the TPU equivalent of the reference's block-level GLASS/GRiD device
routines (one CUDA block per knot; here one lane per batch element).

Mosaic discipline (hard-won on real hardware):
  * no value is ever rank-1: row accesses are 2-D slices ``x[i:i+1, :]``
    (1-D extracts with sublane offsets crash the layout pass);
  * no scatter/at-updates; unit-vector adds use iota-built masks;
  * reductions over small leading axes are unrolled adds (row_sum);
  * masks come from ``broadcasted_iota``, never from captured constants
    or 1-D ``arange`` broadcasts.

The functions are pure jnp on values, so they trace both inside
``pallas_call`` kernels (the intended use) and in plain XLA (for tests).
Model tables are the same affine sin/cos decompositions used by
models/dynamics.py.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_EZ = 2


def _r(x, i):
    """Row i of (d, B) as (1, B) -- never rank-1."""
    return x[i:i + 1, :]


def row_sum(x):
    """Sum over the leading (small) axis as unrolled adds -> (1, B)."""
    acc = x[0:1, :]
    for i in range(1, x.shape[0]):
        acc = acc + x[i:i + 1, :]
    return acc


def _ez_col(dtype):
    """(6,1) unit-z mask built from iota (no captured constants)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (6, 1), 0)
    return (rows == _EZ).astype(dtype)


def materialize(x, B):
    """Force a real (.., B)-wide value from a (.., 1) broadcastable one.

    Adds computed (iota-derived) zeros: Mosaic keeps lazily-broadcast
    constants in a replicated layout, and extracting a middle index from
    such a value crashes the layout pass at multi-tile lane widths.
    """
    z = (jax.lax.broadcasted_iota(jnp.int32, (1, B), 1) < 0).astype(x.dtype)
    return x + z


def _grav_col(gravity, dtype):
    rows = jax.lax.broadcasted_iota(jnp.int32, (6, 1), 0)
    return (rows == 5).astype(dtype) * gravity


def matvec6(M, v):
    """(6,6,B) @ (6,B) -> (6,B): 6 lane-wide FMAs."""
    acc = M[:, 0, :] * _r(v, 0)
    for k in range(1, 6):
        acc = acc + M[:, k, :] * _r(v, k)
    return acc


def matvec6_T(M, v):
    """(6,6,B)' @ (6,B) -> (6,B)."""
    acc = M[0, :, :] * _r(v, 0)
    for k in range(1, 6):
        acc = acc + M[k, :, :] * _r(v, k)
    return acc


def congruence_T(X, A):
    """X' A X for (6,6,B) operands (the articulated-inertia propagation)."""
    T1 = [None] * 6
    for i in range(6):
        acc = X[0, i:i + 1, :] * A[0]
        for k in range(1, 6):
            acc = acc + X[k, i:i + 1, :] * A[k]
        T1[i] = acc                      # (6,B): row i of X'A
    rows = []
    for i in range(6):
        acc = T1[i][0:1, :] * X[0]
        for k in range(1, 6):
            acc = acc + T1[i][k:k + 1, :] * X[k]
        rows.append(acc)                 # (6,B): row i of (X'A)X
    return jnp.stack(rows, axis=0)       # (6,6,B)


def joint_X(tables, j, sin_q, cos_q):
    """X_j(q) as (6,6,B); sin_q/cos_q are (1,B) rows."""
    Xc, Xs, Xk = tables
    return (
        Xc[j][:, :, None]
        + sin_q[None, :, :] * Xs[j][:, :, None]
        + cos_q[None, :, :] * Xk[j][:, :, None]
    )


def crm_z(v, w):
    """crm(v) (S w) for S = e_z; v (6,B), w (1,B) -> (6,B)."""
    z = jnp.zeros_like(w)
    return jnp.concatenate(
        [_r(v, 1) * w, -_r(v, 0) * w, z, _r(v, 4) * w, -_r(v, 3) * w, z],
        axis=0,
    )


def crm(v, m):
    """Full spatial motion cross product, (6,B)x(6,B) -> (6,B)."""
    w0, w1, w2 = _r(v, 0), _r(v, 1), _r(v, 2)
    l0, l1, l2 = _r(v, 3), _r(v, 4), _r(v, 5)
    m0, m1, m2 = _r(m, 0), _r(m, 1), _r(m, 2)
    m3, m4, m5 = _r(m, 3), _r(m, 4), _r(m, 5)
    return jnp.concatenate(
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


def crf(v, f):
    """Force cross product (v x*) f, lane-batched (6,B)x(6,B)."""
    w0, w1, w2 = _r(v, 0), _r(v, 1), _r(v, 2)
    l0, l1, l2 = _r(v, 3), _r(v, 4), _r(v, 5)
    f0, f1, f2 = _r(f, 0), _r(f, 1), _r(f, 2)
    f3, f4, f5 = _r(f, 3), _r(f, 4), _r(f, 5)
    return jnp.concatenate(
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
    nj, B = q.shape
    dtype = q.dtype
    sin_q, cos_q = jnp.sin(q), jnp.cos(q)
    X = [joint_X(x_tables, j, _r(sin_q, j), _r(cos_q, j)) for j in range(nj)]
    I = [materialize(I_tables[j][:, :, None].astype(dtype), B)
         for j in range(nj)]
    ez = _ez_col(dtype)

    # pass 1
    v_prev = jnp.zeros((6, B), dtype)  # full-size: row extracts of
    # broadcast-materialized values crash Mosaic (see module docstring)
    cvel, pA = [], []
    for j in range(nj):
        vj = matvec6(X[j], v_prev) + ez * _r(qd, j)
        cvel.append(crm_z(vj, _r(qd, j)))
        pA.append(crf(vj, matvec6(I[j], vj)))
        v_prev = vj

    # pass 2
    IA = list(I)
    Uc, dc, uc = [None] * nj, [None] * nj, [None] * nj
    for j in range(nj - 1, -1, -1):
        Uj = IA[j][:, _EZ, :]                 # (6,B)
        dj = Uj[_EZ:_EZ + 1, :]               # (1,B)
        uj = _r(u, j) - pA[j][_EZ:_EZ + 1, :]
        Uc[j], dc[j], uc[j] = Uj, dj, uj
        if j > 0:
            inv_d = 1.0 / dj
            UjD = Uj * inv_d
            # outer product built row by row: the (6,1,B)x(1,6,B) broadcast
            # multiply crashes Mosaic's layout pass at unaligned lane counts
            outer = jnp.stack(
                [Uj[i:i + 1, :] * UjD for i in range(6)], axis=0
            )
            Ia = IA[j] - outer
            pa = pA[j] + matvec6(Ia, cvel[j]) + Uj * (uj * inv_d)
            IA[j - 1] = IA[j - 1] + congruence_T(X[j], Ia)
            pA[j - 1] = pA[j - 1] + matvec6_T(X[j], pa)

    # pass 3
    a_prev = jnp.zeros((6, B), dtype)
    if gravity:
        a_prev = a_prev + _grav_col(gravity, dtype)
    qdd = []
    for j in range(nj):
        aj = matvec6(X[j], a_prev) + cvel[j]
        qdd_j = (uc[j] - row_sum(Uc[j] * aj)) / dc[j]
        qdd.append(qdd_j)
        a_prev = aj + ez * qdd_j
    return jnp.concatenate(qdd, axis=0)


def hom4(tables, j, sin_q, cos_q):
    """H_j(q) as (4,4,B); sin_q/cos_q are (1,B) rows."""
    Hc, Hs, Hk = tables
    return (
        Hc[j][:, :, None]
        + sin_q[None, :, :] * Hs[j][:, :, None]
        + cos_q[None, :, :] * Hk[j][:, :, None]
    )


def matmul4(A, B):
    """(4,4,B) @ (4,4,B): 16 lane-wide FMAs."""
    rows = []
    for i in range(4):
        acc = A[i, 0:1, :] * B[0]
        for k in range(1, 4):
            acc = acc + A[i, k:k + 1, :] * B[k]
        rows.append(acc)
    return jnp.stack(rows, axis=0)


def fk_ee_xyz(h_tables, q):
    """End-effector xyz, lane-batched: (nj, B) -> (3, B)."""
    nj = q.shape[0]
    sin_q, cos_q = jnp.sin(q), jnp.cos(q)
    T = hom4(h_tables, 0, _r(sin_q, 0), _r(cos_q, 0))
    for j in range(1, nj):
        T = matmul4(T, hom4(h_tables, j, _r(sin_q, j), _r(cos_q, j)))
    return T[:3, 3, :]


# ---------------------------------------------------------------------------
# generic lane-batched small linear algebra
# ---------------------------------------------------------------------------

def lane_matmul(A, B):
    """(m,k,B) @ (k,n,B) -> (m,n,B) as m*k lane-wide FMAs."""
    m, k, _ = A.shape
    rows = []
    for i in range(m):
        acc = A[i, 0:1, :] * B[0]
        for t in range(1, k):
            acc = acc + A[i, t:t + 1, :] * B[t]
        rows.append(acc)
    return jnp.stack(rows, axis=0)


def lane_matmul_T1(A, B):
    """A' @ B for (k,m,B),(k,n,B) -> (m,n,B)."""
    k, m, _ = A.shape
    rows = []
    for i in range(m):
        acc = A[0, i:i + 1, :] * B[0]
        for t in range(1, k):
            acc = acc + A[t, i:i + 1, :] * B[t]
        rows.append(acc)
    return jnp.stack(rows, axis=0)


def lane_matmul_T2(A, B):
    """A @ B' for (m,k,B),(n,k,B) -> (m,n,B)."""
    m, k, _ = A.shape
    rows = []
    for i in range(m):
        acc = None
        for t in range(k):
            term = A[i, t:t + 1, :] * B[:, t, :]
            acc = term if acc is None else acc + term
        rows.append(acc)
    return jnp.stack(rows, axis=0)


def lane_matvec(A, v):
    """(m,k,B) @ (k,B) -> (m,B)."""
    k = v.shape[0]
    acc = A[:, 0, :] * _r(v, 0)
    for t in range(1, k):
        acc = acc + A[:, t, :] * _r(v, t)
    return acc


def lane_matvec_T(A, v):
    """(k,m,B)' @ (k,B) -> (m,B)."""
    k = v.shape[0]
    acc = A[0, :, :] * _r(v, 0)
    for t in range(1, k):
        acc = acc + A[t, :, :] * _r(v, t)
    return acc


def lane_transpose(A):
    """(m,n,B) -> (n,m,B) (free: leading-dim shuffle)."""
    return jnp.swapaxes(A, 0, 1)


def lane_eye(n, B, dtype):
    i = jax.lax.broadcasted_iota(jnp.int32, (n, n, 1), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (n, n, 1), 1)
    return (i == j).astype(dtype) * jnp.ones((1, 1, B), dtype)


def _inv1_lane(A):
    return 1.0 / A


def _inv2_lane(A):
    a, b = A[0, 0:1, :], A[0, 1:2, :]
    c, d = A[1, 0:1, :], A[1, 1:2, :]
    det = a * d - b * c
    top = jnp.concatenate([d, -b], axis=0)
    bot = jnp.concatenate([-c, a], axis=0)
    return jnp.stack([top, bot], axis=0) / det[None, :, :]


def _inv3_lane(A):
    a, b, c = A[0, 0:1, :], A[0, 1:2, :], A[0, 2:3, :]
    d, e, f = A[1, 0:1, :], A[1, 1:2, :], A[1, 2:3, :]
    g, h, i = A[2, 0:1, :], A[2, 1:2, :], A[2, 2:3, :]
    co_a = e * i - f * h
    co_b = -(d * i - f * g)
    co_c = d * h - e * g
    det = a * co_a + b * co_b + c * co_c
    r0 = jnp.concatenate([co_a, -(b * i - c * h), b * f - c * e], axis=0)
    r1 = jnp.concatenate([co_b, a * i - c * g, -(a * f - c * d)], axis=0)
    r2 = jnp.concatenate([co_c, -(a * h - b * g), a * e - b * d], axis=0)
    return jnp.stack([r0, r1, r2], axis=0) / det[None, :, :]


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

def rnea_lane(x_tables, I_tables, q, qd, qdd, gravity: float = 0.0):
    """Lane-batched RNEA: (nj,B) inputs -> tau (nj,B)."""
    nj, B = q.shape
    dtype = q.dtype
    sin_q, cos_q = jnp.sin(q), jnp.cos(q)
    X = [joint_X(x_tables, j, _r(sin_q, j), _r(cos_q, j)) for j in range(nj)]
    I = [I_tables[j][:, :, None].astype(dtype) for j in range(nj)]
    ez = _ez_col(dtype)

    v_prev = jnp.zeros((6, B), dtype)
    a_prev = jnp.zeros((6, B), dtype)
    if gravity:
        a_prev = a_prev + _grav_col(gravity, dtype)
    fs = []
    for j in range(nj):
        vj = matvec6(X[j], v_prev) + ez * _r(qd, j)
        aj = matvec6(X[j], a_prev) + ez * _r(qdd, j)
        aj = aj + crm_z(vj, _r(qd, j))
        fj = lane_matvec(I[j], aj) + crf(vj, lane_matvec(I[j], vj))
        fs.append(fj)
        v_prev, a_prev = vj, aj
    tau = [None] * nj
    f = fs[nj - 1]
    for j in range(nj - 1, -1, -1):
        tau[j] = f[_EZ:_EZ + 1, :]
        if j > 0:
            f = fs[j - 1] + matvec6_T(X[j], f)
    return jnp.concatenate(tau, axis=0)


def crba_M_lane(x_tables, I_tables, q):
    """Lane-batched CRBA mass matrix: (nj,B) -> (nj,nj,B).

    Per-row propagated composite forces with a statically-unrolled sweep
    (no data-dependent masking -- Mosaic-safe)."""
    nj, B = q.shape
    dtype = q.dtype
    sin_q, cos_q = jnp.sin(q), jnp.cos(q)
    X = [joint_X(x_tables, j, _r(sin_q, j), _r(cos_q, j)) for j in range(nj)]
    Ic = [materialize(I_tables[j][:, :, None].astype(dtype), B)
          for j in range(nj)]
    for j in range(nj - 1, 0, -1):
        Ic[j - 1] = Ic[j - 1] + congruence_T(X[j], Ic[j])

    F = [Ic[i][:, _EZ, :] for i in range(nj)]          # list of (6,B)
    diag = [F[i][_EZ:_EZ + 1, :] for i in range(nj)]   # list of (1,B)
    zero_row = jnp.zeros((1, B), dtype)
    cols = [[zero_row for _ in range(nj)] for _ in range(nj)]  # [i][j]
    for j in range(nj - 1, 0, -1):
        for i in range(j, nj):                         # static unroll
            F[i] = matvec6_T(X[j], F[i])
            cols[i][j - 1] = F[i][_EZ:_EZ + 1, :]
    rows = []
    for i in range(nj):
        row_entries = []
        for j in range(nj):
            if j < i:
                row_entries.append(cols[i][j])
            elif j == i:
                row_entries.append(diag[i])
            else:
                row_entries.append(cols[j][i])         # symmetry
        rows.append(jnp.concatenate(row_entries, axis=0))  # (nj,B)
    return jnp.stack(rows, axis=0)                     # (nj,nj,B)


def fk_ee_and_jac(h_tables, dh_tables, q):
    """EE xyz (3,B) and position Jacobian (3,nj,B), lane-batched."""
    nj, B = q.shape
    sin_q, cos_q = jnp.sin(q), jnp.cos(q)
    H = [hom4(h_tables, j, _r(sin_q, j), _r(cos_q, j)) for j in range(nj)]
    dH = [hom4(dh_tables, j, _r(sin_q, j), _r(cos_q, j)) for j in range(nj)]
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


def rnea_lane_dtau_units(x_tables, I_tables, q, qd, qdd,
                         gravity: float = 0.0):
    """dtau columns for ALL 2*nj unit tangent directions at once:
    returns [dtau/dq_0 .. dtau/dq_{nj-1}, dtau/dqd_0 .. dtau/dqd_{nj-1}],
    each (nj, B).

    The round-5 optimization of the KKT stage's dominant cost: the
    previous path called rnea_lane_jvp once per direction, which (a)
    recomputed the full primal RNEA chain 2*nj times and (b) propagated
    structurally-zero tangents through every joint below the seeded one.
    Here the primal chain (X, v, a, Iv, f, and the backward force
    accumulators) is computed ONCE, and each direction propagates only
    its nonzero tail: for a unit tangent seeded at joint d, dv/da/df
    vanish for j < d, and the dX term exists only at j == d.  Same math,
    ~3x fewer vreg ops than 2*nj generic JVP calls (mirrors the
    reference's analytic fd_and_gradient being one fused routine,
    iiwa_eepos_grid.cuh forward_dynamics_gradient).

    Mosaic discipline identical to rnea_lane_jvp (materialized tables,
    no rank-1 values, full-size zeros).
    """
    nj, B = q.shape
    dtype = q.dtype
    Xc, Xs, Xk = x_tables
    sin_q, cos_q = jnp.sin(q), jnp.cos(q)
    ez = _ez_col(dtype)
    z6 = jnp.zeros((6, B), dtype)

    X, dXdq, I = [], [], []
    for j in range(nj):
        s, c = _r(sin_q, j), _r(cos_q, j)
        X.append(Xc[j][:, :, None] + s[None, :, :] * Xs[j][:, :, None]
                 + c[None, :, :] * Xk[j][:, :, None])
        dXdq.append(materialize(
            c[None, :, :] * Xs[j][:, :, None]
            - s[None, :, :] * Xk[j][:, :, None], B))
        I.append(materialize(I_tables[j][:, :, None].astype(dtype), B))

    # ---- primal chain, once (identical to rnea_lane_jvp's primal)
    v_in, a_in, v, Iv, fs = [], [], [], [], []
    v_prev, a_prev = z6, z6
    if gravity:
        a_prev = a_prev + _grav_col(gravity, dtype)
    for j in range(nj):
        v_in.append(v_prev)
        a_in.append(a_prev)
        vj = matvec6(X[j], v_prev) + ez * _r(qd, j)
        aj = (matvec6(X[j], a_prev) + ez * _r(qdd, j)
              + crm_z(vj, _r(qd, j)))
        Ivj = matvec6(I[j], vj)
        fs.append(matvec6(I[j], aj) + crf(vj, Ivj))
        v.append(vj)
        Iv.append(Ivj)
        v_prev, a_prev = vj, aj

    # primal backward accumulators: f_acc[j] = f when the backward loop
    # visits joint j (needed for the dX' f term at the seed joint)
    f_acc = [None] * nj
    f = fs[nj - 1]
    for j in range(nj - 1, -1, -1):
        f_acc[j] = f
        if j > 0:
            f = fs[j - 1] + matvec6_T(X[j], f)

    ones = jnp.ones((1, B), dtype)

    def _direction(d, dv_d, da_d, pos):
        """Propagate one unit direction seeded at joint d."""
        dfs = {d: (matvec6(I[d], da_d) + crf(dv_d, Iv[d])
                   + crf(v[d], matvec6(I[d], dv_d)))}
        dv_prev, da_prev = dv_d, da_d
        for j in range(d + 1, nj):
            dvj = matvec6(X[j], dv_prev)
            daj = matvec6(X[j], da_prev) + crm_z(dvj, _r(qd, j))
            dfs[j] = (matvec6(I[j], daj) + crf(dvj, Iv[j])
                      + crf(v[j], matvec6(I[j], dvj)))
            dv_prev, da_prev = dvj, daj
        dtau_rows = [None] * nj
        df = dfs[nj - 1]                 # d <= nj-1, so this always exists
        for j in range(nj - 1, -1, -1):
            dtau_rows[j] = df[_EZ:_EZ + 1, :]
            if j > 0:
                df_new = matvec6_T(X[j], df)
                if pos and j == d:
                    df_new = df_new + matvec6_T(dXdq[d], f_acc[d])
                prev = dfs.get(j - 1)    # zero (absent) below the seed
                df = (prev + df_new) if prev is not None else df_new
        return jnp.concatenate(dtau_rows, axis=0)

    cols = []
    for d in range(nj):          # d/dq_d directions
        dv_d = matvec6(dXdq[d], v_in[d])
        da_d = matvec6(dXdq[d], a_in[d]) + crm_z(dv_d, _r(qd, d))
        cols.append(_direction(d, dv_d, da_d, pos=True))
    for d in range(nj):          # d/dqd_d directions
        dv_d = ez * ones
        da_d = crm_z(dv_d, _r(qd, d)) + crm_z(v[d], ones)
        cols.append(_direction(d, dv_d, da_d, pos=False))
    return cols


def rnea_lane_jvp(x_tables, I_tables, q, qd, qdd, tq, tqd,
                  gravity: float = 0.0):
    """Hand-written forward-mode RNEA: (tau, dtau) for tangents (tq, tqd)
    at fixed qdd.

    Equivalent to jax.jvp of rnea_lane, but with every tangent explicitly
    materialized -- jvp's symbolic-zero instantiation creates replicated
    zero constants whose row extraction crashes Mosaic at multi-tile lane
    widths.  X_j depends on q_j as X = Xc + sin(q) Xs + cos(q) Xk, so
    dX_j = tq_j * (cos(q_j) Xs - sin(q_j) Xk).
    """
    nj, B = q.shape
    dtype = q.dtype
    Xc, Xs, Xk = x_tables
    sin_q, cos_q = jnp.sin(q), jnp.cos(q)
    ez = _ez_col(dtype)
    z6 = jnp.zeros((6, B), dtype)

    X, dX, I = [], [], []
    for j in range(nj):
        s, c, t = _r(sin_q, j), _r(cos_q, j), _r(tq, j)
        X.append(Xc[j][:, :, None] + s[None, :, :] * Xs[j][:, :, None]
                 + c[None, :, :] * Xk[j][:, :, None])
        dX.append(materialize(
            (c * t)[None, :, :] * Xs[j][:, :, None]
            - (s * t)[None, :, :] * Xk[j][:, :, None], B))
        I.append(materialize(I_tables[j][:, :, None].astype(dtype), B))

    v_prev, dv_prev = z6, z6
    a_prev, da_prev = z6, z6
    if gravity:
        a_prev = a_prev + _grav_col(gravity, dtype)
    fs, dfs = [], []
    for j in range(nj):
        vj = matvec6(X[j], v_prev) + ez * _r(qd, j)
        dvj = (matvec6(dX[j], v_prev) + matvec6(X[j], dv_prev)
               + ez * _r(tqd, j))
        aj = (matvec6(X[j], a_prev) + ez * _r(qdd, j)
              + crm_z(vj, _r(qd, j)))
        daj = (matvec6(dX[j], a_prev) + matvec6(X[j], da_prev)
               + crm_z(dvj, _r(qd, j)) + crm_z(vj, _r(tqd, j)))
        Iv = matvec6(I[j], vj)
        dIv = matvec6(I[j], dvj)
        fs.append(matvec6(I[j], aj) + crf(vj, Iv))
        dfs.append(matvec6(I[j], daj) + crf(dvj, Iv) + crf(vj, dIv))
        v_prev, dv_prev, a_prev, da_prev = vj, dvj, aj, daj

    tau, dtau = [None] * nj, [None] * nj
    f, df = fs[nj - 1], dfs[nj - 1]
    for j in range(nj - 1, -1, -1):
        tau[j] = f[_EZ:_EZ + 1, :]
        dtau[j] = df[_EZ:_EZ + 1, :]
        if j > 0:
            f_new = fs[j - 1] + matvec6_T(X[j], f)
            df = dfs[j - 1] + matvec6_T(X[j], df) + matvec6_T(dX[j], f)
            f = f_new
    return jnp.concatenate(tau, axis=0), jnp.concatenate(dtau, axis=0)
