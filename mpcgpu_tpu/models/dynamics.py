"""Rigid-body dynamics: vectorized Featherstone algorithms in JAX.

TPU-native replacement for the GRiD-generated CUDA dynamics
(reference include/dynamics/iiwa/iiwa_eepos_grid.cuh: RNEA
``inverse_dynamics_inner`` :2511, M^{-1} ``direct_minv_inner`` :3753,
``forward_dynamics_inner/_finish`` :4351/:4379, analytic ID gradient
``inverse_dynamics_gradient_inner`` :4558, end-effector kinematics
:2015/:2346).  The reference emits ~5.7k lines of unrolled scalar spatial
algebra per robot; here the same quantities come from ~200 lines of
generic batched linear algebra over the extracted model tables, and the
gradients come from forward-mode AD through the O(n) recursions -- which
yields the identical values as GRiD's hand-derived gradient (the Jacobian
of RNEA is unique) while staying robot-generic.

All functions take a single configuration; batch over knots with
``jax.vmap`` at the call site.  Spatial vectors are ordered
[angular(3); linear(3)]; joints are revolute about local z.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from mpcgpu_tpu.models.robot import RobotModel

_EZ = 2  # index of the z angular component == S' f for S = [0,0,1,0,0,0]


# ---------------------------------------------------------------------------
# spatial-algebra helpers
# ---------------------------------------------------------------------------

def _cross3(a, b):
    return jnp.cross(a, b)


def crm(v, m):
    """Motion cross product  (v x) m  for spatial motion vectors."""
    w, vl = v[:3], v[3:]
    mw, ml = m[:3], m[3:]
    return jnp.concatenate([_cross3(w, mw), _cross3(w, ml) + _cross3(vl, mw)])


def crf(v, f):
    """Force cross product  (v x*) f  = -crm(v)' f."""
    w, vl = v[:3], v[3:]
    fw, fl = f[:3], f[3:]
    return jnp.concatenate([_cross3(w, fw) + _cross3(vl, fl), _cross3(w, fl)])


def joint_transforms(model: RobotModel, q: jnp.ndarray) -> jnp.ndarray:
    """X_i(q_i), shape (nj, 6, 6): spatial motion transforms child <- parent."""
    s = jnp.sin(q)[:, None, None]
    c = jnp.cos(q)[:, None, None]
    return model.Xc + s * model.Xs + c * model.Xk


def hom_transforms(model: RobotModel, q: jnp.ndarray):
    """(H_i, dH_i/dq_i), each (nj, 4, 4)."""
    s = jnp.sin(q)[:, None, None]
    c = jnp.cos(q)[:, None, None]
    H = model.Hc + s * model.Hs + c * model.Hk
    dH = model.dHc + s * model.dHs + c * model.dHk
    return H, dH


# ---------------------------------------------------------------------------
# end-effector kinematics (reference end_effector_positions_inner :2015-2083)
# ---------------------------------------------------------------------------

def _rpy(T):
    roll = jnp.arctan2(T[2, 1], T[2, 2])
    pitch = -jnp.arctan2(T[2, 0], jnp.sqrt(T[2, 1] ** 2 + T[2, 2] ** 2))
    yaw = jnp.arctan2(T[1, 0], T[0, 0])
    return jnp.stack([roll, pitch, yaw])


def ee_transform(model: RobotModel, q: jnp.ndarray) -> jnp.ndarray:
    H, _ = hom_transforms(model, q)
    T = H[0]
    for i in range(1, model.num_joints):
        T = T @ H[i]
    return T


def ee_pos(model: RobotModel, q: jnp.ndarray) -> jnp.ndarray:
    """6-vector [x, y, z, roll, pitch, yaw] of the end effector."""
    T = ee_transform(model, q)
    return jnp.concatenate([T[:3, 3], _rpy(T)])


def ee_pos_and_jac(model: RobotModel, q: jnp.ndarray):
    """EE pose (6,) and the xyz position Jacobian (3, nj).

    dT/dq_j = H_0..H_{j-1} dH_j H_{j+1}..H_{nj-1} via prefix/suffix products
    using the extracted dH tables (reference end_effector_positions_gradient
    :2346).  Only the position rows feed the tracking cost
    (reference iiwa_eepos_plant.cuh:339).
    """
    nj = model.num_joints
    H, dH = hom_transforms(model, q)
    prefix = [jnp.eye(4, dtype=H.dtype)]
    for i in range(nj):
        prefix.append(prefix[-1] @ H[i])
    suffix = [jnp.eye(4, dtype=H.dtype)]
    for i in range(nj - 1, -1, -1):
        suffix.append(H[i] @ suffix[-1])
    suffix = suffix[::-1]  # suffix[i] = H_i .. H_{nj-1}
    T = prefix[nj]
    dpos = jnp.stack(
        [(prefix[j] @ dH[j] @ suffix[j + 1])[:3, 3] for j in range(nj)], axis=1
    )
    return jnp.concatenate([T[:3, 3], _rpy(T)]), dpos


# ---------------------------------------------------------------------------
# inverse dynamics (RNEA) and the mass matrix
# ---------------------------------------------------------------------------

def _grav_accel(gravity, dtype):
    # base "acceleration" convention: a_0 includes +g along world z so that
    # gravity appears in the bias force; the reference runs gravity = 0
    # (iiwa_eepos_plant.cuh:51) which zeroes this term.
    return jnp.array([0.0, 0.0, 0.0, 0.0, 0.0, gravity], dtype=dtype)


def rnea(model: RobotModel, q, qd, qdd, gravity: float = 0.0):
    """Recursive Newton-Euler: joint torques for (q, qd, qdd)."""
    nj = model.num_joints
    X = joint_transforms(model, q)
    a_prev = _grav_accel(gravity, q.dtype)
    v_prev = jnp.zeros(6, dtype=q.dtype)
    vs, fs = [], []
    for i in range(nj):
        vi = X[i] @ v_prev
        ai = X[i] @ a_prev
        vi = vi.at[_EZ].add(qd[i])
        Sqd = jnp.zeros(6, q.dtype).at[_EZ].set(qd[i])
        ai = ai.at[_EZ].add(qdd[i])
        ai = ai + crm(vi, Sqd)
        fi = model.I[i] @ ai + crf(vi, model.I[i] @ vi)
        vs.append(vi)
        fs.append(fi)
        v_prev, a_prev = vi, ai
    tau = [None] * nj
    f = fs[nj - 1]
    for i in range(nj - 1, -1, -1):
        tau[i] = f[_EZ]
        if i > 0:
            f = fs[i - 1] + X[i].T @ f
    return jnp.stack(tau)


def bias_force(model: RobotModel, q, qd, gravity: float = 0.0):
    """c(q, qd) = RNEA(q, qd, 0): Coriolis/centrifugal (+gravity) torques."""
    return rnea(model, q, qd, jnp.zeros_like(q), gravity)


def mass_matrix(model: RobotModel, q):
    """Composite-rigid-body algorithm; M(q) is (nj, nj) symmetric PD.

    The classic per-(i, j) double loop is restructured as one backward
    column sweep propagating all rows' composite forces at once -- O(nj)
    batched matmuls instead of O(nj^2) scalar updates, which keeps the
    XLA graph shallow (this runs inside every KKT and merit evaluation).
    """
    nj = model.num_joints
    X = joint_transforms(model, q)
    Ic = [model.I[i] for i in range(nj)]
    for i in range(nj - 1, 0, -1):
        Ic[i - 1] = Ic[i - 1] + X[i].T @ Ic[i] @ X[i]
    F = jnp.stack([Ic[i][:, _EZ] for i in range(nj)])  # row i: Ic_i S
    diag = F[:, _EZ]
    idx = jnp.arange(nj)
    cols = [jnp.zeros(nj, q.dtype)] * nj
    for j in range(nj - 1, 0, -1):
        # f_i <- X_j' f_i, but only rows i >= j have entered the sweep;
        # row i keeps its initial Ic_i S until j reaches i.
        F = jnp.where((idx >= j)[:, None], F @ X[j], F)
        cols[j - 1] = jnp.where(idx >= j, F[:, _EZ], 0.0)
    L = jnp.stack(cols, axis=1)  # strictly-lower triangle of M
    return L + L.T + jnp.diag(diag)


def minv(model: RobotModel, q):
    """M(q)^{-1} (the value GRiD's direct_minv_inner computes), via the
    shallow block-recursive SPD inverse (ops/smallinv)."""
    from mpcgpu_tpu.ops.smallinv import spd_inverse

    return spd_inverse(mass_matrix(model, q))


# ---------------------------------------------------------------------------
# forward dynamics and its analytic gradient
# ---------------------------------------------------------------------------

def forward_dynamics_crba(model: RobotModel, q, qd, u, gravity: float = 0.0):
    """qdd = M^{-1}(u - c(q, qd))  (reference forward_dynamics_finish :4379)."""
    c = bias_force(model, q, qd, gravity)
    M = mass_matrix(model, q)
    L = jax.scipy.linalg.cho_factor(M, lower=True)
    return jax.scipy.linalg.cho_solve(L, u - c)


def forward_dynamics(model: RobotModel, q, qd, u, gravity: float = 0.0):
    """Articulated-body algorithm: O(n) forward dynamics with no matrix
    factorization -- only scalar divides by the articulated inertia d_i.

    Same value as M^{-1}(u - c) (asserted in tests) but a much shallower
    compute graph, which matters because this runs per knot inside every
    line-search merit evaluation and every plant substep.
    """
    nj = model.num_joints
    X = joint_transforms(model, q)

    # pass 1 (outward): velocities, velocity-product accels, bias forces
    v_prev = jnp.zeros(6, q.dtype)
    v, cvel, pA = [], [], []
    for i in range(nj):
        vi = (X[i] @ v_prev).at[_EZ].add(qd[i])
        Sqd = jnp.zeros(6, q.dtype).at[_EZ].set(qd[i])
        v.append(vi)
        cvel.append(crm(vi, Sqd))
        pA.append(crf(vi, model.I[i] @ vi))
        v_prev = vi

    # pass 2 (inward): articulated inertias
    IA = [model.I[i] for i in range(nj)]
    Uc, dc, uc = [None] * nj, [None] * nj, [None] * nj
    for i in range(nj - 1, -1, -1):
        Ui = IA[i][:, _EZ]
        di = Ui[_EZ]
        ui = u[i] - pA[i][_EZ]
        Uc[i], dc[i], uc[i] = Ui, di, ui
        if i > 0:
            Ia = IA[i] - jnp.outer(Ui, Ui) / di
            pa = pA[i] + Ia @ cvel[i] + Ui * (ui / di)
            IA[i - 1] = IA[i - 1] + X[i].T @ Ia @ X[i]
            pA[i - 1] = pA[i - 1] + X[i].T @ pa

    # pass 3 (outward): accelerations
    a_prev = _grav_accel(gravity, q.dtype)
    qdd = []
    for i in range(nj):
        ai = X[i] @ a_prev + cvel[i]
        qdd_i = (uc[i] - Uc[i] @ ai) / dc[i]
        qdd.append(qdd_i)
        a_prev = ai.at[_EZ].add(qdd_i)
    return jnp.stack(qdd)


def fd_and_gradient(model: RobotModel, q, qd, u, gravity: float = 0.0):
    """(qdd, dqdd_dq, dqdd_dqd, Minv) -- Minv == dqdd/du.

    Matches the reference composition (iiwa_eepos_plant.cuh:128-156):
        qdd    = Minv (u - c(q, qd))
        dqdd/d(q,qd) = -Minv * dID(q, qd; qdd)/d(q,qd)
    with the ID gradient obtained by forward-mode AD of the O(n) RNEA
    recursion (identical values to GRiD's analytic derivative).
    """
    nj = model.num_joints
    Mi = minv(model, q)
    c = bias_force(model, q, qd, gravity)
    qdd = Mi @ (u - c)

    def id_tau(x):
        return rnea(model, x[:nj], x[nj:], qdd, gravity)

    dtau = jax.jacfwd(id_tau)(jnp.concatenate([q, qd]))  # (nj, 2nj)
    dqdd = -Mi @ dtau
    return qdd, dqdd[:, :nj], dqdd[:, nj:], Mi
