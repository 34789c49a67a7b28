"""End-effector tracking cost, gradient, and Gauss-Newton Hessian.

Semantics of the reference plant adapter
(reference include/dynamics/iiwa/iiwa_eepos_plant.cuh):

  cost      :242-290:  J_k = 0.5 ||ee_xyz(q_k) - goal_k||^2
                             + 0.5 qd_cost ||qd_k||^2
                             + 0.5 r_cost ||u_k||^2   (no u term at k = N-1)
  gradient  :329-354:  dq = J_ee' e  (position rows only); dqd = qd_cost qd;
                       du = r_cost u
  Hessian   :358-377:  Q[0:nq,0:nq] = dq dq'  (outer product of the gradient),
                       Q elsewhere = qd_cost on the diagonal;  R = r_cost I.

Everything is batched over the knot axis.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from mpcgpu_tpu.models import dynamics as dyn
from mpcgpu_tpu.models.robot import RobotModel


def knot_cost(model: RobotModel, qd_cost, r_cost, x, u, goal, use_control):
    """Single-knot tracking cost; ``use_control`` masks the u term at k=N-1."""
    nq = x.shape[0] // 2
    q, qd = x[:nq], x[nq:]
    ee = dyn.ee_pos(model, q)
    err = ee[:3] - goal[:3]
    cost = 0.5 * (err @ err) + 0.5 * qd_cost * (qd @ qd)
    return cost + use_control * 0.5 * r_cost * (u @ u)


def joint_space_knot_cost(q_cost, qd_cost, r_cost, x, u, x_ref, use_control):
    """Joint-space tracking variant (the reference's unused second plant
    adapter, reference include/dynamics/iiwa/iiwa_plant.cuh:40-332):
    quadratic tracking of a precomputed state trajectory with weight
    Q_COST on positions instead of end-effector error."""
    nq = x.shape[0] // 2
    dq = x[:nq] - x_ref[:nq]
    dqd = x[nq:] - x_ref[nq:]
    cost = 0.5 * q_cost * (dq @ dq) + 0.5 * qd_cost * (dqd @ dqd)
    return cost + use_control * 0.5 * r_cost * (u @ u)


def joint_space_gradient_and_hessian(q_cost, qd_cost, r_cost, x, u, x_ref):
    """Exact (diagonal) derivatives of the joint-space tracking cost."""
    nq = x.shape[0] // 2
    nx = x.shape[0]
    g = jnp.concatenate(
        [q_cost * (x[:nq] - x_ref[:nq]), qd_cost * (x[nq:] - x_ref[nq:])]
    )
    w = jnp.concatenate([jnp.full(nq, q_cost), jnp.full(nq, qd_cost)])
    Q = jnp.diag(w.astype(x.dtype))
    R = r_cost * jnp.eye(u.shape[0], dtype=x.dtype)
    return Q, g, R, r_cost * u


def trajectory_cost(model, qd_cost, r_cost, X, U, goals):
    """Sum of knot costs for X (N, nx), U (N-1, nu), goals (N, 6)."""
    n = X.shape[0]
    Upad = jnp.concatenate([U, jnp.zeros((1, U.shape[1]), U.dtype)])
    use_u = jnp.arange(n) < n - 1
    costs = jax.vmap(
        lambda x, u, g, m: knot_cost(model, qd_cost, r_cost, x, u, g, m)
    )(X, Upad, goals, use_u.astype(X.dtype))
    return costs.sum()


def trajectory_cost_joint(q_cost, qd_cost, r_cost, X, U, X_ref):
    """Joint-space variant of trajectory_cost: X_ref is (N, nx) state refs."""
    n = X.shape[0]
    Upad = jnp.concatenate([U, jnp.zeros((1, U.shape[1]), U.dtype)])
    use_u = jnp.arange(n) < n - 1
    costs = jax.vmap(
        lambda x, u, xr, m: joint_space_knot_cost(
            q_cost, qd_cost, r_cost, x, u, xr, m
        )
    )(X, Upad, X_ref, use_u.astype(X.dtype))
    return costs.sum()


def cost_gradient_and_hessian(model: RobotModel, qd_cost, r_cost, x, u, goal,
                              hessian: str = "reference"):
    """Per-knot (Q, q_grad, R, r_grad).

    hessian="reference": the reference's rank-1 outer product g_q g_q' for
    the position block (iiwa_eepos_plant.cuh:363) -- note this vanishes at
    zero tracking error, leaving only the rho regularizer as curvature.
    hessian="gauss_newton": the true Gauss-Newton J'J, which keeps full
    curvature in the task directions (offered as an extension; changes the
    solution, not just the path).
    """
    nq = x.shape[0] // 2
    nx = x.shape[0]
    q, qd = x[:nq], x[nq:]
    ee, J = dyn.ee_pos_and_jac(model, q)   # J: (3, nq) position Jacobian
    err = ee[:3] - goal[:3]

    g_q = J.T @ err                        # (nq,)
    g = jnp.concatenate([g_q, qd_cost * qd])
    r_grad = r_cost * u

    Q = qd_cost * jnp.eye(nx, dtype=x.dtype)
    if hessian == "reference":
        Q = Q.at[:nq, :nq].set(jnp.outer(g_q, g_q))
    elif hessian == "gauss_newton":
        Q = Q.at[:nq, :nq].set(J.T @ J)
    else:
        raise ValueError(f"unknown hessian mode {hessian!r}")
    R = r_cost * jnp.eye(u.shape[0], dtype=x.dtype)
    return Q, g, R, r_grad
