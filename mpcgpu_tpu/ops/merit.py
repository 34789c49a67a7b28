"""L1 merit function for the SQP line search.

merit(X, U) = sum_k J_k + mu * ( sum_{k<N-1} ||x_{k+1} - f(x_k, u_k)||_1
                                 + ||x_0 - xs||_1 )

Matches the reference merit kernels (include/common/merit.cuh:19-94
``ls_gato_compute_merit`` and :101-143 ``compute_merit``) with mu = 10
(pcg/sqp.cuh:62).  The initial-state term ||x_0 - xs||_1 is the candidate
kernel's "last knot" contribution (merit.cuh:69-77); it is zero at solve
entry because the MPC loop re-injects x_0 = xs (mpcsim.cuh:394), so
including it unconditionally reproduces the reference's accept/reject
decisions.  The 8 line-search candidates become one vmapped evaluation
instead of 8 CUDA streams (pcg/sqp.cuh:327-344).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from mpcgpu_tpu.models.robot import RobotModel
from mpcgpu_tpu.ops import cost as cost_ops
from mpcgpu_tpu.ops import integrator as integ


def merit(model: RobotModel, X, U, goals, xs, dt, mu, qd_cost, r_cost,
          integrator_type: int = 0, gravity: float = 0.0,
          angle_wrap: bool = False, tracking: str = "eepos",
          q_cost: float = 1.0):
    if tracking == "joint":
        J = cost_ops.trajectory_cost_joint(q_cost, qd_cost, r_cost, X, U, goals)
    else:
        J = cost_ops.trajectory_cost(model, qd_cost, r_cost, X, U, goals)
    defects = jax.vmap(
        lambda x, u, xn: integ.defect_l1(
            model, x, u, xn, dt, integrator_type, gravity, angle_wrap
        )
    )(X[:-1], U, X[1:])
    c0 = jnp.abs(X[0] - xs).sum()
    return J + mu * (defects.sum() + c0)


def line_search_merits(model: RobotModel, X, U, dX, dU, alphas, goals, xs, dt,
                       mu, qd_cost, r_cost, integrator_type: int = 0,
                       gravity: float = 0.0, angle_wrap: bool = False,
                       tracking: str = "eepos", q_cost: float = 1.0):
    """Merit of (X + a dX, U + a dU) for every candidate step size a."""

    def one(a):
        return merit(
            model, X + a * dX, U + a * dU, goals, xs, dt, mu, qd_cost, r_cost,
            integrator_type, gravity, angle_wrap, tracking, q_cost,
        )

    return jax.vmap(one)(alphas)
