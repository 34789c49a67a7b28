"""KKT system linearization, batched over the horizon.

TPU-native equivalent of the reference KKT kernel
(reference include/common/kkt.cuh:24-163, ``generate_kkt_submatrices``):
one vmap over knots instead of one CUDA block per knot.  Sign convention:
we keep A, B positive (the reference stores C = [-A -B],
kkt.cuh:115-116, and compensates downstream).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from mpcgpu_tpu.models.robot import RobotModel
from mpcgpu_tpu.ops import cost as cost_ops
from mpcgpu_tpu.ops import integrator as integ


class KKTData(NamedTuple):
    """Per-knot KKT blocks for N knots.

    Q: (N, nx, nx)   cost Hessian wrt state
    q: (N, nx)       cost gradient wrt state
    R: (N-1, nu, nu) cost Hessian wrt control
    r: (N-1, nu)     cost gradient wrt control
    A: (N-1, nx, nx) dynamics Jacobian df/dx
    B: (N-1, nx, nu) dynamics Jacobian df/du
    c: (N, nx)       constraint residuals: c[0] = x0 - xs,
                     c[k+1] = x_{k+1} - f(x_k, u_k)
    """

    Q: jnp.ndarray
    q: jnp.ndarray
    R: jnp.ndarray
    r: jnp.ndarray
    A: jnp.ndarray
    B: jnp.ndarray
    c: jnp.ndarray


def form_kkt(model: RobotModel, X, U, goals, xs, dt, qd_cost, r_cost,
             integrator_type: int = 0, gravity: float = 0.0,
             hessian: str = "reference", angle_wrap: bool = False,
             tracking: str = "eepos", q_cost: float = 1.0) -> KKTData:
    """Linearize dynamics and cost around (X, U).

    tracking="eepos": goals is the (N, 6) end-effector pose trace
    (reference iiwa_eepos_plant.cuh).  tracking="joint": goals is the
    (N, nx) reference state trajectory and the cost is joint-space
    quadratic tracking (reference iiwa_plant.cuh:40-332).
    """
    lin = jax.vmap(
        lambda x, u, xn: integ.integrator_and_gradient(
            model, x, u, xn, dt, integrator_type, gravity, angle_wrap
        )
    )
    A, B, err = lin(X[:-1], U, X[1:])

    if tracking == "joint":
        gh = jax.vmap(
            lambda x, u, g: cost_ops.joint_space_gradient_and_hessian(
                q_cost, qd_cost, r_cost, x, u, g
            )
        )
    else:
        gh = jax.vmap(
            lambda x, u, g: cost_ops.cost_gradient_and_hessian(
                model, qd_cost, r_cost, x, u, g, hessian
            )
        )
    # last knot has no control; reference evaluates it with computeR=false
    # (kkt.cuh:90-103) -- pad U and drop the extra R, r rows.
    Upad = jnp.concatenate([U, jnp.zeros((1, U.shape[1]), U.dtype)])
    Q, q, R, r = gh(X, Upad, goals)

    c = jnp.concatenate([(X[0] - xs)[None], err], axis=0)
    return KKTData(Q=Q, q=q, R=R[:-1], r=r[:-1], A=A, B=B, c=c)
