"""Explicit / semi-implicit Euler integration of the plant and its gradient.

Mirrors reference include/common/integrator.cuh: ``exec_integrator`` (:105),
``exec_integrator_error`` (:24), ``exec_integrator_gradient`` (:61), and the
fused ``integratorAndGradient`` (:135).
"""
from __future__ import annotations

import jax.numpy as jnp

from mpcgpu_tpu.models import dynamics as dyn
from mpcgpu_tpu.models.robot import RobotModel


def angle_wrap(q):
    """Reflect joint angles that leave (-pi, pi) back into range.

    Exact semantics (including the truncated pi constant and the
    reflection rather than a modular wrap) of the reference's
    ``angleWrap`` (include/common/integrator.cuh:13-19), applied to the
    integrated q when ANGLE_WRAP is enabled (integrator.cuh:42-43,126-127).
    """
    pi = jnp.asarray(3.14159, q.dtype)
    q = jnp.where(q > pi, -(q - pi), q)
    q = jnp.where(q < -pi, -(q + pi), q)
    return q


def integrate(model: RobotModel, x, u, dt, integrator_type: int = 0,
              gravity: float = 0.0, wrap: bool = False):
    """x_{k+1} = f(x_k, u_k): one explicit (0) or semi-implicit (1) Euler step."""
    nq = x.shape[0] // 2
    q, qd = x[:nq], x[nq:]
    qdd = dyn.forward_dynamics(model, q, qd, u, gravity)
    if integrator_type == 0:
        q_new = q + dt * qd
        qd_new = qd + dt * qdd
    elif integrator_type == 1:
        qd_new = qd + dt * qdd
        q_new = q + dt * qd_new
    else:
        raise ValueError(f"integrator_type {integrator_type} not in (0, 1)")
    if wrap:
        q_new = angle_wrap(q_new)
    return jnp.concatenate([q_new, qd_new])


def integrator_and_gradient(model: RobotModel, x, u, x_next, dt,
                            integrator_type: int = 0, gravity: float = 0.0,
                            wrap: bool = False):
    """(A, B, err): dynamics linearization and defect at one knot.

    err = x_next - f(x, u); A = df/dx, B = df/du composed from the
    continuous-dynamics gradient exactly as the reference does
    (integrator.cuh:61-100).  As in the reference, ANGLE_WRAP affects
    only the integrated value (the defect), never the gradient
    (integrator.cuh:149-156: exec_integrator_gradient takes no
    ANGLE_WRAP parameter).
    """
    nq = x.shape[0] // 2
    q, qd = x[:nq], x[nq:]
    qdd, dq, dqd, Minv = dyn.fd_and_gradient(model, q, qd, u, gravity)

    Z = jnp.zeros((nq, nq), x.dtype)
    Iq = jnp.eye(nq, dtype=x.dtype)
    if integrator_type == 0:
        # A = I + dt [[0, I], [dqdd/dq, dqdd/dqd]];  B = dt [[0], [Minv]]
        A = jnp.block([[Iq + dt * Z, dt * Iq], [dt * dq, Iq + dt * dqd]])
        B = jnp.concatenate([Z[:, : u.shape[0]], dt * Minv], axis=0)
        q_new = q + dt * qd
        qd_new = qd + dt * qdd
    elif integrator_type == 1:
        # qd' = qd + dt qdd;  q' = q + dt qd'  (integrator.cuh:81-97)
        A = jnp.block(
            [[Iq + dt * dt * dq, dt * Iq + dt * dt * dqd], [dt * dq, Iq + dt * dqd]]
        )
        B = jnp.concatenate([dt * dt * Minv, dt * Minv], axis=0)
        qd_new = qd + dt * qdd
        q_new = q + dt * qd_new
    else:
        raise ValueError(f"integrator_type {integrator_type} not in (0, 1)")

    if wrap:
        q_new = angle_wrap(q_new)
    err = x_next - jnp.concatenate([q_new, qd_new])
    return A, B, err


def defect_l1(model: RobotModel, x, u, x_next, dt, integrator_type: int = 0,
              gravity: float = 0.0, wrap: bool = False):
    """||x_next - f(x, u)||_1: the merit function's constraint-violation term
    (reference integratorError, integrator.cuh:163-193)."""
    return jnp.abs(
        x_next - integrate(model, x, u, dt, integrator_type, gravity, wrap)
    ).sum()
