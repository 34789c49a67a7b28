"""Fused plant rollout: all simulation substeps in one Pallas kernel.

The reference integrates the measured plant with one tiny kernel launch
per 0.2 ms substep (reference include/common/integrator.cuh:296-325,
``simple_simulate`` launching ``simple_integrator_kernel<<<1,32>>>`` per
substep).  The XLA port of that loop is ~10 sequential articulated-body
evaluations of batch size 1 -- thousands of tiny ops that dominate the
control period once the solver stages are fused.  Here the whole rollout
(every substep, the fmod remainder, and the end-effector tracking-error
probe) is ONE kernel of straight-line VPU code.

The per-substep control lookup (the control active at the simulation
clock inside the previous plan, integrator.cuh:315) is a one-hot
lane reduction instead of a dynamic slice.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mpcgpu_tpu.models.robot import RobotModel
from mpcgpu_tpu.ops.pallas import lanedyn as ld


def _select_control(U_prev, t, timestep):
    """u active at sim time t: one-hot over the lane (knot) axis."""
    n = U_prev.shape[1]
    k = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    idx = jnp.clip(jnp.floor(t / timestep).astype(jnp.int32), 0, n - 2)
    onehot = (k == idx).astype(U_prev.dtype)
    return jnp.sum(U_prev * onehot, axis=1, keepdims=True)  # (nu, 1)


def _rollout_kernel(nq: int, timestep: float, sub: float, max_substeps: int,
                    gravity: float,
                    offs_ref, simt_ref,
                    x_ref, u_ref, goal_ref,
                    xc, xs_t, xk, i_ref, hc, hs, hk,
                    x_out, err_out):
    x = x_ref[:]                       # (nx, 1)
    U_prev = u_ref[:]                  # (nu, N)
    goal = goal_ref[:]                 # (3, 1)
    t0 = offs_ref[0] * 1e-6
    total = simt_ref[0] * 1e-6
    n_steps = jnp.floor(total / sub).astype(jnp.int32)
    x_tab = (xc[:], xs_t[:], xk[:])
    I_tab = i_ref[:]

    def step(x, dt, t):
        u = _select_control(U_prev, t, timestep)
        q, qd = x[:nq], x[nq:]
        qdd = ld.aba_qdd(x_tab, I_tab, q, qd, u, gravity)
        return x + dt * jnp.concatenate([qd, qdd], axis=0)

    for s in range(max_substeps):
        active = (s < n_steps).astype(x.dtype)
        x = step(x, active * sub, t0 + s * sub)

    # remainder with the control of the last full substep (integrator.cuh:322)
    rem = jnp.mod(total, sub)
    t_last = t0 + jnp.maximum(n_steps - 1, 0).astype(x.dtype) * sub
    x = step(x, rem, t_last)

    x_out[:] = x
    ee = ld.fk_ee_xyz((hc[:], hs[:], hk[:]), x[:nq])
    err_out[:] = ld.row_sum(jnp.abs(ee - goal))


@functools.partial(
    jax.jit,
    static_argnames=("timestep", "sub", "max_substeps", "gravity", "interpret"),
)
def plant_rollout_pallas(model: RobotModel, x, U_prev, goal0, offset_us,
                         sim_time_us, timestep: float, sub: float,
                         max_substeps: int, gravity: float = 0.0,
                         interpret: bool = None):
    """x (nx,), U_prev (N-1, nu), goal0 (6,) -> (x_new (nx,), err scalar)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    nx = x.shape[0]
    f32 = x.dtype
    kern = functools.partial(
        _rollout_kernel, nx // 2, float(timestep), float(sub),
        int(max_substeps), float(gravity),
    )
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    x_new, err = pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct((nx, 1), f32),
            jax.ShapeDtypeStruct((1, 1), f32),
        ),
        in_specs=[smem, smem] + [vmem] * 10,
        out_specs=(vmem, vmem),
        interpret=interpret,
    )(
        jnp.asarray(offset_us, f32).reshape(1),
        jnp.asarray(sim_time_us, f32).reshape(1),
        x[:, None], U_prev.T, goal0[:3, None],
        model.Xc, model.Xs, model.Xk, model.I,
        model.Hc, model.Hs, model.Hk,
    )
    return x_new[:, 0], err[0, 0]
