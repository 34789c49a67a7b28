"""Fused line-search merit evaluation: one Pallas kernel for all candidates.

The reference evaluates its 8 line-search candidates as 8 cooperative
kernels on 8 CUDA streams (reference include/pcg/sqp.cuh:327-344, kernel
include/common/merit.cuh:19-94).  The XLA version (ops/merit.py) vmaps
the candidates but still lowers to thousands of individually scheduled
small ops -- the dominant cost of an SQP iteration on TPU.  Here the
whole evaluation (tracking cost with end-effector FK, forward dynamics
via the articulated-body algorithm, L1 defects, initial-state violation)
runs as ONE kernel over a lane batch of A*N (candidate, knot) pairs using
the lane-batched dynamics in ops/pallas/lanedyn.py.

Batch order is candidate-major (b = a*N + k), so the x_{k+1} neighbor for
the defect is a single lane roll; the k = N-1 lanes are masked out.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mpcgpu_tpu.models.robot import RobotModel
from mpcgpu_tpu.ops.pallas import lanedyn


def _merit_kernel(nq: int, dt: float, mu: float, qd_cost: float,
                  r_cost: float, integrator_type: int, gravity: float,
                  wrap: bool, tracking: str, q_cost: float,
                  xc_ref, uc_ref, goals_ref, xs_ref, msk_last_ref, msk0_ref,
                  msk_valid_ref,
                  hx_c, hx_s, hx_k, xx_c, xx_s, xx_k, i_ref,
                  out_ref):
    Xc = xc_ref[:]                      # (nx, B) candidate states
    Uc = uc_ref[:]                      # (nu, B) candidate controls
    goals = goals_ref[:]                # (3, B) ee / (nx, B) joint refs
    xs = xs_ref[:]                      # (nx, 1)
    m_last = msk_last_ref[:]            # (1, B): 0 at k = N-1 lanes
    m0 = msk0_ref[:]                    # (1, B): 1 at k = 0 lanes
    m_valid = msk_valid_ref[:]          # (1, B): 0 on alignment padding

    q, qd = Xc[:nq], Xc[nq:]

    if tracking == "joint":
        # joint-space tracking (iiwa_plant.cuh:40-332)
        dq = q - goals[:nq]
        dqd = qd - goals[nq:]
        cost = 0.5 * q_cost * lanedyn.row_sum(dq * dq)
        cost += 0.5 * qd_cost * lanedyn.row_sum(dqd * dqd)
    else:
        # tracking cost (iiwa_eepos_plant.cuh:242-290)
        ee = lanedyn.fk_ee_xyz((hx_c[:], hx_s[:], hx_k[:]), q)
        err = ee - goals
        cost = 0.5 * lanedyn.row_sum(err * err)
        cost += 0.5 * qd_cost * lanedyn.row_sum(qd * qd)
    cost += m_last * 0.5 * r_cost * lanedyn.row_sum(Uc * Uc)

    # dynamics defect (integrator.cuh:24-57 with ABA forward dynamics)
    qdd = lanedyn.aba_qdd((xx_c[:], xx_s[:], xx_k[:]), i_ref[:], q, qd, Uc,
                          gravity)
    if integrator_type == 0:
        qn = q + dt * qd
        qdn = qd + dt * qdd
    else:
        qdn = qd + dt * qdd
        qn = q + dt * qdn
    if wrap:
        from mpcgpu_tpu.ops.pallas.kkt_schur_kernel import _wrap_lane

        qn = _wrap_lane(qn)
    f = jnp.concatenate([qn, qdn], axis=0)
    x_next = pltpu.roll(Xc, Xc.shape[1] - 1, axis=1)  # lane b+1 -> b
    defect = lanedyn.row_sum(jnp.abs(x_next - f)) * m_last

    # initial-state violation (merit.cuh:69-77)
    c0 = lanedyn.row_sum(jnp.abs(Xc - xs)) * m0

    out_ref[:] = (cost + mu * (defect + c0)) * m_valid


@functools.partial(
    jax.jit,
    static_argnames=("num_alphas", "dt", "mu", "qd_cost", "r_cost",
                     "integrator_type", "gravity", "wrap", "tracking",
                     "q_cost", "interpret"),
)
def line_search_merits_pallas(model: RobotModel, X, U, dX, dU, num_alphas: int,
                              goals, xs, dt: float, mu: float, qd_cost: float,
                              r_cost: float, integrator_type: int = 0,
                              gravity: float = 0.0, wrap: bool = False,
                              tracking: str = "eepos", q_cost: float = 1.0,
                              interpret: bool = None):
    """Merits of (X + a dX, U + a dU) for a = 1/2^i, i < num_alphas,
    plus the merit of the unstepped (X, U) appended as the last entry.

    goals: (N, >=3) ee trace for tracking="eepos", (N, nx) state refs for
    tracking="joint"."""
    if interpret is None:  # run interpreted off-TPU (tests on CPU)
        interpret = jax.default_backend() != "tpu"
    n, nx = X.shape
    nu = U.shape[1]
    nq = nx // 2
    alphas = jnp.concatenate(
        [(1.0 / 2 ** jnp.arange(num_alphas)).astype(X.dtype),
         jnp.zeros((1,), X.dtype)]
    )
    A = num_alphas + 1

    Upad = jnp.concatenate([U, jnp.zeros((1, nu), U.dtype)])
    dUpad = jnp.concatenate([dU, jnp.zeros((1, nu), U.dtype)])

    # candidate-major lane batch: b = a*N + k
    Xc = (X[None] + alphas[:, None, None] * dX[None])       # (A, N, nx)
    Uc = (Upad[None] + alphas[:, None, None] * dUpad[None])
    Xc = Xc.transpose(2, 0, 1).reshape(nx, A * n)
    Uc = Uc.transpose(2, 0, 1).reshape(nu, A * n)
    goals_l = goals.T if tracking == "joint" else goals[:, :3].T
    goals_rep = jnp.tile(goals_l, (1, A))

    k_idx = jnp.tile(jnp.arange(n), (A,))
    m_last = (k_idx < n - 1).astype(X.dtype)[None, :]
    m0 = (k_idx == 0).astype(X.dtype)[None, :]

    # pad the lane batch to a multiple of 128: Mosaic mishandles several
    # constructs at unaligned lane counts, and aligned tiles are faster.
    B = A * n
    Bp = -(-B // 128) * 128
    pad = Bp - B
    if pad:
        padv = lambda a: jnp.concatenate(
            [a, jnp.zeros((a.shape[0], pad), a.dtype)], axis=1)
        Xc, Uc, goals_rep = padv(Xc), padv(Uc), padv(goals_rep)
        m_last, m0 = padv(m_last), padv(m0)
    m_valid = jnp.concatenate(
        [jnp.ones((1, B), X.dtype), jnp.zeros((1, pad), X.dtype)], axis=1)

    kern = functools.partial(
        _merit_kernel, nq, float(dt), float(mu), float(qd_cost),
        float(r_cost), int(integrator_type), float(gravity),
        bool(wrap), str(tracking), float(q_cost),
    )
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    contrib = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((1, Bp), X.dtype),
        in_specs=[vmem] * 14,
        out_specs=vmem,
        interpret=interpret,
    )(
        Xc, Uc, goals_rep, xs[:, None], m_last, m0, m_valid,
        model.Hc, model.Hs, model.Hk, model.Xc, model.Xs, model.Xk, model.I,
    )
    return contrib[:, :B].reshape(A, n).sum(axis=1)  # (A,): candidates + base
