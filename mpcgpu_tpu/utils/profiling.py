"""Per-phase latency profiling.

The reference's tiered timing (reference include/common/settings.cuh:
109-118: TIME_LINSYS brackets the linear solve, FINE_GRAINED_TIMING the
KKT/Schur/dz/line-search phases, pcg/sqp.cuh:207-352) relies on host
timers between kernel launches.  Our solve is one fused XLA program, so
phase timing is done by jitting each stage separately and timing it at a
representative operating point -- same information, measured offline
instead of inside the control loop.
"""
from __future__ import annotations

import time
from typing import Dict

import jax
import jax.numpy as jnp

from mpcgpu_tpu.config import SolverConfig
from mpcgpu_tpu.models.robot import RobotModel


def _timeit(fn, reps: int = 30) -> float:
    out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e6


def stage_latencies(model: RobotModel, cfg: SolverConfig, X, U, goals, xs,
                    rho: float = 1e-3, pcg_exit_tol: float = 1e-9,
                    reps: int = 30) -> Dict[str, float]:
    """Microseconds per solver phase at the given operating point.

    Phases mirror the reference's fine-grained timers: kkt, schur,
    linsys (both the while_loop and the fused Pallas PCG), dz, and the
    8-candidate line search.
    """
    from mpcgpu_tpu.ops import merit as merit_ops
    from mpcgpu_tpu.ops.dz import compute_dz
    from mpcgpu_tpu.ops.kkt import form_kkt
    from mpcgpu_tpu.ops.pallas.pcg_kernel import pcg_pallas
    from mpcgpu_tpu.ops.pcg import pcg
    from mpcgpu_tpu.ops.schur import form_schur

    lam = jnp.zeros((cfg.knot_points, cfg.nx), X.dtype)
    alphas = (1.0 / 2 ** jnp.arange(cfg.num_alphas)).astype(X.dtype)

    kkt_fn = jax.jit(lambda X, U, xs: form_kkt(
        model, X, U, goals, xs, cfg.timestep, cfg.cost.qd_cost,
        cfg.cost.r_cost, cfg.integrator_type, cfg.gravity, cfg.cost.hessian))
    schur_fn = jax.jit(lambda kkt: form_schur(
        kkt, rho, preconditioned=cfg.pcg.preconditioned))
    pcg_fn = jax.jit(lambda sd, l: pcg(
        sd.S, sd.Pinv, sd.gamma, l, cfg.pcg.max_iter, pcg_exit_tol))
    interp = jax.default_backend() != "tpu"
    pal_fn = jax.jit(lambda sd, l: pcg_pallas(
        sd.S, sd.Pinv, sd.gamma, l, cfg.pcg.max_iter, pcg_exit_tol,
        interpret=interp))
    dz_fn = jax.jit(lambda kkt, sd, l: compute_dz(kkt, sd, l))
    ls_fn = jax.jit(lambda X, U, dX, dU, xs: merit_ops.line_search_merits(
        model, X, U, dX, dU, alphas, goals, xs, cfg.timestep, cfg.merit_mu,
        cfg.cost.qd_cost, cfg.cost.r_cost, cfg.integrator_type, cfg.gravity))

    kkt = kkt_fn(X, U, xs)
    sd = schur_fn(kkt)
    res = pcg_fn(sd, lam)
    dX, dU = dz_fn(kkt, sd, res.lam)

    return {
        "kkt_us": _timeit(lambda: kkt_fn(X, U, xs), reps),
        "schur_us": _timeit(lambda: schur_fn(kkt), reps),
        "pcg_while_loop_us": _timeit(lambda: pcg_fn(sd, lam), reps),
        "pcg_pallas_us": _timeit(lambda: pal_fn(sd, lam), reps),
        "dz_us": _timeit(lambda: dz_fn(kkt, sd, res.lam), reps),
        "line_search_us": _timeit(lambda: ls_fn(X, U, dX, dU, xs), reps),
        "pcg_iters": int(res.iters),
    }
