"""Closed-loop MPC simulation harness: solver-in-the-loop plant tracking.

TPU-native rebuild of ``simulateMPC`` (reference include/mpcsim.cuh:170-498):
the measured plant is integrated forward for exactly one control period
per solve, the horizon / end-effector goals / duals shift forward each
trajectory timestep, and end-effector tracking error is recorded at every
shift.  The outer control loop is host Python (as in the reference); every
device-side stage -- the SQP solve, the plant rollout, and the shift -- is
a single jitted call.

Replicated reference details:
  * warm-up: 100 pre-solves at tol 1e-11 / 10k PCG iters with the iterate
    reset to the precomputed trajectory each time; lam and rho persist
    (REMOVE_JITTERS, mpcsim.cuh:259-279).
  * plant rollout: 0.2 ms explicit-Euler substeps, each using the control
    active at its simulation clock within the *previous* plan, plus a
    fmod remainder substep (simple_simulate, include/common/integrator.cuh:
    296-325).
  * shift: trajectory roll with tail refill -- from the precomputed
    trajectory while within it (including the reference's tail-fill
    source index (nx+nu)*traj_offset - nu, mpcsim.cuh:362), else hold the
    goal pose with zero velocity/control (mpcsim.cuh:364-369).
  * measured-state re-injection x_0 <- xs after every update
    (mpcsim.cuh:394).
  * tracking error: L1 xyz error of ee(xs) vs the current first goal,
    recorded before each shift (mpcsim.cuh:346-354).
"""
from __future__ import annotations

import dataclasses
import time
from functools import partial
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mpcgpu_tpu.config import SolverConfig
from mpcgpu_tpu.models import dynamics as dyn
from mpcgpu_tpu.models.robot import RobotModel
from mpcgpu_tpu.sqp import sqp_solve


@dataclasses.dataclass
class MPCRecord:
    """Per-run statistics (the reference's .result dumps, mpcsim.cuh:59-138)."""

    tracking_errors: List[float] = dataclasses.field(default_factory=list)
    tracking_path: List[np.ndarray] = dataclasses.field(default_factory=list)
    sqp_iters: List[int] = dataclasses.field(default_factory=list)
    sqp_times_us: List[float] = dataclasses.field(default_factory=list)
    sqp_exits: List[bool] = dataclasses.field(default_factory=list)
    pcg_iters: List[int] = dataclasses.field(default_factory=list)
    pcg_exits: List[bool] = dataclasses.field(default_factory=list)
    # per-update phase latencies, populated in fine_grained_timing mode
    # (reference FINE_GRAINED_TIMING dumps, mpcsim.cuh:108-113)
    kkt_times_us: List[float] = dataclasses.field(default_factory=list)
    schur_times_us: List[float] = dataclasses.field(default_factory=list)
    linsys_times_us: List[float] = dataclasses.field(default_factory=list)
    dz_times_us: List[float] = dataclasses.field(default_factory=list)
    line_search_times_us: List[float] = dataclasses.field(default_factory=list)
    # per update in linsys="auto" mode: True where the bcr_pcg failover
    # backend ran (the rho-bail-rate monitor had latched)
    failed_over: List[bool] = dataclasses.field(default_factory=list)
    # per-update relative Schur-dual residual ||gamma - S lam||/||gamma||
    # at the returned iterate (simulate_mpc(record_dual_residual=True);
    # the cap-exit-rate honesty metric -- see _dual_residual)
    dual_residuals: List[float] = dataclasses.field(default_factory=list)
    final_tracking_error: float = float("nan")
    control_updates: int = 0
    timesteps: int = 0

    def summary(self) -> dict:
        te = np.asarray(self.tracking_errors, np.float64)
        st = np.asarray(self.sqp_times_us, np.float64)
        pi = np.asarray(self.pcg_iters, np.float64)
        return {
            "avg_tracking_error": float(te.mean()) if te.size else float("nan"),
            "max_tracking_error": float(te.max()) if te.size else float("nan"),
            "final_tracking_error": self.final_tracking_error,
            "avg_sqp_time_us": float(st.mean()) if st.size else float("nan"),
            "p50_sqp_time_us": float(np.median(st)) if st.size else float("nan"),
            "p95_sqp_time_us": float(np.percentile(st, 95)) if st.size else float("nan"),
            "avg_pcg_iters": float(pi.mean()) if pi.size else float("nan"),
            "pcg_max_exit_rate": (
                float(np.mean(self.pcg_exits)) if self.pcg_exits else float("nan")
            ),
            "control_updates": self.control_updates,
            "timesteps": self.timesteps,
            **({"dual_residual_p50": float(np.median(self.dual_residuals)),
                "dual_residual_p90": float(np.percentile(
                    self.dual_residuals, 90)),
                "dual_residual_max": float(np.max(self.dual_residuals))}
               if self.dual_residuals else {}),
        }


def _plant_rollout(model: RobotModel, cfg: SolverConfig, x, U_prev,
                   offset_us, sim_time_us, max_substeps: int):
    """Integrate the measured plant for sim_time_us microseconds.

    Mirrors simple_simulate (integrator.cuh:296-325): fixed 0.2 ms substeps
    (always explicit Euler) choosing, per substep, the control active at the
    simulation clock inside the previous plan, then a remainder substep.
    A zero-dt substep is the identity, so inactive substeps integrate with
    dt = 0 instead of branching.
    """
    sub = jnp.asarray(cfg.sim_step_time, x.dtype)
    t0 = offset_us * 1e-6
    total = sim_time_us * 1e-6
    n_steps = jnp.floor(total / sub).astype(jnp.int32)
    n_ctrl = U_prev.shape[0]

    def substep(s, x):
        active = (s < n_steps).astype(x.dtype)
        t = t0 + s * sub
        idx = jnp.clip((t / cfg.timestep).astype(jnp.int32), 0, n_ctrl - 1)
        u = U_prev[idx]
        nq = x.shape[0] // 2
        qdd = dyn.forward_dynamics(model, x[:nq], x[nq:], u, cfg.gravity)
        dxdt = jnp.concatenate([x[nq:], qdd])
        return x + active * sub * dxdt

    x = jax.lax.fori_loop(0, max_substeps, substep, x)

    # remainder substep with the control of the last full substep
    rem = jnp.mod(total, sub)
    t_last = t0 + jnp.maximum(n_steps - 1, 0) * sub
    idx = jnp.clip((t_last / cfg.timestep).astype(jnp.int32), 0, n_ctrl - 1)
    u = U_prev[idx]
    nq = x.shape[0] // 2
    qdd = dyn.forward_dynamics(model, x[:nq], x[nq:], u, cfg.gravity)
    return x + rem * jnp.concatenate([x[nq:], qdd])


def _shift_horizon(X, U, goals, lam, xu_traj, ee_traj, traj_offset,
                   traj_steps=None):
    """One horizon shift with tail refill (mpcsim.cuh:343-387).

    traj_offset is the *already incremented* trajectory index.
    traj_steps: logical trajectory length; defaults to the array length.
    Passing it as a traced scalar lets differently-long recorded
    trajectories share ONE compiled program (pad the arrays to a common
    static shape, pass the true length here) -- the all-pairs study would
    otherwise re-jit per fixture.
    """
    n = X.shape[0]
    nx, nu = X.shape[1], U.shape[1]
    if traj_steps is None:
        traj_steps = xu_traj.shape[0]
    within = traj_offset + n < traj_steps

    X = jnp.roll(X, -1, axis=0)
    U = jnp.roll(U, -1, axis=0)
    # within-trajectory tail fill uses the reference's source index
    # (nx+nu)*traj_offset - nu -> [u_{off-1}, x_{off}] (mpcsim.cuh:362)
    src = jnp.clip(traj_offset, 1, traj_steps - 1)
    x_fill_in = xu_traj[src, :nx]
    u_fill_in = xu_traj[src - 1, nx:]
    # goal-hold fill: goal position, zero velocity, zero control
    x_goal = xu_traj[traj_steps - 1, :nx]
    x_fill_out = jnp.concatenate([x_goal[: nx // 2], jnp.zeros(nx // 2, X.dtype)])
    X = X.at[-1].set(jnp.where(within, x_fill_in, x_fill_out))
    U = U.at[-1].set(jnp.where(within, u_fill_in, jnp.zeros(nu, U.dtype)))

    goals = jnp.roll(goals, -1, axis=0)
    gsrc = jnp.clip(traj_offset + n - 1, 0, traj_steps - 1)
    goals = goals.at[-1].set(ee_traj[gsrc])

    # lam shifts with the horizon, last entry duplicated (mpcsim.cuh:383)
    lam = jnp.roll(lam, -1, axis=0).at[-1].set(lam[-1])
    return X, U, goals, lam


def _tracking_error(model: RobotModel, xs, goal0):
    nq = xs.shape[0] // 2
    ee = dyn.ee_pos(model, xs[:nq])
    return jnp.abs(ee[:3] - goal0[:3]).sum()


@partial(jax.jit, static_argnames=("cfg",))
def _dual_residual(model: RobotModel, cfg: SolverConfig, X, U, lam, goals,
                   xs, rho):
    """Backward-error dual residual at the returned iterate:
    ``||gamma - S lam|| / (||S||_F ||lam|| + ||gamma||)`` with (S, gamma)
    re-formed at (X, U, rho).  Measures how well the carried duals
    satisfy the NEW linearization -- the warm-start quality the next
    solve inherits -- with the standard backward-error normalization
    (the naive ||r||/||gamma|| blows up near convergence, where gamma
    itself goes to zero while lam keeps its scale).

    The honest counterweight to the PCG cap-exit rate (the reference
    warns at a >50% cap-exit rate, mpcsim.cuh:436-441; the TPU-retuned
    cap runs at 85-92%).  Diagnostic-only: never part of the solver's
    hot program."""
    from mpcgpu_tpu.ops.btridiag import spmv
    from mpcgpu_tpu.ops.kkt import form_kkt
    from mpcgpu_tpu.ops.schur import form_schur

    kkt = form_kkt(model, X, U, goals, xs, cfg.timestep,
                   cfg.cost.qd_cost, cfg.cost.r_cost, cfg.integrator_type,
                   cfg.gravity, cfg.cost.hessian, cfg.angle_wrap,
                   cfg.cost.tracking, cfg.cost.q_cost)
    sch = form_schur(kkt, rho, preconditioned=False)
    r = sch.gamma - spmv(sch.S, lam)
    s_f = jnp.sqrt(jnp.sum(sch.S.lower ** 2) + jnp.sum(sch.S.diag ** 2)
                   + jnp.sum(sch.S.upper ** 2))
    denom = s_f * jnp.linalg.norm(lam) + jnp.linalg.norm(sch.gamma)
    return jnp.linalg.norm(r) / jnp.maximum(
        denom, jnp.asarray(1e-30, sch.gamma.dtype))


def _rollout_and_error(model: RobotModel, cfg: SolverConfig, xs, U_prev,
                       goals, offset_us, sim_time_us, max_substeps: int):
    """Plant rollout + tracking-error probe; fused Pallas kernel when the
    solver runs fused stages (one kernel instead of ~10 sequential tiny
    ABA evaluations)."""
    if cfg.pallas_stages:  # rollout batch is 1 lane; no large-N concern
        from mpcgpu_tpu.ops.pallas.rollout_kernel import plant_rollout_pallas

        return plant_rollout_pallas(
            model, xs, U_prev, goals[0], offset_us, sim_time_us,
            cfg.timestep, cfg.sim_step_time, max_substeps, cfg.gravity,
        )
    xs = _plant_rollout(model, cfg, xs, U_prev,
                        jnp.asarray(offset_us, xs.dtype),
                        jnp.asarray(sim_time_us, xs.dtype), max_substeps)
    return xs, _tracking_error(model, xs, goals[0])


@partial(jax.jit, static_argnames=("cfg", "max_substeps"))
def _mpc_update(model: RobotModel, cfg: SolverConfig, xs, X, U, goals, lam,
                U_prev, xu_traj, ee_traj, traj_offset, offset_us, sim_time_us,
                do_shift, max_substeps: int):
    """Everything between two solves in ONE device dispatch: plant rollout,
    tracking-error probe, optional horizon shift, measured-state
    re-injection.  A single jit call per control update matters on remote-
    attached TPUs, where each eager op / host->device upload costs
    milliseconds while a jitted dispatch costs microseconds.
    """
    xs, err = _rollout_and_error(model, cfg, xs, U_prev, goals, offset_us,
                                 sim_time_us, max_substeps)

    Xs, Us, Gs, Ls = _shift_horizon(X, U, goals, lam, xu_traj, ee_traj,
                                    traj_offset)
    sel = lambda a, b: jnp.where(do_shift, a, b)
    X, U, goals, lam = sel(Xs, X), sel(Us, U), sel(Gs, goals), sel(Ls, lam)

    X = X.at[0].set(xs)  # measured-state re-injection (mpcsim.cuh:394)
    return xs, X, U, goals, lam, err


def simulate_mpc(
    model: RobotModel,
    cfg: SolverConfig,
    xu_traj: np.ndarray,
    ee_traj: np.ndarray,
    *,
    pcg_exit_tol: float,
    linsys: str = "pcg",
    max_control_updates: int = 100000,
    max_timesteps: Optional[int] = None,
    warmup_iters: int = 100,
    const_update_freq: bool = True,
    fine_grained_timing: bool = False,
    record_dual_residual: bool = False,
    verbose: bool = False,
) -> MPCRecord:
    """Track a precomputed trajectory with the SQP solver in the loop.

    fine_grained_timing=True runs each solver phase as a separately
    jitted, hard-synced dispatch and records per-update KKT / Schur /
    linsys / dz / line-search latencies in the MPCRecord (the reference's
    FINE_GRAINED_TIMING build, pcg/sqp.cuh:38-40; per-dispatch overhead
    included, so use it for relative phase breakdowns).
    """
    n = cfg.knot_points
    nx, nu = cfg.nx, cfg.nu
    traj_steps = xu_traj.shape[0] if max_timesteps is None else min(
        xu_traj.shape[0], max_timesteps
    )
    dtype = cfg.jax_dtype  # USE_DOUBLES parity knob (settings.cuh:49-57)

    xu_traj_j = jnp.asarray(xu_traj, dtype)
    ee_traj_j = jnp.asarray(ee_traj, dtype)

    X = jnp.asarray(xu_traj[:n, :nx], dtype)
    U = jnp.asarray(xu_traj[: n - 1, nx:], dtype)
    goals = jnp.asarray(ee_traj[:n], dtype)
    xs = X[0]
    lam = jnp.zeros((n, nx), dtype)
    rho = jnp.asarray(cfg.rho_init, dtype)

    X0, U0 = X, U

    # linsys="auto": start on the tracking-grade pcg backend and fail
    # over to bcr_pcg when BOTH the rho-bail-rate EMA and the tracking-
    # error EMA trip (the error-gated pair-1_0 operational rule; see
    # simulate_mpc_scan's body_auto for the device-resident twin of
    # this host-level monitor, and SolverConfig on why bails alone
    # don't separate hostile from healthy pairs).
    auto = linsys == "auto"
    cur_linsys = "pcg" if auto else linsys
    bail_ema, err_ema, failed = 0.0, 0.0, False

    # ---- warm-up (REMOVE_JITTERS, mpcsim.cuh:259-279): also compiles.
    if warmup_iters > 0:
        warm_cfg = dataclasses.replace(
            cfg, pcg=dataclasses.replace(cfg.pcg, max_iter=10000)
        )
        for _ in range(warmup_iters):
            res = sqp_solve(model, warm_cfg, X, U, lam, goals, xs, rho,
                            jnp.asarray(1e-11, dtype), cur_linsys)
            lam, rho = res.lam, res.rho
            X, U = X0, U0
        rho = jnp.asarray(cfg.rho_init, dtype)
        # cfg is a static jit arg, so the warm_cfg solves compiled a
        # different executable than the measured loop; compile + warm the
        # measured executable too so the first timed update isn't a
        # compile (the reference's REMOVE_JITTERS warms the exact kernels
        # it measures).
        res = sqp_solve(model, cfg, X, U, lam, goals, xs, rho,
                        jnp.asarray(pcg_exit_tol, dtype), cur_linsys)
        np.asarray(res.stats.final_merit)  # hard sync (see CLAUDE.md)
        if fine_grained_timing:
            # the fine-grained mode dispatches separately-jitted phases;
            # compile them before the timed loop as well
            from mpcgpu_tpu.sqp import sqp_solve_fine_grained

            sqp_solve_fine_grained(model, cfg, X, U, lam, goals, xs, rho,
                                   jnp.asarray(pcg_exit_tol, dtype), cur_linsys)

    max_substeps = max(
        1, int(np.ceil(cfg.simulation_period_us * 1e-6 / cfg.sim_step_time)) + 1
    )

    rec = MPCRecord()
    rec.tracking_path.append(np.asarray(xs))
    tol_j = jnp.asarray(pcg_exit_tol, dtype)

    time_since_timestep = 0.0
    shifted = False
    traj_offset = 0
    prev_sim_time = 0.0
    U_prev = U  # previous plan's controls (xu_old)

    for update in range(max_control_updates):
        if traj_offset >= traj_steps:
            break

        t0 = time.perf_counter()
        if fine_grained_timing:
            from mpcgpu_tpu.sqp import sqp_solve_fine_grained

            res, phase_times = sqp_solve_fine_grained(
                model, cfg, X, U, lam, goals, xs, rho, tol_j, cur_linsys)
            rec.kkt_times_us.append(sum(phase_times["kkt"]))
            rec.schur_times_us.append(sum(phase_times["schur"]))
            rec.linsys_times_us.append(sum(phase_times["linsys"]))
            rec.dz_times_us.append(sum(phase_times["dz"]))
            rec.line_search_times_us.append(sum(phase_times["line_search"]))
        else:
            res = sqp_solve(model, cfg, X, U, lam, goals, xs, rho, tol_j,
                            cur_linsys)
        # block_until_ready is not a hard sync on the remote-tunneled TPU
        # (CLAUDE.md); force the sync with a scalar fetch before timing.
        np.asarray(res.stats.final_merit)
        solve_us = (time.perf_counter() - t0) * 1e6
        X, U, lam, rho = res.X, res.U, res.lam, res.rho
        if record_dual_residual:
            # at the returned iterate, with the pre-update goals/xs the
            # solve saw (diagnostic dispatch, outside the timed region)
            rec.dual_residuals.append(float(_dual_residual(
                model, cfg, X, U, lam, goals, xs, rho)))

        sim_time = cfg.simulation_period_us if const_update_freq else solve_us

        do_shift = not shifted and (
            time_since_timestep + sim_time * 1e-6
            > cfg.shift_threshold_fraction * cfg.timestep
        )
        time_since_timestep += sim_time * 1e-6
        if do_shift:
            traj_offset += 1
            shifted = True
        if time_since_timestep > cfg.timestep:
            shifted = False
            time_since_timestep = float(np.fmod(time_since_timestep, cfg.timestep))

        U_post_solve = U  # xu_old snapshot precedes the shift (mpcsim.cuh:337)
        xs, X, U, goals, lam, err = _mpc_update(
            model, cfg, xs, X, U, goals, lam, U_prev, xu_traj_j, ee_traj_j,
            traj_offset, prev_sim_time, sim_time, do_shift, max_substeps,
        )
        U_prev = U_post_solve
        if do_shift:
            rec.tracking_errors.append(float(err))
        prev_sim_time = sim_time

        # record stats
        stats = res.stats
        iters = np.asarray(stats.pcg_iters)
        rec.pcg_iters.extend(int(i) for i in iters[iters >= 0])
        rec.pcg_exits.extend(
            bool(b) for b in np.asarray(stats.pcg_hit_max)[iters >= 0]
        )
        rec.sqp_iters.append(int(stats.sqp_iters))
        rec.sqp_times_us.append(solve_us)
        rec.sqp_exits.append(bool(stats.rho_bailed))
        rec.tracking_path.append(np.asarray(xs))
        if auto:
            rec.failed_over.append(failed)
            if not failed:
                d = cfg.failover_ema_decay
                bail_ema = d * bail_ema + (1.0 - d) * float(stats.rho_bailed)
                err_ema = d * err_ema + (1.0 - d) * float(err)
                if (bail_ema > cfg.failover_bail_rate
                        and err_ema > cfg.failover_err_threshold_m):
                    failed = True
                    cur_linsys = "bcr_pcg"
                    if verbose:
                        print(f"update {update}: rho-bail EMA "
                              f"{bail_ema:.3f} > {cfg.failover_bail_rate} "
                              f"and err EMA {err_ema:.3f} > "
                              f"{cfg.failover_err_threshold_m} "
                              f"-- failing over to bcr_pcg")

        if verbose and update % 200 == 0:
            print(
                f"update {update}: traj_offset {traj_offset}/{traj_steps} "
                f"solve {solve_us:.0f}us sqp_iters {int(stats.sqp_iters)} "
                f"err {rec.tracking_errors[-1] if rec.tracking_errors else float('nan'):.4f}"
            )

    rec.final_tracking_error = float(
        jax.jit(_tracking_error)(model, xs, goals[0])
    )
    rec.control_updates = rec.control_updates or len(rec.sqp_times_us)
    rec.timesteps = traj_offset

    # PCG max-iter exit-rate self-diagnostic (reference mpcsim.cuh:436-441)
    if rec.pcg_exits:
        exit_rate = float(np.mean(rec.pcg_exits))
        if exit_rate > 0.5:
            print(
                f"WARNING: PCG hit its max-iteration cap in "
                f"{100.0 * exit_rate:.1f}% of solves "
                f"(exit tol {pcg_exit_tol:g}, max_iter {cfg.pcg.max_iter}); "
                f"results may be unreliable"
            )
    return rec


# ---------------------------------------------------------------------------
# Device-resident closed loop: the whole tracking run as ONE XLA program.
# ---------------------------------------------------------------------------

def make_shift_schedule(cfg: SolverConfig, n_updates: int):
    """Precompute the (deterministic, constant-period) shift pattern.

    Replays the reference's host-side clock logic (mpcsim.cuh:340-393) for
    CONST_UPDATE_FREQ mode: returns (do_shift bool (n_updates,),
    traj_offset int32 (n_updates,)) where traj_offset is the
    already-incremented trajectory index at each update.
    """
    do_shift = np.zeros(n_updates, bool)
    offsets = np.zeros(n_updates, np.int32)
    t_since, shifted, off = 0.0, False, 0
    thresh = cfg.shift_threshold_fraction * cfg.timestep
    for i in range(n_updates):
        step = cfg.simulation_period_us * 1e-6
        if not shifted and t_since + step > thresh:
            off += 1
            do_shift[i] = True
            shifted = True
        t_since += step
        if t_since > cfg.timestep:
            shifted = False
            t_since = float(np.fmod(t_since, cfg.timestep))
        offsets[i] = off
    return jnp.asarray(do_shift), jnp.asarray(offsets)


@partial(jax.jit, static_argnames=("cfg", "n_updates", "linsys"))
def simulate_mpc_scan(model: RobotModel, cfg: SolverConfig, xu_traj, ee_traj,
                      X, U, lam, rho, pcg_exit_tol, n_updates: int,
                      linsys: str = "pcg", traj_len=None):
    """Closed-loop tracking entirely on device: a lax.scan over control
    updates (solve -> plant rollout -> optional shift -> re-injection),
    with per-update statistics accumulated as scan outputs.

    One dispatch for the whole run -- the TPU-native shape of the
    reference's host loop (mpcsim.cuh:286-451), and the configuration for
    throughput/latency measurement where no host round-trip separates
    control updates.  Constant-update-period mode only (the shift schedule
    must be precomputable).

    traj_len: optional traced logical trajectory length (see
    _shift_horizon) -- pad xu_traj/ee_traj to a shared static shape and
    pass the true length to reuse one compiled program across fixtures.
    """
    n = cfg.knot_points
    do_shift, offsets = make_shift_schedule(cfg, n_updates)
    goals0 = jax.lax.dynamic_slice_in_dim(ee_traj, 0, n, axis=0)
    xs0 = X[0]
    max_substeps = max(
        1, int(np.ceil(cfg.simulation_period_us * 1e-6 / cfg.sim_step_time)) + 1
    )
    period = cfg.simulation_period_us

    def _post_solve(res, xs, goals, U_prev, first, shift_now, off):
        """Rollout + shift + re-injection shared by the fixed-backend and
        auto-failover scan bodies (identical traced ops either way)."""
        X, U, lam, rho = res.X, res.U, res.lam, res.rho

        offset_us = jnp.where(first, 0.0, period)
        xs, err = _rollout_and_error(model, cfg, xs, U_prev, goals,
                                     offset_us, period, max_substeps)
        U_prev = U  # pre-shift plan snapshot (mpcsim.cuh:337)

        Xs, Us, Gs, Ls = _shift_horizon(X, U, goals, lam, xu_traj, ee_traj,
                                        off, traj_len)
        sel = lambda a, b: jnp.where(shift_now, a, b)
        X, U, goals, lam = sel(Xs, X), sel(Us, U), sel(Gs, goals), sel(Ls, lam)
        X = X.at[0].set(xs)

        out = (err, shift_now, res.stats.sqp_iters,
               jnp.sum(jnp.where(res.stats.pcg_iters >= 0,
                                 res.stats.pcg_iters, 0)),
               jnp.sum(res.stats.pcg_hit_max), res.stats.rho_bailed, xs)
        return (xs, X, U, goals, lam, rho, U_prev), out

    def body(carry, inputs):
        xs, X, U, goals, lam, rho, U_prev, first = carry
        shift_now, off = inputs

        res = sqp_solve(model, cfg, X, U, lam, goals, xs, rho,
                        pcg_exit_tol, linsys)
        (xs, X, U, goals, lam, rho, U_prev), out = _post_solve(
            res, xs, goals, U_prev, first, shift_now, off)
        return (xs, X, U, goals, lam, rho, U_prev, jnp.bool_(False)), out

    def body_auto(carry, inputs):
        # error-gated rho-bail failover (the pair-1_0 operational rule,
        # RESULTS.md): solve with "pcg" until BOTH the bail-rate EMA and
        # the tracking-error EMA trip their thresholds, then latch onto
        # the exact-dual "bcr_pcg" backend.  The error gate keeps healthy
        # trajectories (which also bail sporadically but track well) on
        # the tracking-grade pcg backend -- see SolverConfig.
        # Both branch solvers return the same SQPResult pytree, so
        # lax.cond runs exactly one per update.
        (xs, X, U, goals, lam, rho, U_prev, first, ema, err_ema,
         failed) = carry
        shift_now, off = inputs

        used_bcr = failed
        ops = (X, U, lam, goals, xs, rho)
        res = jax.lax.cond(
            failed,
            lambda o: sqp_solve(model, cfg, o[0], o[1], o[2], o[3], o[4],
                                o[5], pcg_exit_tol, "bcr_pcg"),
            lambda o: sqp_solve(model, cfg, o[0], o[1], o[2], o[3], o[4],
                                o[5], pcg_exit_tol, "pcg"),
            ops)
        (xs, X, U, goals, lam, rho, U_prev), out = _post_solve(
            res, xs, goals, U_prev, first, shift_now, off)

        d = cfg.failover_ema_decay
        bail = res.stats.rho_bailed.astype(ema.dtype)
        ema = d * ema + (1.0 - d) * bail
        err_ema = d * err_ema + (1.0 - d) * out[0].astype(err_ema.dtype)
        failed = jnp.logical_or(
            failed,
            jnp.logical_and(ema > cfg.failover_bail_rate,
                            err_ema > cfg.failover_err_threshold_m))
        return (xs, X, U, goals, lam, rho, U_prev, jnp.bool_(False),
                ema, err_ema, failed), out + (used_bcr,)

    def _auto_step(backend: str):
        """One auto-mode update with a FIXED backend: solve + post-solve +
        EMA bookkeeping + per-update trip detection (no cond)."""
        def step(c, inp):
            (xs, X, U, goals, lam, rho, U_prev, first, ema, err_ema,
             tripped) = c
            shift_now, off = inp
            res = sqp_solve(model, cfg, X, U, lam, goals, xs, rho,
                            pcg_exit_tol, backend)
            (xs, X, U, goals, lam, rho, U_prev), out = _post_solve(
                res, xs, goals, U_prev, first, shift_now, off)
            d = cfg.failover_ema_decay
            bail = res.stats.rho_bailed.astype(ema.dtype)
            ema = d * ema + (1.0 - d) * bail
            err_ema = d * err_ema + (1.0 - d) * out[0].astype(err_ema.dtype)
            tripped = jnp.logical_or(
                tripped,
                jnp.logical_and(ema > cfg.failover_bail_rate,
                                err_ema > cfg.failover_err_threshold_m))
            return (xs, X, U, goals, lam, rho, U_prev, jnp.bool_(False),
                    ema, err_ema, tripped), out
        return step

    def body_auto_chunked(carry, inputs):
        # Chunked latch (SolverConfig.failover_check_every): ONE lax.cond
        # selects the backend for a whole chunk of updates, run as an
        # inner fixed-backend scan -- the cond's per-invocation overhead
        # amortizes over the chunk.  Trip detection stays per-update
        # (the inner scan accumulates any mid-chunk threshold crossing);
        # the switch applies from the next chunk boundary.
        (xs, X, U, goals, lam, rho, U_prev, first, ema, err_ema,
         failed) = carry
        shifts, offs = inputs       # each (failover_check_every,)
        inner = (xs, X, U, goals, lam, rho, U_prev, first, ema, err_ema,
                 jnp.bool_(False))
        inner, outs = jax.lax.cond(
            failed,
            lambda c: jax.lax.scan(_auto_step("bcr_pcg"), c, (shifts, offs)),
            lambda c: jax.lax.scan(_auto_step("pcg"), c, (shifts, offs)),
            inner)
        (xs, X, U, goals, lam, rho, U_prev, first, ema, err_ema,
         tripped) = inner
        used = jnp.broadcast_to(failed, shifts.shape)  # backend this chunk
        failed = jnp.logical_or(failed, tripped)
        return (xs, X, U, goals, lam, rho, U_prev, first, ema, err_ema,
                failed), outs + (used,)

    chunk = cfg.failover_check_every
    if linsys == "auto" and chunk > 1 and n_updates % chunk == 0:
        init = (xs0, X, U, goals0, lam, rho, U, jnp.bool_(True),
                jnp.zeros((), X.dtype), jnp.zeros((), X.dtype),
                jnp.bool_(False))
        sh_c = do_shift.reshape(-1, chunk)
        of_c = offsets.reshape(-1, chunk)
        carry, outs = jax.lax.scan(body_auto_chunked, init, (sh_c, of_c))
        outs = jax.tree.map(
            lambda a: a.reshape((n_updates,) + a.shape[2:]), outs)
        errs, shifted, sqp_iters, pcg_iters, pcg_hits, bails, path, fo = outs
    elif linsys == "auto":
        init = (xs0, X, U, goals0, lam, rho, U, jnp.bool_(True),
                jnp.zeros((), X.dtype), jnp.zeros((), X.dtype),
                jnp.bool_(False))
        carry, outs = jax.lax.scan(body_auto, init, (do_shift, offsets))
        errs, shifted, sqp_iters, pcg_iters, pcg_hits, bails, path, fo = outs
    else:
        init = (xs0, X, U, goals0, lam, rho, U, jnp.bool_(True))
        carry, outs = jax.lax.scan(body, init, (do_shift, offsets))
        errs, shifted, sqp_iters, pcg_iters, pcg_hits, bails, path = outs
        fo = None
    res = {
        "tracking_errors": errs,
        "shifted": shifted,
        "sqp_iters": sqp_iters,
        "pcg_iters_total": pcg_iters,
        "pcg_hit_max_total": pcg_hits,
        "rho_bailed": bails,
        "tracking_path": path,
        "final_xs": carry[0],
    }
    if fo is not None:
        res["failed_over"] = fo  # per update: True where bcr_pcg ran
    return res


@partial(jax.jit, static_argnames=("cfg", "n_updates", "linsys", "batch"))
def simulate_mpc_scan_batched(model: RobotModel, cfg: SolverConfig, xu_traj,
                              ee_traj, X, U, lam, rho, pcg_exit_tol,
                              n_updates: int, linsys: str = "pcg",
                              batch: int = 8, seed: int = 0):
    """Throughput configuration: B independent arms tracked concurrently
    on one chip -- jax.vmap over the whole device-resident closed loop.

    The reference is a latency design (one arm, one GPU, persistent
    kernels, include/pcg/sqp.cuh:275); the TPU-native complement is
    batch throughput: the same compiled scan serves B problem instances,
    each an independently perturbed start state of the recorded
    figure-eight.  Returns the per-instance stats stacked on a leading
    batch axis.

    Uses the portable (pure-XLA) stage path: the fused Pallas kernels
    pass per-solve scalars in (1,)-shaped SMEM operands, which jax.vmap
    turns into (B,1) blocked specs Mosaic rejects -- and per-arm rho
    evolution needs per-arm scalars anyway.  Batch-grid variants of the
    stage kernels are the follow-up for real-time multi-arm; this mode
    is the simulation/training-throughput configuration, where large B
    amortizes the portable path's small-op overhead.
    """
    if cfg.pallas_stages:
        cfg = dataclasses.replace(cfg, pallas_stages=False)
    key = jax.random.PRNGKey(seed)
    # distinct instances: small joint-space perturbations of the initial
    # plan (the plant re-injects from xs = X[0], so perturbing X[0]
    # perturbs the whole rollout)
    dq = 0.02 * jax.random.normal(key, (batch, cfg.nq), X.dtype)
    Xb = jnp.broadcast_to(X, (batch,) + X.shape)
    Xb = Xb.at[:, 0, :cfg.nq].add(dq)
    Ub = jnp.broadcast_to(U, (batch,) + U.shape)
    lamb = jnp.broadcast_to(lam, (batch,) + lam.shape)

    run = lambda Xi, Ui, li: simulate_mpc_scan(
        model, cfg, xu_traj, ee_traj, Xi, Ui, li, rho, pcg_exit_tol,
        n_updates, linsys)
    return jax.vmap(run)(Xb, Ub, lamb)


@partial(jax.jit, static_argnames=("cfg", "n_updates", "batch"))
def simulate_mpc_scan_packed(model: RobotModel, cfg: SolverConfig, xu_traj,
                             ee_traj, X, U, lam, rho, pcg_exit_tol,
                             n_updates: int, batch: int = 2, seed: int = 0):
    """Real-time multi-arm: B arms PACKED into one lane batch, solved by
    the arm-packed whole-solve megakernel (ONE Pallas dispatch per
    control update for all B arms).

    This is the batch-grid fix the vmap route couldn't deliver
    (results/round3/batched_throughput.json): one v5e chip is one
    TensorCore, so on-chip multi-arm throughput is lane fill -- at N=64 a
    single arm uses 64 of 128 lanes; B=2 packs two arms into the idle
    half and runs both for ~the price of one.  B*N <= 128 runs
    single-tile; any B*N that is a multiple of 128 engages the
    multi-tile packed megakernel (round 4: per-knot stages tile
    in-kernel over 128-lane slices).

    All arms track the same recorded trajectory from independently
    perturbed start states (same instance construction as
    simulate_mpc_scan_batched); the shift schedule, goals, and refill
    source are shared, while xs/X/U/lam/rho evolve per arm.  Plant
    rollout runs as B unrolled fused rollout-kernel calls (the round-3
    glue fix -- vmapping the portable rollout cost ~350 us/update);
    the horizon shift is vmapped XLA glue (cheap).

    Returns per-update stats with a leading (B,) axis for tracking
    errors and per-arm SQP iterations.
    """
    n = cfg.knot_points
    nx, nu = cfg.state_size, cfg.nu
    assert batch * n <= 128 or (batch * n) % 128 == 0, (
        "packed lane width must be <= 128 or a multiple of 128 "
        "(multi-tile packing tiles the per-knot stage in-kernel)")

    from mpcgpu_tpu.ops.pallas.sqp_megakernel import sqp_solve_mega_pcg_packed

    key = jax.random.PRNGKey(seed)
    dq = 0.02 * jax.random.normal(key, (batch, cfg.nq), X.dtype)
    Xb = jnp.broadcast_to(X, (batch,) + X.shape)
    Xb = Xb.at[:, 0, :cfg.nq].add(dq)
    Ub = jnp.broadcast_to(U, (batch,) + U.shape)
    lamb = jnp.broadcast_to(lam, (batch,) + lam.shape)
    rho_b = jnp.full((batch,), rho, X.dtype)

    do_shift, offsets = make_shift_schedule(cfg, n_updates)
    goals0 = jax.lax.dynamic_slice_in_dim(ee_traj, 0, n, axis=0)
    xs0_b = Xb[:, 0]
    max_substeps = max(
        1, int(np.ceil(cfg.simulation_period_us * 1e-6 / cfg.sim_step_time)) + 1
    )
    period = cfg.simulation_period_us

    pack = lambda Ab: jnp.reshape(jnp.transpose(Ab, (2, 0, 1)), (-1, batch * n))
    unpack = lambda Al: jnp.transpose(
        jnp.reshape(Al, (Al.shape[0], batch, n)), (1, 2, 0))

    def body(carry, inputs):
        xs_b, Xb, Ub, goals, lam_b, rho_b, Uprev_b, first = carry
        shift_now, off = inputs

        # ---- pack B arms into the lane batch and run ONE packed solve
        Xl = pack(Xb)
        Ul = pack(jnp.concatenate(
            [Ub, jnp.zeros((batch, 1, nu), Ub.dtype)], axis=1))
        laml = pack(lam_b)
        g_arm = goals.T if cfg.cost.tracking == "joint" else goals[:, :3].T
        goals_l = jnp.tile(g_arm, (1, batch))
        xs_l = jnp.repeat(xs_b.T, n, axis=1)
        rho_l = jnp.repeat(rho_b, n)[None]
        drho_l = jnp.ones_like(rho_l)

        (Xn_l, Un_l, lam_l, rho_l_n, _merit_l, itc_l, bailed_l,
         pcg_tot) = sqp_solve_mega_pcg_packed(
            model, Xl, Ul, goals_l, xs_l, laml, rho_l, drho_l,
            cfg.pcg.max_iter, pcg_exit_tol, batch, cfg.sqp_max_iter,
            cfg.timestep, cfg.cost.qd_cost, cfg.cost.r_cost,
            cfg.integrator_type, cfg.gravity, cfg.cost.hessian,
            cfg.merit_mu, cfg.num_alphas, cfg.rho_factor, cfg.rho_min,
            cfg.rho_max, cfg.rho_reset, cfg.angle_wrap,
            cfg.cost.tracking, cfg.cost.q_cost,
        )
        Xb = unpack(Xn_l)
        Ub = unpack(Un_l)[:, :-1]
        lam_b = unpack(lam_l)
        rho_b = rho_l_n[0, ::n]
        itc_b = itc_l[0, ::n]
        bail_b = bailed_l[0, ::n]

        # ---- plant rollout + tracking error, per arm.  The fused rollout
        # kernel's SMEM scalars don't vmap, but batch is STATIC and small:
        # unroll B sequential fused-kernel calls (~5 us each) instead of
        # vmapping the portable rollout (~10 sequential tiny ABA evals per
        # substep -- the vmapped-portable glue measured ~350 us/update of
        # the packed loop's 609, results/round3/packed_cg_probe_n64_b2.json)
        offset_us = jnp.where(first, 0.0, period)
        roll = [_rollout_and_error(model, cfg, xs_b[a], Uprev_b[a], goals,
                                   offset_us, period, max_substeps)
                for a in range(batch)]
        xs_b = jnp.stack([r[0] for r in roll])
        err_b = jnp.stack([r[1] for r in roll])
        Uprev_b = Ub

        # ---- shared-schedule horizon shift, per arm
        Xs_b, Us_b, Gs_b, Ls_b = jax.vmap(
            lambda Xa, Ua, La: _shift_horizon(Xa, Ua, goals, La, xu_traj,
                                              ee_traj, off))(Xb, Ub, lam_b)
        sel = lambda a, b: jnp.where(shift_now, a, b)
        Xb = sel(Xs_b, Xb)
        Ub = sel(Us_b, Ub)
        goals = sel(Gs_b[0], goals)
        lam_b = sel(Ls_b, lam_b)
        Xb = Xb.at[:, 0].set(xs_b)

        out = (err_b, shift_now, itc_b, pcg_tot, bail_b, xs_b)
        return (xs_b, Xb, Ub, goals, lam_b, rho_b, Uprev_b,
                jnp.bool_(False)), out

    init = (xs0_b, Xb, Ub, goals0, lamb, rho_b, Ub, jnp.bool_(True))
    carry, outs = jax.lax.scan(body, init, (do_shift, offsets))
    errs, shifted, sqp_iters, pcg_iters, bails, path = outs
    return {
        "tracking_errors": errs.T,        # (B, n_updates)
        "shifted": shifted,
        "sqp_iters": sqp_iters.T,
        "pcg_iters_total": pcg_iters,
        "rho_bailed": bails.T,
        "tracking_path": jnp.transpose(path, (1, 0, 2)),
        "final_xs": carry[0],
    }
