"""Typed runtime configuration.

Replaces the reference's compile-time macro config
(reference include/common/settings.cuh:1-209): every knob that was a
``-D`` preprocessor flag there is a field here.  Fields that shape traced
computations (sizes, iteration caps, integrator type) are static python
values -- changing them triggers a re-jit, which mirrors the reference's
recompile-per-setting workflow (experiments/runner.py) at far lower cost.
Numeric tolerances (pcg exit tol, rho) are traced scalars so they can be
swept without recompilation.
"""
from __future__ import annotations

import dataclasses
from typing import Optional


@dataclasses.dataclass(frozen=True)
class CostConfig:
    """Tracking-cost weights (reference include/common/settings.cuh:90-100).

    cost_k = 0.5*||ee_xyz(q_k) - goal_xyz_k||^2 + 0.5*qd_cost*||qd_k||^2
             + 0.5*r_cost*||u_k||^2            (control term absent at k=N-1)
    (reference include/dynamics/iiwa/iiwa_eepos_plant.cuh:242-290)
    """

    qd_cost: float = 1e-4
    r_cost: float = 1e-4   # reference uses 1e-3 when KNOT_POINTS == 64
    hessian: str = "reference"  # or "gauss_newton" (see ops/cost.py)
    # Tracking mode: "eepos" (reference default plant adapter,
    # iiwa_eepos_plant.cuh) or "joint" (the joint-space variant,
    # iiwa_plant.cuh:40-332, tracking the precomputed state trajectory
    # with weight q_cost = Q_COST on the position error).
    tracking: str = "eepos"
    q_cost: float = 1.0

    @staticmethod
    def for_knots(knot_points: int) -> "CostConfig":
        # reference settings.cuh:90-96: R_COST .001 iff KNOT_POINTS == 64
        return CostConfig(r_cost=1e-3 if knot_points == 64 else 1e-4)


@dataclasses.dataclass(frozen=True)
class PCGConfig:
    """PCG solver knobs (reference struct pcg_config, include/mpcsim.cuh:250-253)."""

    max_iter: int = 173
    exit_tol: float = 1e-5          # threshold on eta = r' Pinv r
    preconditioned: bool = True     # ENABLE_PRECONDITIONING ablation flag
    # Evaluate the exit tolerance only every this many CG iterations in
    # the fused Pallas kernel (inner fori_loop, outer while_loop).
    # Chunked exit may overrun the tolerance crossing by up to check-1
    # iterations (which only reduce the residual further) and rounds the
    # effective cap down to a multiple.  1 = reference-exact semantics.
    # MEASURED NULL RESULT on v5e (results/round3/pcg_cost_n64.json): the
    # while_loop exit check costs nothing (marginal 1.28 us/CG-iter at
    # check 1 vs 1.36 at check 8; closed loop 334 vs 335 us) -- keep 1.
    exit_check_every: int = 1

    def __post_init__(self):
        if not 1 <= self.exit_check_every <= self.max_iter:
            raise ValueError(
                f"exit_check_every={self.exit_check_every} must be in "
                f"[1, max_iter={self.max_iter}]: the chunked loop rounds "
                f"the effective cap down to a multiple of the chunk, so a "
                f"chunk larger than the cap would run ZERO CG iterations "
                f"(silent no-op dual solve)")

    @staticmethod
    def tuned_max_iter(knot_points: int) -> int:
        # reference settings.cuh:135-156 (empirical per-N caps)
        return {32: 173, 64: 167, 128: 167, 256: 118, 512: 67}.get(knot_points, 200)

    @staticmethod
    def tpu_tuned_max_iter(knot_points: int) -> int:
        """Per-N caps retuned on TPU v5e (the reference's GPU-tuned
        values are ~4x too high here).  Closed-loop validated:
        parity-or-better tracking error at every N with 1.4-2x lower
        update latency (results/round2/cap_sweep.json, round3
        cap24_n128/cap24_n256/cap16_n256.json: at N>=128 cap 24 keeps
        the error identical to 3 decimals while cutting the update time
        ~12-21%; at N=64/32 cap 40 is the quality optimum)."""
        return {32: 40, 64: 40, 128: 24, 256: 24, 512: 16, 1024: 16}.get(
            knot_points, 40)


@dataclasses.dataclass(frozen=True)
class SolverConfig:
    """Full SQP/MPC configuration (reference include/common/settings.cuh)."""

    knot_points: int = 64
    state_size: int = 14
    control_size: int = 7
    timestep: float = 0.015625          # 1/64 s (reference examples/track_iiwa_pcg.cu:19)
    integrator_type: int = 0            # 0: Euler, 1: semi-implicit Euler
    angle_wrap: bool = False            # ANGLE_WRAP (integrator.cuh:13-19)
    # linsys_t precision (USE_DOUBLES, settings.cuh:49-57).  "float64"
    # requires jax.config.update("jax_enable_x64", True) and a model built
    # with dtype=jnp.float64.
    dtype: str = "float32"

    sqp_max_iter: int = 40              # settings.cuh:164-170 (40 iter-mode / 20 time-mode)
    merit_mu: float = 10.0              # pcg/sqp.cuh:62
    num_alphas: int = 8                 # pcg/sqp.cuh:63; alpha_i = 1/2^i

    rho_init: float = 1e-3              # mpcsim.cuh:256
    rho_min: float = 1e-3               # settings.cuh:197-199
    rho_factor: float = 1.2             # settings.cuh:202-204
    rho_max: float = 10.0               # settings.cuh:206-208
    rho_reset: float = 1e-3

    pcg: PCGConfig = dataclasses.field(default_factory=PCGConfig)
    cost: CostConfig = dataclasses.field(default_factory=CostConfig)

    # simulation harness (reference mpcsim.cuh)
    simulation_period_us: float = 2000.0  # settings.cuh:76-78 -> 500 Hz control
    sim_step_time: float = 2e-4           # integrator.cuh:304
    shift_threshold_fraction: float = 1.0  # settings.cuh:72-74 (fraction of dt)

    gravity: float = 0.0                # gato_plant::GRAVITY (iiwa_eepos_plant.cuh:51)

    # Use the fused Pallas stage kernels (lane-batched dynamics) inside the
    # SQP loop instead of the portable vmapped XLA implementations.
    pallas_stages: bool = False
    # With pallas_stages and the exact "bcr" linsys, fuse the WHOLE SQP
    # iteration (KKT+Schur -> BCR -> dz -> line search -> rho update) into
    # one Pallas dispatch (ops/pallas/sqp_megakernel.py); applies for
    # power-of-2 N <= 128.  Off -> the three-kernel staged path.  Default
    # off until hardware-verified (scripts/tpu_kernel_regression.py).
    megakernel: bool = False
    # With megakernel engaged on the "pcg" backend, additionally run ALL
    # sqp_max_iter iterations inside ONE Pallas dispatch (in-kernel
    # fori_loop with rho-bail masking): the iterate never round-trips
    # HBM between SQP iterations and the per-iteration dispatch + XLA
    # glue disappears.  Semantically identical to the while_loop over
    # single-iteration megakernels (bail freezes the state).  Default
    # off until hardware-verified (scripts/tpu_kernel_regression.py).
    megakernel_solve: bool = False
    # In the megakernels, force a canonical-layout copy of the six Schur/
    # preconditioner bands before the in-kernel CG loop (the bands arrive
    # via pltpu.roll/lane_transpose with Mosaic offset layouts that are
    # otherwise re-resolved inside every CG iteration).  Bit-identical
    # output (results/round3/mega_cg_probe_n64.json: maxdiff 0.0).  The
    # cold-lam cap sweep showed ~30 us/solve at cap 40, but the closed-
    # loop A/B is NEUTRAL (264.1 vs 267.2 us/update -- within run noise;
    # results/round3/bench_matbands.json): with warm-started CG the
    # per-iteration relayout savings roughly cancel the per-SQP-iteration
    # copy cost.  Kept as a knob; off by default.
    megakernel_mat_bands: bool = False

    # linsys="auto" failover (sim loops): run the tracking-grade "pcg"
    # backend, monitoring an EMA of the per-update rho-bail rate AND an
    # EMA of the tracking error, and latch over to the exact-dual
    # "bcr_pcg" backend once BOTH exceed their thresholds.  This is the
    # operational rule from the pair-1_0 diagnosis
    # (results/round3/outlier_1_0_diagnosis.json): stair-preconditioner-
    # hostile trajectories reject steps and bail every ~6 updates (rate
    # ~0.17), and bcr_pcg reaches those pairs' exact tracking floor at
    # ~2.3 CG iterations/solve.  The error gate exists because rho bails
    # alone do NOT separate hostile from healthy pairs: the round-4
    # all-pairs run (results/round4/tpu_all_pairs.json) showed healthy
    # trajectories (0_0: 0.043 m under pcg) also bail sporadically, and
    # a bail-only rule latched them onto bcr_pcg where truncated-PCG's
    # beneficial damping is lost (0.043 -> 0.203 m).  Tracking error is
    # the outcome the failover exists to protect, and the loop already
    # computes it every update: healthy pairs sit at 0.02-0.14 m, the
    # hostile 1_0 at ~0.39 m -- 0.20 m separates them cleanly.
    # EMA updates: ema <- d*ema + (1-d)*sample, one per signal.
    failover_bail_rate: float = 0.10
    failover_err_threshold_m: float = 0.20
    failover_ema_decay: float = 0.90
    # Latch GRANULARITY for the device-resident auto loop
    # (sim.simulate_mpc_scan): evaluate the backend cond once per chunk
    # of this many updates instead of once per update, amortizing the
    # lax.cond's per-step control-flow overhead (~15 us/update measured
    # round 4: auto 284.1 vs pcg 268.6 us on healthy 0_0,
    # results/round4/tpu_all_pairs.json) by the chunk length.  Trip
    # DETECTION stays per-update-exact (the EMAs update every step and
    # any mid-chunk threshold crossing is accumulated); only the switch
    # itself waits for the next chunk boundary -- operationally
    # irrelevant next to the ~10-update EMA time constant.  1 = the
    # round-4 per-update cond; also used when n_updates is not a
    # multiple of the chunk.
    failover_check_every: int = 8

    @property
    def jax_dtype(self):
        import jax.numpy as jnp

        return jnp.dtype(self.dtype)

    @property
    def nx(self) -> int:
        return self.state_size

    @property
    def nu(self) -> int:
        return self.control_size

    @property
    def nq(self) -> int:
        return self.state_size // 2

    @staticmethod
    def for_knots(knot_points: int, **kw) -> "SolverConfig":
        """Config with the reference's per-N tuned defaults.

        Explicit cost=/pcg= keywords override the per-N defaults (they
        previously collided with the defaults and raised TypeError)."""
        kw.setdefault("cost", CostConfig.for_knots(knot_points))
        kw.setdefault("pcg",
                      PCGConfig(max_iter=PCGConfig.tuned_max_iter(knot_points)))
        return SolverConfig(knot_points=knot_points, **kw)


def default_pcg_exit_tols(knot_points: int) -> list:
    """Per-N sweep of exit tolerances (reference examples/track_iiwa_pcg.cu:46-68)."""
    if knot_points == 32:
        return [5e-6, 7.5e-6, 5e-6, 2.5e-6, 1e-6]
    if knot_points == 64:
        return [5e-5, 7.5e-5, 5e-5, 2.5e-5, 1e-5]
    return [1e-5, 5e-5, 1e-4, 5e-4, 1e-3]
