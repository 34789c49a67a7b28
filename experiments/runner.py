#!/usr/bin/env python3
"""Experiment sweep runner.

Rebuild of reference experiments/runner.py:1-419.  The reference rewrites
settings.cuh from a template and recompiles the CUDA binaries per knot
count (runner.py:103-330, 61-62); here every knob is runtime
configuration, so a sweep is just a loop that re-jits per horizon length.
Results and the exact configuration used are archived per experiment
(reference store_results, runner.py:332-341).
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time
from pathlib import Path
from typing import Optional, Sequence, Union

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
DEFAULT_KNOTS = (2, 4, 8, 16, 32, 64, 128, 256, 512)  # reference sweeps
# from N=2 (reference experiments/01_precond_then_long_running.py:8)


@dataclasses.dataclass
class Settings:
    """Sweep settings (reference Settings dataclass, runner.py:38-58)."""

    knot_points: Sequence[int] = DEFAULT_KNOTS
    pcg_max_iters: Union[int, str] = "adaptive"   # int or per-N tuned table
    sqp_max_iter: int = 40
    enable_preconditioning: bool = True
    pcg_exit_tol: Union[float, str] = "adaptive"  # float or per-N tuned table
    run_qdldl: bool = False
    max_timesteps: Optional[int] = None
    warmup_iters: int = 100
    hessian: str = "reference"
    # Timing tier (reference timing_mode, runner.py:38-58 ->
    # TIME_LINSYS / FINE_GRAINED_TIMING builds, settings.cuh:109-118):
    #   "minimal"      -- whole-solve wall time only (default)
    #   "linsys"       -- additionally record per-update linear-solve time
    #   "fine_grained" -- per-phase KKT/Schur/linsys/dz/line-search times
    timing_mode: str = "minimal"
    # Sample device memory during each run (the reference launcher's
    # nvidia-smi --loop-ms sampling, run_mpcgpu.sh:64-96) and record the
    # peak in the summary.
    sample_memory: bool = False


def _solver_config(st: Settings, n: int):
    from mpcgpu_tpu.config import PCGConfig, SolverConfig

    cfg = SolverConfig.for_knots(n, sqp_max_iter=st.sqp_max_iter)
    max_iter = (
        PCGConfig.tuned_max_iter(n)
        if st.pcg_max_iters == "adaptive"
        else int(st.pcg_max_iters)
    )
    return dataclasses.replace(
        cfg,
        pcg=PCGConfig(max_iter=max_iter,
                      preconditioned=st.enable_preconditioning),
        cost=dataclasses.replace(cfg.cost, hessian=st.hessian),
    )


def run_expr(settings: Settings, name: str,
             results_dir=None, fixtures_dir=None) -> dict:
    """Run the sweep; returns {knots: {solver: summary}} and archives it."""
    from mpcgpu_tpu.config import default_pcg_exit_tols
    from mpcgpu_tpu.linsys import qdldl_host  # noqa: F401
    from mpcgpu_tpu.models.robot import iiwa14
    from mpcgpu_tpu.sim import simulate_mpc
    from mpcgpu_tpu.utils.trajfiles import load_fixture_pair

    results_dir = Path(results_dir or REPO / "results") / name
    results_dir.mkdir(parents=True, exist_ok=True)
    fixtures_dir = fixtures_dir or REPO / "tests" / "fixtures"
    xu, ee = load_fixture_pair(fixtures_dir, 0, 0)
    model = iiwa14()

    all_results = {}
    for n in settings.knot_points:
        cfg = _solver_config(settings, n)
        tol = (
            default_pcg_exit_tols(n)[0]
            if settings.pcg_exit_tol == "adaptive"
            else float(settings.pcg_exit_tol)
        )
        per_n = {}
        solvers = ["pcg"] + (["qdldl"] if settings.run_qdldl else [])
        assert settings.timing_mode in ("minimal", "linsys", "fine_grained"), \
            settings.timing_mode
        fine = settings.timing_mode in ("linsys", "fine_grained")
        for solver in solvers:
            import contextlib

            if settings.sample_memory:
                from mpcgpu_tpu.utils.meminfo import MemorySampler

                sampler_cm = MemorySampler(interval_ms=100.0)
            else:
                sampler_cm = contextlib.nullcontext()
            t0 = time.time()
            with sampler_cm as sampler:
                rec = simulate_mpc(
                    model, cfg, xu, ee,
                    pcg_exit_tol=tol, linsys=solver,
                    warmup_iters=settings.warmup_iters,
                    max_timesteps=settings.max_timesteps,
                    fine_grained_timing=fine,
                )
            summary = rec.summary()
            summary["wall_time_s"] = time.time() - t0
            summary["pcg_exit_tol"] = tol
            # "linsys"/"fine_grained" tiers time the PHASE-SPLIT
            # executable (separately dispatched + synced stages, like the
            # reference's TIME_LINSYS brackets, pcg/sqp.cuh:269-286) --
            # its sqp_time percentiles include multi-dispatch overhead
            # and are NOT comparable with the "minimal" tier's fused
            # executable; the label records which one was measured.
            summary["timed_executable"] = (
                "phase_split" if fine else "fused")
            if fine:
                import numpy as _np

                phases = {"linsys": rec.linsys_times_us}
                if settings.timing_mode == "fine_grained":
                    phases.update(
                        kkt=rec.kkt_times_us, schur=rec.schur_times_us,
                        dz=rec.dz_times_us,
                        line_search=rec.line_search_times_us,
                    )
                summary["phase_times_us"] = {
                    k: {"avg": float(_np.mean(v)) if v else float("nan"),
                        "p50": float(_np.median(v)) if v else float("nan")}
                    for k, v in phases.items()
                }
            if settings.sample_memory:
                summary["peak_device_bytes"] = sampler.peak_bytes()
                # per-process axis (reference run_mpcgpu.sh:64-96 pmon)
                summary["peak_proc_rss_mb"] = sampler.peak_proc_rss_mb()
                summary["memory_samples"] = len(sampler.samples)
            per_n[solver] = summary
            print(f"N={n} {solver}: "
                  f"p50_solve={summary['p50_sqp_time_us']:.0f}us "
                  f"avg_err={summary['avg_tracking_error']:.4f}")
        all_results[n] = per_n

    with open(results_dir / "results.json", "w") as f:
        json.dump(all_results, f, indent=2)
    with open(results_dir / "settings.json", "w") as f:
        json.dump(dataclasses.asdict(settings), f, indent=2, default=str)
    return all_results


def init_runner(default: Settings) -> Settings:
    """CLI entry shared by the experiment scripts (runner.py:407-419)."""
    ap = argparse.ArgumentParser()
    ap.add_argument("--dry-run", action="store_true")
    ap.add_argument("--knots", type=int, nargs="*", default=None)
    ap.add_argument("--max-timesteps", type=int, default=None)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--timing-mode", default=None,
                    choices=["minimal", "linsys", "fine_grained"])
    ap.add_argument("--sample-memory", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    if args.knots:
        default = dataclasses.replace(default, knot_points=tuple(args.knots))
    if args.max_timesteps:
        default = dataclasses.replace(default, max_timesteps=args.max_timesteps)
    if args.timing_mode:
        default = dataclasses.replace(default, timing_mode=args.timing_mode)
    if args.sample_memory:
        default = dataclasses.replace(default, sample_memory=True)
    if args.dry_run:
        default = dataclasses.replace(
            default, knot_points=tuple(default.knot_points[:2]),
            max_timesteps=8, warmup_iters=2,
        )
    return default
