#!/usr/bin/env python3
"""IIWA figure-eight tracking with the SQP-PCG solver: the flagship driver.

Rebuild of reference examples/track_iiwa_pcg.cu:14-184: loads the recorded
trajectory fixtures, sweeps the per-N PCG exit tolerances, runs the MPC
simulation TEST_ITERS times per (start, goal) pair, prints distributional
stats and archives per-run .result files + overall_stats.csv.

Like the reference (which breaks after the first combination,
track_iiwa_pcg.cu:177), only (start=0, goal=0) runs by default; pass
--all-pairs to sweep every recorded pair.
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--knots", type=int, default=32)
    ap.add_argument("--test-iters", type=int, default=1)
    ap.add_argument("--max-timesteps", type=int, default=None)
    ap.add_argument("--sqp-max-iter", type=int, default=40)
    ap.add_argument("--tols", type=float, nargs="*", default=None)
    ap.add_argument("--linsys", default="pcg",
                    choices=["pcg", "pcg_pallas", "dense", "qdldl", "bcr",
                             "bcr_pcg", "auto"],
                    help="'auto' = pcg with the rho-bail-rate failover to "
                    "bcr_pcg (SolverConfig.failover_*)")
    ap.add_argument("--no-precond", action="store_true",
                    help="ENABLE_PRECONDITIONING=0 ablation")
    ap.add_argument("--hessian", default="reference",
                    choices=["reference", "gauss_newton"])
    ap.add_argument("--trajfile-dir", default=str(REPO / "tests" / "fixtures"))
    ap.add_argument("--output-dir", default=str(REPO / "tmp" / "results"))
    ap.add_argument("--warmup-iters", type=int, default=100)
    ap.add_argument("--fine-grained", action="store_true",
                    help="per-phase KKT/Schur/linsys/dz/line-search timing "
                         "dumps (reference FINE_GRAINED_TIMING)")
    ap.add_argument("--all-pairs", action="store_true")
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    import dataclasses

    from mpcgpu_tpu.config import SolverConfig, default_pcg_exit_tols
    from mpcgpu_tpu.linsys import qdldl_host  # noqa: F401 (registers backend)
    from mpcgpu_tpu.models.robot import iiwa14
    from mpcgpu_tpu.sim import simulate_mpc
    from mpcgpu_tpu.utils.results import dump_tracking_data
    from mpcgpu_tpu.utils.stats import print_stats, stats_csv_row
    from mpcgpu_tpu.utils.trajfiles import load_fixture_pair

    model = iiwa14()
    cfg = SolverConfig.for_knots(args.knots, sqp_max_iter=args.sqp_max_iter)
    cfg = dataclasses.replace(
        cfg,
        pcg=dataclasses.replace(cfg.pcg, preconditioned=not args.no_precond),
        cost=dataclasses.replace(cfg.cost, hessian=args.hessian),
    )
    tols = args.tols if args.tols else default_pcg_exit_tols(args.knots)

    print(f"Knot points: {cfg.knot_points}")
    print(f"State size: {cfg.state_size}")
    print(f"Solver: {args.linsys.upper()}  precond: {cfg.pcg.preconditioned}")
    print(f"Max sqp iter: {cfg.sqp_max_iter}  Max pcg iter: {cfg.pcg.max_iter}")
    print(f"R cost: {cfg.cost.r_cost}  QD cost: {cfg.cost.qd_cost}\n")

    recorded_states = 5
    pairs = [
        (s, g)
        for g in range(recorded_states)
        for s in range(recorded_states)
        if not (s == g and s != 0)
    ]
    if not args.all_pairs:
        pairs = [(0, 0)]

    for start, goal in pairs:
        try:
            xu, ee = load_fixture_pair(args.trajfile_dir, start, goal,
                                       model=model)
        except OSError:
            print(f"fixture {start}_{goal} not found, skipping")
            continue
        print(f"start: {start} goal: {goal}")

        for tol in tols:
            prefix = f"{cfg.knot_points}_{args.linsys.upper()}_{tol}"
            tracking_errs, sqp_iters, final_errs = [], [], []
            for it in range(args.test_iters):
                rec = simulate_mpc(
                    model, cfg, xu, ee,
                    pcg_exit_tol=tol, linsys=args.linsys,
                    warmup_iters=args.warmup_iters if it == 0 else 0,
                    max_timesteps=args.max_timesteps,
                    fine_grained_timing=args.fine_grained,
                )
                dump_tracking_data(rec, prefix, it, args.output_dir)
                tracking_errs.extend(rec.tracking_errors)
                sqp_iters.extend(rec.sqp_iters)
                final_errs.append(rec.final_tracking_error)

            print(f"\nRESULTS — exit tol {tol}")
            t_row = print_stats(tracking_errs, "trackingerr")
            i_row = print_stats(sqp_iters, "sqpiters")
            print(f"Average final tracking err: "
                  f"{sum(final_errs) / len(final_errs):.6g}\n")
            out = Path(args.output_dir)
            out.mkdir(parents=True, exist_ok=True)
            with open(out / f"{prefix}_overall_stats.csv", "w") as f:
                f.write("Average,Std Dev, Min, Max, Median, Q1, Q3\n")
                f.write(stats_csv_row(tracking_errs) + "\n")
                f.write(stats_csv_row(sqp_iters) + "\n")


if __name__ == "__main__":
    main()
