#!/usr/bin/env python3
"""Round-2 all-pairs oracle study: PCG vs QDLDL on every recorded fixture.

The reference's dual-solver comparison (reference experiments/runner.py:64-93
runs both track_iiwa binaries on the same fixtures) effectively exercised one
(start, goal) pair because the drivers break after the first combination
(track_iiwa_pcg.cu:177).  This study runs the full closed loop on ALL 21
fixture pairs with both the iterative PCG backend (tuned per-N exit
tolerance) and the exact CPU LDL' oracle (qdldl backend), recording the
tracking-error and PCG-iteration envelopes per pair.

Accuracy study, not a timing study: runs on CPU (portable stages) so it
never contends with TPU benchmarks.

    python scripts/all_pairs_oracle.py [--knots 64] [--max-timesteps 80]

Archives results/round2/all_pairs_oracle.json and prints a parity table.
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--knots", type=int, default=64)
    ap.add_argument("--max-timesteps", type=int, default=80,
                    help="trajectory rows to track (80 rows - 64 knots = "
                         "16 shift steps = ~125 control updates per pair)")
    ap.add_argument("--warmup-iters", type=int, default=2)
    ap.add_argument("--solvers", nargs="*", default=["pcg", "qdldl"])
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from mpcgpu_tpu.config import SolverConfig, default_pcg_exit_tols
    from mpcgpu_tpu.models.robot import iiwa14
    from mpcgpu_tpu.sim import simulate_mpc
    from mpcgpu_tpu.utils.trajfiles import load_fixture_pair

    model = iiwa14()
    n = args.knots
    cfg = SolverConfig.for_knots(n, sqp_max_iter=4)
    tol = default_pcg_exit_tols(n)[0]

    recorded_states = 5
    pairs = [(s, g) for g in range(recorded_states)
             for s in range(recorded_states) if not (s == g and s != 0)]

    results = {"knots": n, "max_timesteps": args.max_timesteps,
               "pcg_exit_tol": tol, "sqp_max_iter": cfg.sqp_max_iter,
               "eepos_provenance": "0_0 is reference-recorded; all other "
               "pairs' goal traces are synthesized from the recorded states "
               "via this repo's FK (see utils/trajfiles.py) -- "
               "cross-implementation claims anchor to 0_0",
               "rows": {}}
    out = REPO / "results" / "round2" / "all_pairs_oracle.json"
    out.parent.mkdir(parents=True, exist_ok=True)

    for start, goal in pairs:
        try:
            xu, ee = load_fixture_pair(REPO / "tests" / "fixtures",
                                       start, goal, model=model)
        except OSError:
            results["rows"][f"{start}_{goal}"] = {"error": "fixture missing"}
            continue
        row = {}
        for linsys in args.solvers:
            t0 = time.time()
            rec = simulate_mpc(
                model, cfg, xu, ee,
                pcg_exit_tol=tol, linsys=linsys,
                warmup_iters=args.warmup_iters,
                max_timesteps=args.max_timesteps,
            )
            te = np.asarray(rec.tracking_errors, np.float64)
            pi = np.asarray(rec.pcg_iters, np.float64)
            row[linsys] = {
                "avg_tracking_error_m": round(float(te.mean()), 5),
                "max_tracking_error_m": round(float(te.max()), 5),
                "final_tracking_error_m": round(
                    float(rec.final_tracking_error), 5),
                "avg_sqp_iters": round(float(np.mean(rec.sqp_iters)), 2),
                "avg_pcg_iters": round(float(pi.mean()), 1),
                "max_pcg_iters": int(pi.max()) if pi.size else 0,
                "control_updates": rec.control_updates,
                "wall_s": round(time.time() - t0, 1),
            }
        if all(s in row for s in ("pcg", "qdldl")):
            a, b = (row["pcg"]["avg_tracking_error_m"],
                    row["qdldl"]["avg_tracking_error_m"])
            row["tracking_err_ratio_pcg_over_qdldl"] = round(
                a / b if b else float("inf"), 3)
        results["rows"][f"{start}_{goal}"] = row
        print(f"{start}_{goal}: {row}", flush=True)
        out.write_text(json.dumps(results, indent=1))

    # envelope summary across pairs
    ok_rows = [r for r in results["rows"].values() if "pcg" in r]
    if ok_rows:
        ratios = [r["tracking_err_ratio_pcg_over_qdldl"] for r in ok_rows
                  if "tracking_err_ratio_pcg_over_qdldl" in r]
        results["summary"] = {
            "pairs_run": len(ok_rows),
            "pcg_avg_err_worst": max(r["pcg"]["avg_tracking_error_m"]
                                     for r in ok_rows),
            "qdldl_avg_err_worst": max(r["qdldl"]["avg_tracking_error_m"]
                                       for r in ok_rows),
            "err_ratio_worst": max(ratios) if ratios else None,
            "err_ratio_median": (round(float(np.median(ratios)), 3)
                                 if ratios else None),
            "pcg_iters_envelope_max": max(r["pcg"]["max_pcg_iters"]
                                          for r in ok_rows),
        }
        print(f"summary: {results['summary']}")
    out.write_text(json.dumps(results, indent=1))
    print(f"-> {out}")


if __name__ == "__main__":
    main()
