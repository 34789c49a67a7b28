#!/usr/bin/env python3
"""All-pairs PCG-vs-oracle parity study.

The reference drivers break after the first (start=0, goal=0) fixture
(examples/track_iiwa_pcg.cu:177), so its dual-solver comparison
(experiments/runner.py:64-93) effectively covers one trajectory.  This
study runs EVERY recorded fixture pair through both the production PCG
solve and the exact LDL' oracle at the tuned per-N tolerance, and
archives per-pair tracking-error and PCG-iteration envelopes.

    python experiments/04_all_pairs_oracle.py [--knots 32] [--oracle dense]
        [--max-timesteps 100] [--out results/round2]

Note on fixtures: only the 0_0 end-effector trace is reference-recorded;
the other pairs' traces are FK-synthesized (ADVICE round 1), so
cross-implementation claims anchor on 0_0 while the other pairs check
solver-vs-oracle consistency.
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

PAIRS = [(s, g) for g in range(5) for s in range(5) if not (s == g and s != 0)]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--knots", type=int, default=32)
    ap.add_argument("--oracle", default="dense", choices=["dense", "qdldl"],
                    help="exact-solve backend to compare against")
    ap.add_argument("--max-timesteps", type=int, default=None)
    ap.add_argument("--warmup-iters", type=int, default=20)
    ap.add_argument("--out", default=str(REPO / "results" / "round2"))
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
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
    fixtures = REPO / "tests" / "fixtures"

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)

    table = {}
    for i, (s, g) in enumerate(PAIRS):
        try:
            xu, ee = load_fixture_pair(fixtures, s, g, model=model)
        except OSError:
            continue
        row = {}
        for solver in ("pcg", args.oracle):
            t0 = time.time()
            rec = simulate_mpc(
                model, cfg, xu, ee, pcg_exit_tol=tol, linsys=solver,
                warmup_iters=args.warmup_iters if i == 0 else 1,
                max_timesteps=args.max_timesteps,
            )
            su = rec.summary()
            row[solver] = {
                "avg_tracking_error": su["avg_tracking_error"],
                "max_tracking_error": su["max_tracking_error"],
                "final_tracking_error": su["final_tracking_error"],
                "avg_pcg_iters": su["avg_pcg_iters"],
                "pcg_max_exit_rate": su["pcg_max_exit_rate"],
                "avg_sqp_iters": float(np.mean(rec.sqp_iters)),
                "wall_s": time.time() - t0,
            }
        dpcg, dora = row["pcg"], row[args.oracle]
        row["err_ratio_pcg_vs_oracle"] = (
            dpcg["avg_tracking_error"] / max(dora["avg_tracking_error"], 1e-12)
        )
        table[f"{s}_{g}"] = row
        print(f"{s}_{g}: pcg err {dpcg['avg_tracking_error']:.4f} "
              f"{args.oracle} err {dora['avg_tracking_error']:.4f} "
              f"ratio {row['err_ratio_pcg_vs_oracle']:.3f} "
              f"pcg_iters {dpcg['avg_pcg_iters']:.0f}")

    ratios = [r["err_ratio_pcg_vs_oracle"] for r in table.values()]
    summary = {
        "knots": n, "tol": tol, "oracle": args.oracle,
        "pairs": len(table),
        "err_ratio_mean": float(np.mean(ratios)),
        "err_ratio_max": float(np.max(ratios)),
        "note": "only 0_0 eepos trace is reference-recorded; other pairs "
                "are FK-synthesized (solver-vs-oracle consistency checks)",
    }
    path = out / f"all_pairs_oracle_n{n}.json"
    path.write_text(json.dumps({"summary": summary, "pairs": table}, indent=1))
    print(f"\n{len(table)} pairs -> {path}")
    print(f"tracking-error ratio pcg/{args.oracle}: "
          f"mean {summary['err_ratio_mean']:.3f} max {summary['err_ratio_max']:.3f}")


if __name__ == "__main__":
    main()
