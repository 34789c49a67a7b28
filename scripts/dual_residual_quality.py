#!/usr/bin/env python3
"""Cap-exit honesty probe: dual-residual quality of truncated PCG.

The flagship runs the TPU-retuned PCG iteration cap (PCGConfig.
tpu_tuned_max_iter) at an 85-92% cap-exit rate -- far above the
reference's >50% reliability warning (mpcsim.cuh:436-441).  This probe
quantifies what those truncated solves actually leave behind: the
backward-error dual residual ||gamma - S lam|| / (||S||_F ||lam|| +
||gamma||) at each update's returned iterate (sim._dual_residual), for the capped pcg
backend vs the exact solvers (dense oracle, bcr), on the same
closed-loop runs.

Math-only diagnostic (no timing), so it runs on CPU with the portable
path -- the fused kernels are hardware-bit-exact vs the staged path and
the staged path agrees with the portable one to f32 roundoff
(results/kernel_regression_tpu.json), making the portable residual
distribution representative of the flagship's.

    python scripts/dual_residual_quality.py [--n 64] [--pairs 0_0 1_0]

Archives results/round5/dual_residual.json.
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np  # noqa: E402


def run_one(n: int, pair: str, linsys: str, max_updates: int):
    import jax

    from mpcgpu_tpu.config import (PCGConfig, SolverConfig,
                                   default_pcg_exit_tols)
    from mpcgpu_tpu.models.robot import iiwa14
    from mpcgpu_tpu.sim import simulate_mpc
    from mpcgpu_tpu.utils.trajfiles import load_fixture_pair

    fixtures = REPO / "tests" / "fixtures"
    s, e = pair.split("_")
    model = iiwa14()
    # non-0_0 pairs have no recorded ee trace; synthesize via FK
    xu, ee = load_fixture_pair(fixtures, int(s), int(e), model=model)
    cfg = SolverConfig.for_knots(n, sqp_max_iter=4)
    if linsys == "pcg":
        cfg = dataclasses.replace(
            cfg, pcg=dataclasses.replace(
                cfg.pcg, max_iter=PCGConfig.tpu_tuned_max_iter(n)))
    tol = default_pcg_exit_tols(n)[0]

    # 512 control updates = the round-4 all-pairs protocol
    # (results/round4/tpu_all_pairs.json: pcg tracks 0_0 at 0.043 m avg
    # there), so the error column here is comparable with that table
    rec = simulate_mpc(model, cfg, xu, ee, pcg_exit_tol=tol,
                       linsys=linsys, max_control_updates=max_updates,
                       warmup_iters=2, record_dual_residual=True)
    dr = np.asarray(rec.dual_residuals, np.float64)
    return {
        "linsys": linsys,
        "pcg_max_iter": cfg.pcg.max_iter if linsys == "pcg" else None,
        "cap_exit_rate": (round(float(np.mean(rec.pcg_exits)), 3)
                          if rec.pcg_exits else None),
        "avg_pcg_iters": (round(float(np.mean(rec.pcg_iters)), 1)
                          if rec.pcg_iters else None),
        "dual_residual_p50": float(np.median(dr)),
        "dual_residual_p90": float(np.percentile(dr, 90)),
        "dual_residual_max": float(np.max(dr)),
        "avg_tracking_error_m": round(
            float(np.mean(rec.tracking_errors)), 4),
        "updates": len(dr),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--pairs", nargs="*", default=["0_0", "1_0"])
    ap.add_argument("--linsys", nargs="*", default=["pcg", "dense"],
                    help="'dense' is the exact oracle; 'bcr' also works "
                    "but runs its Pallas kernel in interpreter mode on "
                    "CPU (slow)")
    ap.add_argument("--updates", type=int, default=512)
    ap.add_argument("--cpu", action="store_true", default=True)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    out = {"n": args.n, "n_updates": args.updates,
           "metric": "backward-error dual residual ||gamma - S lam|| / "
                     "(||S||_F ||lam|| + ||gamma||) at the returned "
                     "iterate (sim._dual_residual)",
           "rows": {}}
    for pair in args.pairs:
        for ls in args.linsys:
            key = f"{pair}_{ls}"
            try:
                row = run_one(args.n, pair, ls, args.updates)
            except Exception as exc:  # archive the failure, keep sweeping
                row = {"error": repr(exc)[:300]}
            out["rows"][key] = row
            print(f"{key}: {row}", flush=True)

    path = REPO / "results" / "round5" / "dual_residual.json"
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text(json.dumps(out, indent=1))
    print(f"-> {path}")


if __name__ == "__main__":
    main()
