#!/usr/bin/env python3
"""Full-trajectory tracking on ALL 21 fixture pairs, on-device (TPU).

Complements scripts/all_pairs_oracle.py (CPU, truncated-protocol PCG vs
QDLDL): here the device-resident scan harness runs the ENTIRE recorded
figure-eight for every pair -- the protocol of the reference drivers
(reference examples/track_iiwa_pcg.cu:114 + include/mpcsim.cuh:286-451),
which they only ever applied to the (0, 0) pair -- for the fused PCG and
the exact BCR backends.  One compile per (solver); every pair reuses it.

    python scripts/tpu_all_pairs.py [--knots 64] [--linsys pcg bcr]

Archives results/round2/tpu_all_pairs.json.
"""
from __future__ import annotations

import argparse
import dataclasses
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
    ap.add_argument("--updates", type=int, default=512)
    ap.add_argument("--linsys", nargs="*", default=["pcg", "bcr"])
    ap.add_argument("--megakernel", action="store_true")
    ap.add_argument("--pcg-max-iter", type=int, default=40,
                    help="TPU-retuned cap (results/round2/cap_sweep.json)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from mpcgpu_tpu.config import SolverConfig, default_pcg_exit_tols
    from mpcgpu_tpu.models.robot import iiwa14
    from mpcgpu_tpu.sim import simulate_mpc_scan
    from mpcgpu_tpu.sqp import sqp_solve
    from mpcgpu_tpu.utils.trajfiles import load_fixture_pair, horizon_slices

    n = args.knots
    model = iiwa14()
    cfg = dataclasses.replace(SolverConfig.for_knots(n, sqp_max_iter=4),
                              pallas_stages=True, megakernel=args.megakernel)
    cfg = dataclasses.replace(
        cfg, pcg=dataclasses.replace(cfg.pcg, max_iter=args.pcg_max_iter))
    tol = default_pcg_exit_tols(n)[0]

    recorded_states = 5
    pairs = [(s, g) for g in range(recorded_states)
             for s in range(recorded_states) if not (s == g and s != 0)]

    results = {"device": str(jax.devices()[0]), "knots": n,
               "n_updates": args.updates, "pcg_exit_tol": tol,
               "megakernel": args.megakernel,
               "eepos_provenance": "0_0 reference-recorded; others FK-"
               "synthesized (utils/trajfiles.py)",
               "rows": {}}
    out = REPO / "results" / "round2" / "tpu_all_pairs.json"
    out.parent.mkdir(parents=True, exist_ok=True)

    for start, goal in pairs:
        try:
            xu, ee = load_fixture_pair(REPO / "tests" / "fixtures",
                                       start, goal, model=model)
        except OSError:
            continue
        X, U, goals, xs = horizon_slices(xu, ee, n)
        X = jnp.asarray(X); U = jnp.asarray(U)
        xu_j = jnp.asarray(xu); ee_j = jnp.asarray(ee)
        row = {}
        for linsys in args.linsys:
            lam = jnp.zeros((n, 14), jnp.float32)
            rho = jnp.asarray(1e-3, jnp.float32)
            res = sqp_solve(model, cfg, X, U, lam, jnp.asarray(ee[:n]),
                            jnp.asarray(xs), rho, 1e-11, linsys)
            for _ in range(4):
                res = sqp_solve(model, cfg, X, U, res.lam, jnp.asarray(ee[:n]),
                                jnp.asarray(xs), res.rho, 1e-11, linsys)
            t0 = time.perf_counter()
            o = simulate_mpc_scan(model, cfg, xu_j, ee_j, X, U, res.lam,
                                  jnp.asarray(1e-3, jnp.float32), tol,
                                  args.updates, linsys)
            errs = np.asarray(o["tracking_errors"])
            wall = time.perf_counter() - t0
            shifted = np.asarray(o["shifted"])
            te = errs[shifted] if shifted.any() else errs
            row[linsys] = {
                "avg_tracking_error_m": round(float(te.mean()), 5),
                "max_tracking_error_m": round(float(te.max()), 5),
                "avg_sqp_iters": round(
                    float(np.asarray(o["sqp_iters"]).mean()), 2),
                "avg_pcg_iters_per_update": round(
                    float(np.asarray(o["pcg_iters_total"]).mean()), 1),
                "us_per_update": round(wall * 1e6 / args.updates, 1),
            }
        if all(s in row for s in ("pcg", "bcr")):
            b = row["bcr"]["avg_tracking_error_m"]
            row["err_ratio_pcg_over_bcr"] = round(
                row["pcg"]["avg_tracking_error_m"] / b if b else float("inf"),
                3)
        results["rows"][f"{start}_{goal}"] = row
        print(f"{start}_{goal}: {row}", flush=True)
        out.write_text(json.dumps(results, indent=1))

    print(f"-> {out}")


if __name__ == "__main__":
    main()
