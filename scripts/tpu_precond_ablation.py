#!/usr/bin/env python3
"""Preconditioner ablation on TPU hardware (round-4 VERDICT item 1a).

The defining experiment of the Mo0dy fork: the stair-preconditioned PCG
configuration against the identity-preconditioner ablation (reference
include/pcg/linsys_setup_no_precond.cuh:1-299, selected by
ENABLE_PRECONDITIONING, settings.cuh:7; swept by
experiments/01_precond_then_long_running.py:10-20 with PCG_MAX_ITER=1000
for the unpreconditioned arm).

Protocol: device-resident closed loop (simulate_mpc_scan) on fixture
(0,0), fused stage kernels, megakernel OFF for both arms so the two
configurations differ ONLY in the preconditioner bands the Schur stage
emits (identity vs stair) -- apples to apples.  The preconditioned arm
runs the TPU-tuned caps (the flagship protocol); the ablation arm runs
the reference's no-precond cap of 1000.  Timing via pipelined-dispatch
slope (utils/benchtime.py) so neither compile time nor the remote
attachment's ~30 ms dispatch constant touches the numbers.

    python scripts/tpu_precond_ablation.py [--ns 32 64 128 256 512]
        [--updates 64]

Archives results/round4/precond_ablation_tpu.json.
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

from mpcgpu_tpu.utils.compcache import enable_persistent_cache  # noqa: E402
enable_persistent_cache()

import numpy as np  # noqa: E402


def run_config(n: int, precond: bool, n_updates: int):
    import jax.numpy as jnp

    from mpcgpu_tpu.config import (PCGConfig, SolverConfig,
                                   default_pcg_exit_tols)
    from mpcgpu_tpu.models.robot import iiwa14
    from mpcgpu_tpu.sim import simulate_mpc_scan
    from mpcgpu_tpu.sqp import sqp_solve
    from mpcgpu_tpu.utils.benchtime import pipelined_slope_us
    from mpcgpu_tpu.utils.trajfiles import load_fixture_pair, horizon_slices

    xu, ee = load_fixture_pair(REPO / "tests" / "fixtures", 0, 0)
    cap = PCGConfig.tpu_tuned_max_iter(n) if precond else 1000
    cfg = dataclasses.replace(SolverConfig.for_knots(n, sqp_max_iter=4),
                              pallas_stages=True)
    cfg = dataclasses.replace(
        cfg, pcg=dataclasses.replace(cfg.pcg, max_iter=cap,
                                     preconditioned=precond))
    model = iiwa14()
    X, U, goals, xs = horizon_slices(xu, ee, n)
    X = jnp.asarray(X); U = jnp.asarray(U)
    xu_j = jnp.asarray(xu); ee_j = jnp.asarray(ee)
    lam = jnp.zeros((n, 14), jnp.float32)
    rho = jnp.asarray(1e-3, jnp.float32)
    tol = default_pcg_exit_tols(n)[0]

    # lam warm start (REMOVE_JITTERS, mpcsim.cuh:259-279)
    res = sqp_solve(model, cfg, X, U, lam, jnp.asarray(ee[:n]),
                    jnp.asarray(xs), rho, 1e-11, "pcg")
    for _ in range(4):
        res = sqp_solve(model, cfg, X, U, res.lam, jnp.asarray(ee[:n]),
                        jnp.asarray(xs), res.rho, 1e-11, "pcg")
    lam = res.lam
    rho = jnp.asarray(1e-3, jnp.float32)

    t_c0 = time.perf_counter()
    out = simulate_mpc_scan(model, cfg, xu_j, ee_j, X, U, lam, rho, tol,
                            n_updates, "pcg")
    errs = np.asarray(out["tracking_errors"])
    compile_s = time.perf_counter() - t_c0

    per_update, const_us, _, _ = pipelined_slope_us(
        lambda: simulate_mpc_scan(model, cfg, xu_j, ee_j, X, U, lam, rho,
                                  tol, n_updates, "pcg"),
        lambda o: np.asarray(o["tracking_errors"]),
        n_updates)

    shifted = np.asarray(out["shifted"])
    te = errs[shifted] if shifted.any() else errs
    pcg_tot = np.asarray(out["pcg_iters_total"], np.float64)
    sqp_it = np.asarray(out["sqp_iters"], np.float64)
    hit = np.asarray(out["pcg_hit_max_total"], np.float64)
    return {
        "preconditioned": precond,
        "pcg_max_iter": cap,
        "us_per_update": round(per_update, 1),
        "dispatch_const_us": round(const_us, 0),
        "avg_tracking_error_m": round(float(te.mean()), 4),
        "max_tracking_error_m": round(float(te.max()), 4),
        "avg_sqp_iters": round(float(sqp_it.mean()), 2),
        "avg_pcg_iters_per_update": round(float(pcg_tot.mean()), 1),
        "avg_pcg_iters_per_solve": round(
            float(pcg_tot.sum() / max(sqp_it.sum(), 1.0)), 1),
        "pcg_cap_hit_rate": round(
            float(hit.sum() / max(sqp_it.sum(), 1.0)), 3),
        "exit_tol": tol,
        "compile_s": round(compile_s, 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ns", type=int, nargs="*",
                    default=[32, 64, 128, 256, 512])
    ap.add_argument("--updates", type=int, default=64)
    ap.add_argument("--out-name", default="precond_ablation_tpu.json")
    args = ap.parse_args()

    import jax

    dev = jax.devices()[0]
    print(f"device: {dev}")
    results = {
        "device": str(dev), "n_updates": args.updates, "budget_us": 2000.0,
        "protocol": "fused stage kernels, megakernel off both arms; "
        "identical exit tol per N; no-precond cap 1000 (reference "
        "experiments/01_precond_then_long_running.py:10-20); pipelined-"
        "dispatch slope timing", "rows": {}}
    out = REPO / "results" / "round4" / args.out_name
    out.parent.mkdir(parents=True, exist_ok=True)

    for n in args.ns:
        for precond in (True, False):
            key = f"n{n}_{'precond' if precond else 'noprecond'}"
            t0 = time.time()
            try:
                row = run_config(n, precond, args.updates)
            except Exception as e:  # archive the failure, keep sweeping
                row = {"error": repr(e)[:300]}
            results["rows"][key] = row
            print(f"{key}: {row} ({time.time() - t0:.0f}s incl. compile)",
                  flush=True)
            out.write_text(json.dumps(results, indent=1))
    print(f"-> {out}")


if __name__ == "__main__":
    main()
