#!/usr/bin/env python3
"""Round-2 horizon scaling: device-resident closed loop at N = 32..512.

Honest-measurement harness (simulate_mpc_scan: one dispatch for the whole
tracking run) with the fused stage kernels at EVERY horizon (tiled kernel
for N >= 256 -- the round-1 Mosaic gate is gone) and both linear-system
solvers: the reference-parity PCG (per-N tuned exit tolerances) and the
exact block-cyclic-reduction kernel.

    python scripts/tpu_horizon_scaling.py [--ns 32 64 128 256 512]
        [--updates 64] [--linsys pcg bcr]

Archives results/round2/horizon_scaling.json and prints a table.
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


def run_config(n: int, linsys: str, n_updates: int, pcg_max_iter=None,
               tuned_caps=False, megakernel=False, portable=False):
    import jax
    import jax.numpy as jnp

    import __graft_entry__ as g
    from mpcgpu_tpu.config import SolverConfig, default_pcg_exit_tols
    from mpcgpu_tpu.sim import simulate_mpc_scan
    from mpcgpu_tpu.sqp import sqp_solve
    from mpcgpu_tpu.utils.trajfiles import load_fixture_pair, horizon_slices

    fixtures = REPO / "tests" / "fixtures"
    xu, ee = load_fixture_pair(fixtures, 0, 0)
    if xu.shape[0] < n + 2:
        # N=1024 horizon exceeds the recorded figure-eight (667 steps);
        # the path is periodic, so tile it to cover the horizon (latency
        # row -- the seam discontinuity slightly inflates tracking error)
        reps = (n + 2) // xu.shape[0] + 1
        xu = np.concatenate([xu] * reps, axis=0)
        ee = np.concatenate([ee] * reps, axis=0)
    cfg = dataclasses.replace(SolverConfig.for_knots(n, sqp_max_iter=4),
                              pallas_stages=not portable,
                              megakernel=megakernel and not portable,
                              megakernel_solve=megakernel and not portable)
    if tuned_caps and pcg_max_iter is None and linsys == "pcg":
        from mpcgpu_tpu.config import PCGConfig

        pcg_max_iter = PCGConfig.tpu_tuned_max_iter(n)
    if pcg_max_iter is not None:
        cfg = dataclasses.replace(
            cfg, pcg=dataclasses.replace(cfg.pcg, max_iter=pcg_max_iter))
    from mpcgpu_tpu.models.robot import iiwa14

    model = iiwa14()
    X, U, goals, xs = horizon_slices(xu, ee, n)
    X = jnp.asarray(X); U = jnp.asarray(U)
    xu_j = jnp.asarray(xu); ee_j = jnp.asarray(ee)
    lam = jnp.zeros((n, 14), jnp.float32)
    rho = jnp.asarray(1e-3, jnp.float32)
    tol = default_pcg_exit_tols(n)[0]

    # lam warm start (REMOVE_JITTERS)
    res = sqp_solve(model, cfg, X, U, lam, jnp.asarray(ee[:n]),
                    jnp.asarray(xs), rho, 1e-11, linsys)
    for _ in range(4):
        res = sqp_solve(model, cfg, X, U, res.lam, jnp.asarray(ee[:n]),
                        jnp.asarray(xs), res.rho, 1e-11, linsys)
    lam = res.lam
    rho = jnp.asarray(1e-3, jnp.float32)

    t_c0 = time.perf_counter()
    out = simulate_mpc_scan(model, cfg, xu_j, ee_j, X, U, lam, rho, tol,
                            n_updates, linsys)
    errs = np.asarray(out["tracking_errors"])
    compile_s = time.perf_counter() - t_c0

    # pipelined-dispatch slope: cancels the remote attachment's ~30 ms
    # dispatch+fetch constant (utils/benchtime.py)
    from mpcgpu_tpu.utils.benchtime import pipelined_slope_us

    per_update, const_us, _, _ = pipelined_slope_us(
        lambda: simulate_mpc_scan(model, cfg, xu_j, ee_j, X, U, lam, rho,
                                  tol, n_updates, linsys),
        lambda o: np.asarray(o["tracking_errors"]),
        n_updates)

    shifted = np.asarray(out["shifted"])
    te = errs[shifted] if shifted.any() else errs
    return {
        "us_per_update": round(per_update, 1),
        "dispatch_const_us": round(const_us, 0),
        "avg_tracking_error_m": round(float(te.mean()), 4),
        "max_tracking_error_m": round(float(te.max()), 4),
        "avg_sqp_iters": round(float(np.asarray(out["sqp_iters"]).mean()), 2),
        "avg_pcg_iters_per_update": round(
            float(np.asarray(out["pcg_iters_total"]).mean()), 1),
        "exit_tol": tol,
        "compile_s": round(compile_s, 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ns", type=int, nargs="*",
                    default=[32, 64, 128, 256, 512])
    ap.add_argument("--updates", type=int, default=64)
    ap.add_argument("--linsys", nargs="*", default=["pcg", "bcr"])
    ap.add_argument("--pcg-max-iter", type=int, default=None)
    ap.add_argument("--tuned-caps", action="store_true",
                    help="use PCGConfig.tpu_tuned_max_iter(n) per horizon")
    ap.add_argument("--megakernel", action="store_true",
                    help="flagship config: whole-solve megakernel "
                    "(engages per sqp.megakernel_engages; round 4 "
                    "covers N % 128 == 0 beyond 128 for pcg)")
    ap.add_argument("--portable", action="store_true",
                    help="portable XLA stages (no fused kernels): the "
                    "fallback that serves horizons beyond the fused "
                    "envelope (N=1024)")
    ap.add_argument("--out-name", default="horizon_scaling.json")
    ap.add_argument("--out-dir", default="round3")
    args = ap.parse_args()

    import jax

    dev = jax.devices()[0]
    print(f"device: {dev}")
    results = {"device": str(dev), "n_updates": args.updates,
               "budget_us": 2000.0, "rows": {}}

    for n in args.ns:
        for linsys in args.linsys:
            key = f"n{n}_{linsys}"
            t0 = time.time()
            try:
                row = run_config(n, linsys, args.updates,
                                 args.pcg_max_iter, args.tuned_caps,
                                 args.megakernel, args.portable)
            except Exception as e:  # archive the failure, keep sweeping
                row = {"error": repr(e)[:300]}
            results["rows"][key] = row
            print(f"{key}: {row} ({time.time() - t0:.0f}s incl. compile)",
                  flush=True)
            out = REPO / "results" / args.out_dir / args.out_name
            out.parent.mkdir(parents=True, exist_ok=True)
            out.write_text(json.dumps(results, indent=1))

    print(f"-> {out}")


if __name__ == "__main__":
    main()
