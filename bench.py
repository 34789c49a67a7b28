#!/usr/bin/env python3
"""Headline benchmark: device-resident closed-loop MPC at N=64 on one chip.

Runs the reference's flagship configuration -- IIWA-14 figure-eight
tracking with the full SQP solver in the loop at N=64 knots
(reference examples/track_iiwa_pcg.cu + include/mpcsim.cuh) -- as ONE
XLA program (lax.scan over control updates, everything device-resident)
and reports the per-control-update latency.  The reference must fit each
update into a 2000 us real-time budget at 500 Hz
(reference include/common/settings.cuh:76-78,173-175); vs_baseline is
that budget divided by our per-update latency (>1 = faster than
real-time).

Default configuration (round 5): `--linsys auto` -- the only backend
that is correct on all 21 reference trajectory pairs (zero false
latches on healthy pairs, rescues the preconditioner-hostile 1_0 --
results/round4/tpu_all_pairs.json); its un-latched path runs the
flagship pcg solver below, with the chunked failover latch
(SolverConfig.failover_check_every) amortizing the backend cond to
zero measured overhead.  The pcg branch uses the whole-solve PCG
megakernel (every SQP
iteration of an update in ONE Pallas dispatch, lead-layout CG) at the
TPU-retuned iteration cap -- hardware bit-exact vs the staged stage-
kernel path (results/round3/megasolve_check.json) and ~17 us/update
faster; round 4 tiles the per-knot stages in-kernel so it engages at
any N <= 128 or N % 128 == 0 (hardware bit-exact at N=256/512), with
automatic fallback to the staged fused kernels elsewhere.  --linsys bcr /
bcr_pcg select the exact cyclic-reduction solve and its CG hybrid
(faster per update, but f32 CR is not backward stable on these
cond~1e7 systems and slowly biases long closed-loop runs; see
RESULTS.md).

Prints ONE JSON line.
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time
from pathlib import Path

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--updates", type=int, default=256)
    ap.add_argument("--linsys", default="auto",
                    choices=["pcg", "bcr", "bcr_pcg", "pcg_pallas", "dense",
                             "qdldl", "auto"],
                    help="'auto' (default since round 5) = pcg with the "
                    "error-gated rho-bail monitor, failing over to bcr_pcg "
                    "when BOTH EMAs trip (SolverConfig.failover_*; the "
                    "pair-1_0 rescue).  The chunked latch "
                    "(failover_check_every) amortizes the backend cond, so "
                    "auto costs no more than plain pcg on healthy pairs "
                    "(results/round5/bench_auto.json: 237.4 vs 262.7 us)")
    ap.add_argument("--megakernel", action="store_true",
                    help="iteration-scope megakernel (one Pallas dispatch "
                    "per SQP iteration; slower than --mega-solve, kept as "
                    "a hardware-bit-exact alternate)")
    ap.add_argument("--mega-solve", action=argparse.BooleanOptionalAction,
                    default=True,
                    help="whole-solve megakernel: all SQP iterations in one "
                    "Pallas dispatch (the flagship: 267 vs 284 us/update "
                    "staged at N=64, hardware bit-exact -- "
                    "results/round3/bench_megasolve.json; use "
                    "--no-mega-solve for the staged stage-kernel path). "
                    "Engages at N <= 128 or N %% 128 == 0 for pcg "
                    "(sqp.megakernel_engages); automatic staged fallback "
                    "elsewhere.")
    ap.add_argument("--sqp-max-iter", type=int, default=4)
    ap.add_argument("--batch", type=int, default=1,
                    help="throughput mode: track B independent arms "
                    "concurrently (vmap over the closed loop); reports "
                    "aggregate control updates/s per chip")
    ap.add_argument("--packed", action="store_true",
                    help="with --batch: pack the B arms into one lane "
                    "batch solved by the arm-packed whole-solve "
                    "megakernel (B*N <= 128 single-tile, or any "
                    "multiple of 128 multi-tile) instead of vmapping "
                    "the portable path")
    ap.add_argument("--mat-bands", action="store_true",
                    help="canonical-layout band copies before the "
                    "megakernels' in-kernel CG loop (bit-identical; "
                    "SolverConfig.megakernel_mat_bands)")
    ap.add_argument("--pcg-max-iter", type=int, default=None)
    ap.add_argument("--pcg-exit-tol", type=float, default=None)
    ap.add_argument("--pcg-check-every", type=int, default=None,
                    help="chunked exit-tolerance checking in the fused "
                    "PCG kernel (PCGConfig.exit_check_every)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from mpcgpu_tpu.utils.compcache import enable_persistent_cache
    enable_persistent_cache()

    from mpcgpu_tpu.config import SolverConfig, default_pcg_exit_tols
    from mpcgpu_tpu.models.robot import iiwa14
    from mpcgpu_tpu.sim import simulate_mpc_scan
    from mpcgpu_tpu.sqp import megakernel_engages, sqp_solve
    from mpcgpu_tpu.utils.trajfiles import load_fixture_pair, horizon_slices

    n = args.n
    budget_us = 2000.0
    n_updates = args.updates     # ~0.5 s of tracking at 500 Hz
    linsys = args.linsys

    fixtures = Path(__file__).resolve().parent / "tests" / "fixtures"
    xu, ee = load_fixture_pair(fixtures, 0, 0)
    model = iiwa14()

    # the whole-solve megakernel only serves the pcg backend
    # (sqp.py:219); keep other backends' defaults unchanged.  In auto
    # mode the pcg branch of the failover cond still gets it (sqp_solve
    # gates per-branch via megakernel_engages).
    mega_solve = args.mega_solve and linsys in ("pcg", "auto")
    cfg = dataclasses.replace(
        SolverConfig.for_knots(n, sqp_max_iter=args.sqp_max_iter),
        pallas_stages=True,      # fused lane-batched stage kernels
        megakernel=args.megakernel or mega_solve,
        megakernel_solve=mega_solve,
        megakernel_mat_bands=args.mat_bands,
    )
    if args.pcg_max_iter is not None:
        cfg = dataclasses.replace(
            cfg, pcg=dataclasses.replace(cfg.pcg, max_iter=args.pcg_max_iter))
    if args.pcg_check_every is not None:
        cfg = dataclasses.replace(
            cfg, pcg=dataclasses.replace(cfg.pcg,
                                         exit_check_every=args.pcg_check_every))

    X, U, goals, xs = horizon_slices(xu, ee, n)
    X = jnp.asarray(X); U = jnp.asarray(U)
    xu_j = jnp.asarray(xu); ee_j = jnp.asarray(ee)
    lam = jnp.zeros((n, 14), jnp.float32)
    rho = jnp.asarray(1e-3, jnp.float32)
    tol = (args.pcg_exit_tol if args.pcg_exit_tol is not None
           else default_pcg_exit_tols(n)[0])  # reference-tuned per-N tol
    if args.pcg_max_iter is None and linsys in ("pcg", "auto"):
        # TPU-retuned iteration caps: the reference's GPU-tuned values are
        # ~4x too high here (results/round2/cap_sweep.json)
        from mpcgpu_tpu.config import PCGConfig

        cfg = dataclasses.replace(
            cfg, pcg=dataclasses.replace(
                cfg.pcg, max_iter=PCGConfig.tpu_tuned_max_iter(n)))

    # warm-up: a few chained solves to warm-start lam (REMOVE_JITTERS,
    # reference mpcsim.cuh:259-279); auto mode starts on its pcg branch.
    # ONE jitted scan program (round-5: the old eager 5-dispatch loop was
    # a second cold-compile risk on the driver-timeout path, VERDICT r4
    # item 1b).
    from functools import partial

    warm_ls = "pcg" if linsys == "auto" else linsys

    @partial(jax.jit, static_argnames=("cfg_", "linsys_", "iters"))
    def _warm_lam(model_, cfg_, X_, U_, lam_, goals_, xs_, rho_, tol_,
                  linsys_, iters=5):
        def step(c, _):
            lam_c, rho_c = c
            r = sqp_solve(model_, cfg_, X_, U_, lam_c, goals_, xs_, rho_c,
                          tol_, linsys_)
            return (r.lam, r.rho), None
        (lam_out, _), _ = jax.lax.scan(step, (lam_, rho_), None, length=iters)
        return lam_out

    lam = _warm_lam(model, cfg, X, U, lam, jnp.asarray(ee[:n]),
                    jnp.asarray(xs), rho, 1e-11, warm_ls)
    rho = jnp.asarray(1e-3, jnp.float32)

    # compile + correctness pass
    if args.batch > 1:
        from mpcgpu_tpu.sim import (simulate_mpc_scan_batched,
                                    simulate_mpc_scan_packed)

        if args.packed:
            run = lambda: simulate_mpc_scan_packed(
                model, cfg, xu_j, ee_j, X, U, lam, rho, tol, n_updates,
                batch=args.batch)
        else:
            run = lambda: simulate_mpc_scan_batched(
                model, cfg, xu_j, ee_j, X, U, lam, rho, tol, n_updates,
                linsys, batch=args.batch)
        out = run()
        errs = np.asarray(out["tracking_errors"])       # (B, n_updates)
        shifted = np.asarray(out["shifted"])
        if shifted.ndim > 1:        # vmapped mode stacks the shared schedule
            shifted = shifted[0]
        te = errs[:, shifted]
    else:
        run = lambda: simulate_mpc_scan(model, cfg, xu_j, ee_j, X, U, lam,
                                        rho, tol, n_updates, linsys)
        out = run()
        errs = np.asarray(out["tracking_errors"])
        shifted = np.asarray(out["shifted"])
        te = errs[shifted]

    # timed: pipelined-dispatch slope (utils/benchtime.py) -- the remote
    # attachment's ~30 ms dispatch+fetch constant cancels between the m=1
    # and m=4 measurements, leaving pure device time per control update.
    from mpcgpu_tpu.utils.benchtime import pipelined_slope_us

    per_update, dispatch_const_us, _, wall_us = pipelined_slope_us(
        run, lambda o: np.asarray(o["tracking_errors"]), n_updates)
    if args.batch > 1:
        # throughput story: B arms advance one control update per
        # per_update us -> aggregate updates/s/chip
        agg = args.batch * 1e6 / per_update
        print(json.dumps({
            "metric": f"iiwa_mpc_batched_throughput_n{n}_b{args.batch}",
            "value": round(agg, 0),
            "unit": "updates/s/chip",
            "vs_baseline": round(agg / (1e6 / budget_us), 2),
            "detail": {
                "device": str(jax.devices()[0]),
                "linsys": linsys,
                "batch": args.batch,
                "packed": bool(args.packed),
                "us_per_batched_update": round(per_update, 1),
                "arm_rate_hz": round(1e6 / per_update, 1),
                "within_budget": per_update <= budget_us,
                "n_updates": n_updates,
                "dispatch_const_us": round(dispatch_const_us, 0),
                "avg_tracking_error_m": round(float(te.mean()), 4),
                "max_tracking_error_m": round(float(te.max()), 4),
                "budget_us": budget_us,
            },
        }), flush=True)
        return 0
    print(
        json.dumps(
            {
                "metric": f"iiwa_mpc_closed_loop_update_latency_n{n}",
                "value": round(per_update, 1),
                "unit": "us",
                "vs_baseline": round(budget_us / per_update, 3),
                "detail": {
                    "device": str(jax.devices()[0]),
                    "linsys": linsys,
                    # actual engagement, not the config flag (the flag is
                    # ignored for combinations the megakernel doesn't
                    # cover).  auto's un-latched path solves with "pcg",
                    # so engagement is the pcg branch's.
                    "megakernel": megakernel_engages(
                        cfg, "pcg" if linsys == "auto" else linsys),
                    "megakernel_solve": bool(
                        megakernel_engages(
                            cfg, "pcg" if linsys == "auto" else linsys)
                        and cfg.megakernel_solve
                        and linsys in ("pcg", "auto")),
                    "mat_bands": bool(cfg.megakernel_mat_bands),
                    "n_updates": n_updates,
                    "pcg_max_iter": cfg.pcg.max_iter,
                    "pcg_check_every": cfg.pcg.exit_check_every,
                    "wall_us_m4_dispatches": round(wall_us, 0),
                    "dispatch_const_us": round(dispatch_const_us, 0),
                    "avg_tracking_error_m": round(float(te.mean()), 4),
                    "max_tracking_error_m": round(float(te.max()), 4),
                    "avg_sqp_iters": round(float(np.asarray(out["sqp_iters"]).mean()), 2),
                    "avg_pcg_iters_per_update": round(
                        float(np.asarray(out["pcg_iters_total"]).mean()), 1
                    ),
                    **({"failed_over_updates": int(
                        np.asarray(out["failed_over"]).sum())}
                       if "failed_over" in out else {}),
                    "budget_us": budget_us,
                },
            }
        ),
        flush=True,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
