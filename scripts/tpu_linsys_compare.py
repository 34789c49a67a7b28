#!/usr/bin/env python3
"""Per-solve linear-solver time comparison on TPU (round-4 VERDICT item 1b).

Reproduces the reference's TIME_LINSYS experiment (reference
include/common/settings.cuh:109-118 brackets only the linear solve;
experiments/02_long_running.py:1-32 compares PCG against the QDLDL CPU
LDL' oracle over a tracking run): per-solve time distributions for

  * pcg      -- fused stair-preconditioned CG kernel, TPU-tuned cap,
                per-N exit tol, warm-started duals (the flagship)
  * bcr      -- exact block-cyclic-reduction kernel (fused at N<=256,
                portable XLA at N=512)
  * bcr_pcg  -- BCR-preconditioned warm CG hybrid
  * qdldl    -- host C++ LDL' (native/ldl.cpp), the reference's oracle

Protocol: a short host-loop tracking run on fixture (0,0) snapshots the
solver inputs (X, U, lam, rho) before every update's solve; for each
snapshot the Schur system is formed once and each backend solves it
repeatedly inside a lax.scan (device time, dispatch overhead excluded --
CLAUDE.md honest-measurement recipe).  The warm-start lam is the actual
loop-carried dual vector at that update, so pcg/bcr_pcg run exactly the
iterations they run in production.  qdldl is timed on the host with the
band->CSC assembly split out (the reference writes CSR values on the GPU,
so only factor+solve is the oracle's honest per-solve cost; the D2H/H2D
transfer is excluded because this attachment's ~30 ms tunnel constant
would swamp the PCIe-class microseconds of co-located hardware).

    python scripts/tpu_linsys_compare.py [--ns 32 64 128 256 512]
        [--updates 48] [--stride 3]

Archives results/round4/linsys_compare_tpu.json.
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time
from functools import partial
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from mpcgpu_tpu.utils.compcache import enable_persistent_cache  # noqa: E402
enable_persistent_cache()

import numpy as np  # noqa: E402


def device_time_us(fn, carry, iters=32, repeats=5):
    """Device time per iteration of fn inside a lax.scan (CSE-defeated).

    Best-of-`repeats` on BOTH slope points: a single wall measurement over
    the remote attachment jitters by ~1 ms, which at iters=128 is +-10 us
    of noise per solve -- enough to drive ~5 us PCG solves negative (the
    round-4 first-cut archive).  min() is the right location estimator for
    one-sided dispatch noise; with it the slope is stable to ~1 us."""
    import jax

    @partial(jax.jit, static_argnames=("k",))
    def run(c, k):
        return jax.lax.scan(lambda c, _: (fn(c), None), c, None, length=k)[0]

    def timed(k, reps):
        out = run(carry, k)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            out = run(carry, k)
            np.asarray(jax.tree_util.tree_leaves(out)[0])
            best = min(best, time.perf_counter() - t0)
        return best * 1e6

    def slope(reps):
        return (timed(iters, reps) - timed(1, reps)) / max(iters - 1, 1)

    s = slope(repeats)
    if s < 0:
        # noise exceeded signal despite best-of-repeats (a loaded chip
        # or an OS hiccup): retry harder, then clamp -- a negative
        # device time must never reach an archive (round-4 VERDICT
        # item 5)
        s = slope(3 * repeats)
    return max(s, 0.0)


def collect_snapshots(model, cfg, xu, ee, n_updates, stride):
    """Short tracking run; snapshot (X, U, lam, rho) before each solve."""
    import jax.numpy as jnp

    from mpcgpu_tpu.sim import _mpc_update, make_shift_schedule
    from mpcgpu_tpu.sqp import sqp_solve
    from mpcgpu_tpu.utils.trajfiles import horizon_slices

    n = cfg.knot_points
    X, U, goals, xs = horizon_slices(xu, ee, n)
    X = jnp.asarray(X); U = jnp.asarray(U)
    goals = jnp.asarray(ee[:n]); xs = jnp.asarray(xs)
    xu_j = jnp.asarray(xu); ee_j = jnp.asarray(ee)
    lam = jnp.zeros((n, 14), jnp.float32)
    rho = jnp.asarray(1e-3, jnp.float32)

    # REMOVE_JITTERS warm start
    res = sqp_solve(model, cfg, X, U, lam, goals, xs, rho, 1e-11, "pcg")
    for _ in range(4):
        res = sqp_solve(model, cfg, X, U, res.lam, goals, xs, res.rho,
                        1e-11, "pcg")
    lam = res.lam
    rho = jnp.asarray(1e-3, jnp.float32)

    do_shift, offsets = make_shift_schedule(cfg, n_updates)
    max_sub = int(np.ceil(cfg.simulation_period_us * 1e-6 /
                          cfg.sim_step_time)) + 1
    tol = jnp.asarray(1e-5, jnp.float32)

    snaps = []
    U_prev, first = U, True
    for u in range(n_updates):
        if u % stride == 0:
            snaps.append((X, U, lam, rho, float(rho)))
        res = sqp_solve(model, cfg, X, U, lam, goals, xs, rho, tol, "pcg")
        X, U, lam, rho = res.X, res.U, res.lam, res.rho
        U_post = U
        xs, X, U, goals, lam, _err = _mpc_update(
            model, cfg, xs, X, U, goals, lam, U_prev, xu_j, ee_j,
            offsets[u], jnp.float32(0.0 if first else
                                    cfg.simulation_period_us),
            jnp.float32(cfg.simulation_period_us), do_shift[u], max_sub)
        U_prev, first = U_post, False
    return snaps, goals, xs


def bench_n(n: int, n_updates: int, stride: int, scan_iters: int):
    import jax
    import jax.numpy as jnp

    from mpcgpu_tpu.config import (PCGConfig, SolverConfig,
                                   default_pcg_exit_tols)
    from mpcgpu_tpu.linsys.qdldl_host import _btd_upper_csc, _cached_solver
    from mpcgpu_tpu.models.robot import iiwa14
    from mpcgpu_tpu.ops.btridiag import BlockTri
    from mpcgpu_tpu.ops.btsolve import bcr_solve
    from mpcgpu_tpu.ops.pallas.kkt_schur_kernel import (
        form_kkt_schur_pallas, form_kkt_schur_tiled)
    from mpcgpu_tpu.ops.pallas.pcg_kernel import pcg_dz_pallas_lanes
    from mpcgpu_tpu.utils.trajfiles import load_fixture_pair

    cap = PCGConfig.tpu_tuned_max_iter(n)
    tol = default_pcg_exit_tols(n)[0]
    cfg = dataclasses.replace(
        SolverConfig.for_knots(n, sqp_max_iter=4), pallas_stages=True)
    cfg = dataclasses.replace(
        cfg, pcg=dataclasses.replace(cfg.pcg, max_iter=cap))
    model = iiwa14()
    xu, ee = load_fixture_pair(REPO / "tests" / "fixtures", 0, 0)

    print(f"[n={n}] collecting snapshots...", flush=True)
    snaps, goals, xs = collect_snapshots(model, cfg, xu, ee, n_updates,
                                         stride)
    form = form_kkt_schur_pallas if n <= 128 else form_kkt_schur_tiled
    interp = jax.default_backend() != "tpu"
    l2k = lambda a: np.transpose(np.asarray(a), (2, 0, 1))

    per = {"pcg": [], "bcr": [], "bcr_pcg": [], "qdldl_factor_solve": [],
           "qdldl_assembly_host": [], "pcg_rel_residual": []}
    iters_rec = {"pcg": [], "bcr_pcg": []}
    tol_j = jnp.asarray(tol, jnp.float32)

    for si, (X, U, lam, rho, _rho_f) in enumerate(snaps):
        ls = form(model, X, U, goals, xs, rho, cfg.timestep,
                  cfg.cost.qd_cost, cfg.cost.r_cost, interpret=interp)
        lam_l = lam.T

        # --- pcg (fused stair-PCG kernel, warm lam, production tol/cap)
        def pcg_step(l0):
            lam_new, dX, dU, it, hit = pcg_dz_pallas_lanes(
                ls, l0, cap, tol_j, interpret=interp)
            return l0 + 1e-20 * lam_new  # same solve every scan iteration

        per["pcg"].append(device_time_us(pcg_step, lam_l, scan_iters))
        lam_prod, _, _, it, _ = jax.jit(
            lambda l0: pcg_dz_pallas_lanes(ls, l0, cap, tol_j,
                                           interpret=interp))(lam_l)
        iters_rec["pcg"].append(int(it))

        # cap-hit honesty (round-5 VERDICT item 9): the flagship runs at
        # a high cap-hit rate by design (truncation-as-damping); record
        # the actual dual quality the truncated warm-started solve
        # delivers -- relative residual ||S lam - gamma|| / ||gamma|| of
        # the production-cap solution at the production warm start.
        S_bt = BlockTri(jnp.asarray(l2k(ls.SL)), jnp.asarray(l2k(ls.SD)),
                        jnp.asarray(l2k(ls.SU)))
        gam_t = jnp.asarray(np.asarray(ls.gamma).T)
        from mpcgpu_tpu.ops.btridiag import spmv as _spmv

        r = np.asarray(_spmv(S_bt, jnp.asarray(np.asarray(lam_prod).T)))
        r = r - np.asarray(gam_t)
        per["pcg_rel_residual"].append(
            float(np.linalg.norm(r) / max(np.linalg.norm(
                np.asarray(gam_t)), 1e-30)))

        # --- bcr (exact): fused kernel at N<=256, portable XLA at 512
        if n <= 256:
            from mpcgpu_tpu.ops.pallas.bcr_kernel import bcr_dz_pallas_lanes

            def bcr_step(s):
                ls_s = ls._replace(gamma=ls.gamma + 1e-20 * s)
                lam_new, dX, dU, it, hit = bcr_dz_pallas_lanes(
                    ls_s, interpret=interp)
                return s + 1e-20 * lam_new[0, 0]

            per["bcr"].append(device_time_us(bcr_step, jnp.float32(1.0),
                                             scan_iters))
        else:
            S = BlockTri(jnp.asarray(l2k(ls.SL)), jnp.asarray(l2k(ls.SD)),
                         jnp.asarray(l2k(ls.SU)))
            gam = jnp.asarray(np.asarray(ls.gamma).T)

            def bcr_step(s):
                lam_new = bcr_solve(S, gam + 1e-20 * s)
                return s + 1e-20 * lam_new[0, 0]

            per["bcr"].append(device_time_us(bcr_step, jnp.float32(1.0),
                                             max(scan_iters // 2, 8)))

        # --- bcr_pcg hybrid
        if n <= 256:
            from mpcgpu_tpu.ops.pallas.bcr_kernel import (
                bcr_pcg_dz_pallas_lanes)

            def hyb_step(l0):
                lam_new, dX, dU, it, hit = bcr_pcg_dz_pallas_lanes(
                    ls, l0, cap, tol_j, interpret=interp)
                return l0 + 1e-20 * lam_new

            per["bcr_pcg"].append(device_time_us(hyb_step, lam_l,
                                                 scan_iters))
            _, _, _, it, _ = jax.jit(
                lambda l0: bcr_pcg_dz_pallas_lanes(ls, l0, cap, tol_j,
                                                   interpret=interp))(lam_l)
            iters_rec["bcr_pcg"].append(int(it))

        # --- qdldl host oracle: factor+solve (assembly split out).
        # Band layout matches BlockTri (lane k of SL/SD/SU is row k's
        # block in column k-1/k/k+1; sqp.py:299-303 uses the same l2k).
        lower_k, diag_k, upper_k = l2k(ls.SL), l2k(ls.SD), l2k(ls.SU)
        gam_np = np.asarray(ls.gamma).T
        solver = _cached_solver(n, 14)
        reps = 20
        t0 = time.perf_counter()
        for _ in range(reps):
            Ap, Ai, Ax = _btd_upper_csc(lower_k, diag_k, upper_k)
        t_asm = (time.perf_counter() - t0) * 1e6 / reps
        solver.solve_csc(Ap, Ai, Ax, gam_np)  # symbolic once, like reference
        t0 = time.perf_counter()
        for _ in range(reps):
            sol = solver.solve_csc(Ap, Ai, Ax, gam_np)
        t_fs = (time.perf_counter() - t0) * 1e6 / reps
        per["qdldl_assembly_host"].append(t_asm)
        per["qdldl_factor_solve"].append(t_fs)
        if si == 0:
            # correctness cross-check vs the fused pcg duals
            lam_pcg, *_ = jax.jit(
                lambda l0: pcg_dz_pallas_lanes(ls, l0, 500,
                                               jnp.asarray(1e-10,
                                                           jnp.float32),
                                               interpret=interp))(lam_l)
            num = float(np.abs(np.asarray(lam_pcg).T - sol).max())
            den = float(np.abs(sol).max())
            rel = num / max(den, 1e-30)
            print(f"  [n={n}] qdldl-vs-pcg dual rel maxdiff {rel:.2e}",
                  flush=True)
        print(f"  snap {si}: pcg {per['pcg'][-1]:.0f}us "
              f"({iters_rec['pcg'][-1]}it) bcr {per['bcr'][-1]:.0f}us "
              f"qdldl {per['qdldl_factor_solve'][-1]:.0f}us", flush=True)

    def stats(v):
        a = np.asarray(v, np.float64)
        if not a.size:
            return {}
        return {"mean_us": round(float(a.mean()), 1),
                "p50_us": round(float(np.median(a)), 1),
                "p95_us": round(float(np.percentile(a, 95)), 1),
                "min_us": round(float(a.min()), 1),
                "max_us": round(float(a.max()), 1),
                "n_solves": int(a.size)}

    resid = per.pop("pcg_rel_residual")
    row = {k: stats(v) for k, v in per.items() if v}
    row["per_solve_us"] = {k: [round(float(x), 1) for x in v]
                           for k, v in per.items() if v}
    if resid:
        a = np.asarray(resid, np.float64)
        row["pcg_rel_residual"] = {
            "mean": float(f"{a.mean():.3e}"),
            "p50": float(f"{np.median(a):.3e}"),
            "max": float(f"{a.max():.3e}"),
            "note": "||S lam - gamma||/||gamma|| of the production-cap "
                    "warm-started PCG solution (cap-hit honesty metric)"}
    row["pcg_iters"] = iters_rec["pcg"]
    if iters_rec["bcr_pcg"]:
        row["bcr_pcg_iters"] = iters_rec["bcr_pcg"]
    row["pcg_cap"] = cap
    row["pcg_exit_tol"] = tol
    if row.get("qdldl_factor_solve") and row.get("pcg"):
        row["speedup_pcg_vs_qdldl"] = round(
            row["qdldl_factor_solve"]["mean_us"] / row["pcg"]["mean_us"], 1)
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ns", type=int, nargs="*",
                    default=[32, 64, 128, 256, 512])
    ap.add_argument("--updates", type=int, default=48)
    ap.add_argument("--stride", type=int, default=3)
    ap.add_argument("--scan-iters", type=int, default=128)
    ap.add_argument("--cpu", action="store_true",
                    help="force CPU (env vars are too late in this "
                    "image, CLAUDE.md)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    dev = jax.devices()[0]
    print(f"device: {dev}")
    results = {
        "device": str(dev),
        "protocol": "per-solve linsys times over snapshots of a real "
        "tracking run (warm duals as carried); device time via lax.scan, "
        "dispatch excluded; qdldl host factor+solve with band->CSC "
        "assembly split out (reference writes CSR on-GPU); transfers "
        "excluded (tunnel artifact)",
        "reference": "include/common/settings.cuh:109-118 TIME_LINSYS; "
        "experiments/02_long_running.py",
        "rows": {}}
    out = REPO / "results" / "round5" / "linsys_compare_tpu.json"
    out.parent.mkdir(parents=True, exist_ok=True)

    for n in args.ns:
        t0 = time.time()
        try:
            row = bench_n(n, args.updates, args.stride, args.scan_iters)
        except Exception as e:
            import traceback
            traceback.print_exc()
            row = {"error": repr(e)[:300]}
        results["rows"][f"n{n}"] = row
        print(f"n{n}: done in {time.time() - t0:.0f}s", flush=True)
        out.write_text(json.dumps(results, indent=1))
    print(f"-> {out}")


if __name__ == "__main__":
    main()
