#!/usr/bin/env python3
"""Per-stage device-time microbenchmark for the fused solver kernels.

Measures each fused stage inside a lax.scan (device-resident, outputs fed
back to defeat CSE/DCE), so per-iteration numbers exclude dispatch
overhead -- the honest-measurement recipe for this remote-attached TPU
(CLAUDE.md).  Informs where the SQP-iteration time actually goes before
optimizing (megakernel vs fewer PCG iterations vs faster SpMV).

    python scripts/tpu_stage_microbench.py [--n 64] [--iters 200]
"""
from __future__ import annotations

import argparse
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


def timed_scan(fn, carry, iters, label, results, repeats=5):
    """Device time per iteration of fn inside a lax.scan.

    Best-of-`repeats` on BOTH slope points (round-4 lesson, CLAUDE.md):
    single walls over the remote attachment jitter by ~1 ms, which
    differenced negative for sub-10-us stages in the round-3 archive.
    A still-negative slope is retried harder, then clamped to 0 with a
    flag -- negative microseconds must never reach an archive."""
    import jax

    @partial(jax.jit, static_argnames=("k",))
    def run(c, k):
        return jax.lax.scan(lambda c, _: (fn(c), None), c,
                            None, length=k)[0]

    def timed(k, reps):
        out = run(carry, k)                       # compile + warm
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            out = run(carry, k)
            np.asarray(jax.tree_util.tree_leaves(out)[0])
            best = min(best, time.perf_counter() - t0)
        return best * 1e6

    def slope(reps):
        dt = timed(iters, reps)
        dt1 = timed(1, reps)
        return (dt - dt1) / max(iters - 1, 1), dt

    per_iter, dt = slope(repeats)
    clamped = False
    if per_iter < 0:
        per_iter, dt = slope(3 * repeats)
        if per_iter < 0:
            per_iter, clamped = 0.0, True
    results[label] = {"us_per_iter": round(per_iter, 2),
                      "wall_us_total": round(dt, 1)}
    if clamped:
        results[label]["sub_noise_clamped"] = True
    print(f"{label}: {per_iter:.1f} us/iter" + (" (sub-noise, clamped)"
                                                if clamped else ""))
    return per_iter


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--iters", type=int, default=200)
    ap.add_argument("--pcg-iters", type=int, default=140,
                    help="fixed CG iteration count for the PCG stage bench")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print(f"device: {dev.platform}, N={args.n}")

    import __graft_entry__ as g
    from mpcgpu_tpu.ops.pallas.kkt_schur_kernel import (
        form_kkt_schur_pallas, form_kkt_schur_tiled)
    from mpcgpu_tpu.ops.pallas.merit_kernel import line_search_merits_pallas
    from mpcgpu_tpu.ops.pallas.pcg_kernel import pcg_dz_pallas_lanes

    n = args.n
    model, (X, U, lam, goals, xs) = g._problem(n)
    rho = jnp.asarray(1e-3, jnp.float32)
    results = {"device": str(dev), "n": n, "iters": args.iters,
               "pcg_iters_fixed": args.pcg_iters}

    form = form_kkt_schur_pallas if n <= 128 else form_kkt_schur_tiled
    interp = jax.default_backend() != "tpu"

    # --- stage 1: KKT + Schur formation ---
    def kkt_step(Xc):
        ls = form(model, Xc, U, goals, xs, rho, 0.015625, 1e-4, 1e-3,
                  interpret=interp)
        return Xc + 1e-12 * ls.gamma.T  # feed back to defeat CSE

    timed_scan(kkt_step, X, args.iters, f"kkt_schur_n{n}", results)

    # --- stage 2: PCG + dz at a fixed iteration count (tol=0) ---
    ls0 = form(model, X, U, goals, xs, rho, 0.015625, 1e-4, 1e-3,
               interpret=interp)

    def pcg_step(lam_l):
        lam_new, dX, dU, it, hit = pcg_dz_pallas_lanes(
            ls0, lam_l, args.pcg_iters, jnp.asarray(0.0, jnp.float32),
            interpret=interp)
        return lam_new * 0.999  # feed back

    t_pcg = timed_scan(pcg_step, lam.T, max(args.iters // 4, 20),
                       f"pcg_dz_{args.pcg_iters}it_n{n}", results)
    results[f"pcg_us_per_cg_iter_n{n}"] = round(t_pcg / args.pcg_iters, 3)
    print(f"  -> {t_pcg / args.pcg_iters:.2f} us per CG iteration")

    # --- stage 2b: exact BCR solve + dz (the PCG alternative); the fused
    # kernel's production envelope is N <= 256 (sqp.py gates N=512 to the
    # portable solve: refinement buffers exceed the 16 MB scoped VMEM) ---
    if n <= 256:
        from mpcgpu_tpu.ops.pallas.bcr_kernel import bcr_dz_pallas_lanes

        def bcr_step(scale):
            ls_s = ls0._replace(gamma=ls0.gamma * scale)
            lam_new, dX, dU, it, hit = bcr_dz_pallas_lanes(ls_s,
                                                           interpret=interp)
            return scale * 0.9999 + 1e-20 * lam_new[0, 0]

        timed_scan(bcr_step, jnp.float32(1.0), max(args.iters // 4, 20),
                   f"bcr_dz_n{n}", results)

    # --- stage 3: 9-candidate merit line search ---
    dX0 = 1e-3 * jnp.ones_like(X)
    dU0 = 1e-3 * jnp.ones_like(U)

    def merit_step(Xc):
        m = line_search_merits_pallas(
            model, Xc, U, dX0, dU0, 8, goals, xs, 0.015625, 10.0, 1e-4,
            1e-3, interpret=interp)
        return Xc + 1e-12 * m[0]

    timed_scan(merit_step, X, args.iters, f"merit_n{n}", results)

    # --- full marginal SQP iteration (sqp_solve at 2 vs 6 iters) ---
    from mpcgpu_tpu.config import PCGConfig, SolverConfig
    import dataclasses

    def solve_time(sqp_iters, linsys="pcg", mega=False, reps=24):
        cfg = dataclasses.replace(
            SolverConfig.for_knots(n, sqp_max_iter=sqp_iters),
            pallas_stages=True, megakernel=mega)

        @partial(jax.jit, static_argnames=())
        def run(Xc):
            def body(c, _):
                res = _solve(Xc, c)
                return c * 0.999 + 1e-12 * res, None
            return jax.lax.scan(body, jnp.float32(1.0), None, length=reps)[0]

        from mpcgpu_tpu.sqp import sqp_solve

        def _solve(Xc, scale):
            res = sqp_solve(model, cfg, Xc * (1.0 + 1e-9 * scale), U, lam,
                            goals, xs, rho, jnp.asarray(1e-5, jnp.float32),
                            linsys)
            return res.stats.final_merit

        out = run(X); np.asarray(out)
        t0 = time.perf_counter()
        out = run(X); np.asarray(out)
        return (time.perf_counter() - t0) * 1e6 / reps

    for linsys, mega in (("pcg", False), ("bcr", False), ("bcr", True)):
        try:
            t2 = solve_time(2, linsys, mega)
            t6 = solve_time(6, linsys, mega)
        except Exception as e:
            results[f"sqp_{linsys}{'_mega' if mega else ''}_error"] = repr(e)[:200]
            continue
        marginal = (t6 - t2) / 4
        tag = f"{linsys}{'_mega' if mega else ''}"
        results[f"sqp_solve_2it_{tag}_n{n}_us"] = round(t2, 1)
        results[f"sqp_solve_6it_{tag}_n{n}_us"] = round(t6, 1)
        results[f"sqp_marginal_iter_{tag}_n{n}_us"] = round(marginal, 2)
        print(f"[{tag}] solve 2it {t2:.0f} us, 6it {t6:.0f} us -> "
              f"marginal SQP iteration {marginal:.1f} us")

    # --- closed-loop base decomposition: the non-SQP per-update cost
    # (rollout + shift + bookkeeping) = t(1 iter) - marginal ---
    from mpcgpu_tpu.sim import simulate_mpc_scan
    from mpcgpu_tpu.utils.trajfiles import load_fixture_pair

    xu_full, ee_full = load_fixture_pair(REPO / "tests" / "fixtures", 0, 0)
    xu_j = jnp.asarray(xu_full); ee_j = jnp.asarray(ee_full)

    def loop_time(sqp_iters, linsys="bcr", mega=False, n_updates=128):
        cfg = dataclasses.replace(
            SolverConfig.for_knots(n, sqp_max_iter=sqp_iters),
            pallas_stages=True, megakernel=mega)
        o = simulate_mpc_scan(model, cfg, xu_j, ee_j, X, U, lam, rho,
                              1e-5, n_updates, linsys)
        np.asarray(o["tracking_errors"])
        t0 = time.perf_counter()
        o = simulate_mpc_scan(model, cfg, xu_j, ee_j, X, U, lam, rho,
                              1e-5, n_updates, linsys)
        np.asarray(o["tracking_errors"])
        return (time.perf_counter() - t0) * 1e6 / n_updates

    for linsys, mega in (("bcr", False), ("bcr", True)):
        try:
            t1 = loop_time(1, linsys, mega)
            t4 = loop_time(4, linsys, mega)
        except Exception as e:
            results[f"loop_{linsys}{'_mega' if mega else ''}_error"] = repr(e)[:200]
            continue
        tag = f"{linsys}{'_mega' if mega else ''}"
        marg = (t4 - t1) / 3
        results[f"loop_1it_{tag}_n{n}_us"] = round(t1, 1)
        results[f"loop_4it_{tag}_n{n}_us"] = round(t4, 1)
        results[f"loop_marginal_{tag}_n{n}_us"] = round(marg, 2)
        results[f"loop_base_{tag}_n{n}_us"] = round(t1 - marg, 1)
        print(f"[loop {tag}] 1it {t1:.0f} us, 4it {t4:.0f} us -> marginal "
              f"{marg:.1f} us, base {t1 - marg:.0f} us")

    # --- base decomposition: what the ~310 us non-SQP per-update cost
    # is made of (round-3; informs whether rollout fusion or solve fixed
    # overhead is the next latency lever) ---
    from mpcgpu_tpu.ops.pallas.rollout_kernel import plant_rollout_pallas
    from mpcgpu_tpu.sim import _mpc_update, _shift_horizon

    cfg1 = dataclasses.replace(SolverConfig.for_knots(n, sqp_max_iter=1),
                               pallas_stages=True)
    max_sub = int(np.ceil(2000e-6 / cfg1.sim_step_time)) + 1

    def rollout_step(x):
        xs_new, err = plant_rollout_pallas(
            model, x, U, goals[0], jnp.float32(0.0), jnp.float32(2000.0),
            cfg1.timestep, cfg1.sim_step_time, max_sub, cfg1.gravity)
        return x * 0.9999 + 1e-12 * xs_new

    timed_scan(rollout_step, xs, args.iters, f"rollout_kernel_n{n}",
               results)

    def shift_step(carry):
        Xc, Uc, Gc, Lc = carry
        Xs, Us, Gs, Ls = _shift_horizon(Xc, Uc, Gc, Lc, xu_j, ee_j,
                                        jnp.int32(5))
        return (Xs * 0.9999, Us, Gs, Ls)

    timed_scan(shift_step, (X, U, goals, lam), args.iters,
               f"shift_n{n}", results)

    def update_step(carry):
        x, Xc, Uc, Gc, Lc = carry
        xs_n, Xn, Un, Gn, Ln, err = _mpc_update(
            model, cfg1, x, Xc, Uc, Gc, Lc, Uc, xu_j, ee_j,
            jnp.int32(5), jnp.float32(0.0), jnp.float32(2000.0),
            jnp.bool_(True), max_sub)
        return (xs_n, Xn, Un, Gn, Ln)

    timed_scan(update_step, (xs, X, U, goals, lam), args.iters,
               f"mpc_update_nonsqp_n{n}", results)

    out = Path(args.out) if args.out else (
        REPO / "results" / f"stage_microbench_n{n}.json")
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(results, indent=1))
    print(f"-> {out}")


if __name__ == "__main__":
    main()
