#!/usr/bin/env python3
"""Decompose the fused PCG+dz kernel's cost: fixed dispatch vs per-CG-
iteration, and the effect of chunked exit checking (exit_check_every).

Times the kernel inside a lax.scan at several FIXED iteration counts
(tol=0 so every solve runs exactly `cap` iterations), fits fixed +
marginal by least squares, and repeats with chunked exit.  Also checks
the chunked kernel is bit-identical to per-iteration exit when
cap-bound (the flagship's regime).

    python scripts/tpu_pcg_cost.py [--n 64]

Archives results/round3/pcg_cost_n{n}.json.
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--iters", type=int, default=200)
    ap.add_argument("--cpu", action="store_true",
                    help="CPU smoke (env vars are too late; see CLAUDE.md)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    import __graft_entry__ as g
    from mpcgpu_tpu.config import SolverConfig
    from mpcgpu_tpu.ops.pallas.kkt_schur_kernel import (
        form_kkt_schur_pallas, form_kkt_schur_tiled)
    from mpcgpu_tpu.ops.pallas.pcg_kernel import pcg_dz_pallas_lanes

    n = args.n
    dev = jax.devices()[0]
    print(f"device: {dev}, N={n}")
    results = {"device": str(dev), "n": n}

    model, (X, U, lam, goals, xs) = g._problem(n)
    cfg = SolverConfig.for_knots(n, sqp_max_iter=4)
    # tiled variant beyond the single-tile lane width (CLAUDE.md: the
    # monolithic kernel is gated to N <= 128)
    form = form_kkt_schur_pallas if n <= 128 else form_kkt_schur_tiled
    ls = form(
        model, X, U, goals, xs, jnp.float32(1e-3), cfg.timestep,
        cfg.cost.qd_cost, cfg.cost.r_cost, cfg.integrator_type,
        cfg.gravity, cfg.cost.hessian, True, cfg.angle_wrap,
        cfg.cost.tracking, cfg.cost.q_cost)
    lam_l = lam.T

    def timed_scan(fn, carry, iters):
        @partial(jax.jit, static_argnames=("k",))
        def run(c, k):
            return jax.lax.scan(lambda c, _: (fn(c), None), c, None,
                                length=k)[0]

        out = run(carry, iters)
        np.asarray(jax.tree_util.tree_leaves(out)[0])

        def t(k):
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                o = run(carry, k)
                np.asarray(jax.tree_util.tree_leaves(o)[0])
                best = min(best, time.perf_counter() - t0)
            return best * 1e6

        t(1)
        return (t(iters) - t(1)) / (iters - 1)

    def solver_step(cap, check_every):
        def step(lam_c):
            lam_new, dX, dU, it, hit = pcg_dz_pallas_lanes(
                ls, lam_c, cap, 0.0, check_every=check_every)
            # feed lam back (scaled to stay bounded) to defeat CSE
            return lam_c * 0.999 + 1e-6 * lam_new
        return step

    caps = [8, 24, 40, 80, 140]
    for ck in (1, 8):
        per = {}
        for cap in caps:
            us = timed_scan(solver_step(cap, ck), lam_l, args.iters)
            per[cap] = round(us, 2)
            print(f"check_every={ck} cap={cap}: {us:.2f} us/solve",
                  flush=True)
        xs_ = np.array(caps, float)
        ys = np.array([per[c] for c in caps])
        A = np.vstack([xs_, np.ones_like(xs_)]).T
        marg, fixed = np.linalg.lstsq(A, ys, rcond=None)[0]
        results[f"check{ck}"] = {
            "us_per_solve_by_cap": per,
            "marginal_us_per_cg_iter": round(float(marg), 3),
            "fixed_us_per_solve": round(float(fixed), 2),
        }
        print(f"check_every={ck}: marginal {marg:.3f} us/iter, "
              f"fixed {fixed:.1f} us/solve", flush=True)

    # bit-exactness when cap-bound (tol=0): chunked == per-iteration
    l1, _, _, it1, _ = pcg_dz_pallas_lanes(ls, lam_l, 40, 0.0)
    l8, _, _, it8, _ = pcg_dz_pallas_lanes(ls, lam_l, 40, 0.0,
                                           check_every=8)
    maxdiff = float(jnp.max(jnp.abs(l1 - l8)))
    results["chunk_bitexact_maxdiff"] = maxdiff
    results["chunk_iters"] = [int(it1), int(it8)]
    print(f"cap-bound chunked vs per-iter: maxdiff={maxdiff} "
          f"iters={int(it1)}/{int(it8)}")

    out = REPO / "results" / "round3" / f"pcg_cost_n{n}.json"
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(results, indent=1))
    print(f"-> {out}")


if __name__ == "__main__":
    main()
