#!/usr/bin/env python3
"""Measure the whole-solve megakernel's IN-KERNEL CG iteration cost and
test the offset-layout hypothesis.

Round-3 finding: the megakernel's in-kernel CG iteration runs ~2x the
dedicated PCG kernel's (CLAUDE.md round-4 targets).  Both run the SAME
_pcg_loop routine; the difference is how the band operands arrive -- the
dedicated kernel loads them from VMEM refs (canonical layout), while the
megakernel computes them via pltpu.roll / lane_transpose, which leave
Mosaic offset layouts that may be re-resolved inside EVERY CG iteration.

This probe cap-sweeps sqp_solve_mega_pcg (tol=0 -> cap-bound) with
mat_bands off/on (on = force one canonical-layout copy before the loop)
and least-squares fits marginal us/CG-iteration.

    python scripts/tpu_mega_cg_probe.py [--n 64]

Archives results/round5/mega_cg_probe_n{n}.json.
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--sqp-iters", type=int, default=4)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    import __graft_entry__ as g
    from mpcgpu_tpu.config import SolverConfig
    from mpcgpu_tpu.ops.pallas.sqp_megakernel import sqp_solve_mega_pcg

    n = args.n
    k_sqp = args.sqp_iters
    dev = jax.devices()[0]
    print(f"device: {dev}, N={n}, sqp_iters={k_sqp}")
    results = {"device": str(dev), "n": n, "sqp_iters": k_sqp}

    model, (X, U, lam, goals, xs) = g._problem(n)
    cfg = SolverConfig.for_knots(n, sqp_max_iter=k_sqp)
    goals_l = goals[:, :3].T
    Ul = jnp.concatenate([U, jnp.zeros((1, cfg.nu), U.dtype)]).T
    Xl = X.T
    lam_l = lam.T
    f32 = X.dtype

    def step_factory(cap, mat):
        def step(carry):
            Xc, lamc = carry
            outs = sqp_solve_mega_pcg(
                model, Xc, Ul, goals_l, xs, lamc,
                jnp.asarray(1e-3, f32), jnp.asarray(1.0, f32),
                jnp.asarray(1e30, f32), cap, jnp.asarray(0.0, f32), k_sqp,
                cfg.timestep, cfg.cost.qd_cost, cfg.cost.r_cost,
                cfg.integrator_type, cfg.gravity, cfg.cost.hessian,
                cfg.merit_mu, cfg.num_alphas, cfg.rho_factor, cfg.rho_min,
                cfg.rho_max, cfg.rho_reset, cfg.angle_wrap,
                cfg.cost.tracking, cfg.cost.q_cost, mat_bands=mat,
            )
            # keep the lam carry COLD: feeding converged duals back makes
            # r0 ~ 0 and CG exits at ~0 iterations regardless of cap, so
            # the sweep measures only fixed cost (the round-3 flaw that
            # produced this probe's original flat cap columns)
            return (Xc * 0.99999 + 1e-9 * outs[0], lam_l + 1e-30 * outs[2])
        return step

    def slope_time(fn, carry, k1=16, k2=80):
        @partial(jax.jit, static_argnames=("k",))
        def run(c, k):
            return jax.lax.scan(lambda c, _: (fn(c), None), c, None,
                                length=k)[0]

        def t(k):
            out = run(carry, k)
            np.asarray(jax.tree_util.tree_leaves(out)[0])
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                o = run(carry, k)
                np.asarray(jax.tree_util.tree_leaves(o)[0])
                best = min(best, time.perf_counter() - t0)
            return best * 1e6

        return (t(k2) - t(k1)) / (k2 - k1)

    caps = [8, 24, 40, 80]
    for mat in (False, True):
        tag = "mat" if mat else "base"
        per = {}
        try:
            for cap in caps:
                us = slope_time(step_factory(cap, mat), (Xl, lam_l))
                per[cap] = round(us, 2)
                print(f"{tag} cap={cap}: {us:.2f} us/solve", flush=True)
            xs_ = np.array(caps, float) * k_sqp
            ys = np.array([per[c] for c in caps])
            A = np.vstack([xs_, np.ones_like(xs_)]).T
            marg, fixed = np.linalg.lstsq(A, ys, rcond=None)[0]
            results[tag] = {
                "us_per_solve_by_cap": per,
                "marginal_us_per_cg_iter": round(float(marg), 3),
                "fixed_us_per_solve": round(float(fixed), 2),
            }
            print(f"[{tag}] marginal {marg:.3f} us/CG-iter, "
                  f"fixed {fixed:.1f} us/solve", flush=True)
        except Exception as e:
            results[f"{tag}_error"] = repr(e)[:300]
            print(f"[{tag}] ERROR {e!r}", flush=True)

    # correctness: mat on/off bit-compare at cap 40
    try:
        o0 = sqp_solve_mega_pcg(
            model, Xl, Ul, goals_l, xs, lam_l,
            jnp.asarray(1e-3, f32), jnp.asarray(1.0, f32),
            jnp.asarray(1e30, f32), 40, jnp.asarray(0.0, f32), k_sqp,
            cfg.timestep, cfg.cost.qd_cost, cfg.cost.r_cost,
            cfg.integrator_type, cfg.gravity, cfg.cost.hessian,
            cfg.merit_mu, cfg.num_alphas, cfg.rho_factor, cfg.rho_min,
            cfg.rho_max, cfg.rho_reset, cfg.angle_wrap,
            cfg.cost.tracking, cfg.cost.q_cost, mat_bands=False,
        )
        o1 = sqp_solve_mega_pcg(
            model, Xl, Ul, goals_l, xs, lam_l,
            jnp.asarray(1e-3, f32), jnp.asarray(1.0, f32),
            jnp.asarray(1e30, f32), 40, jnp.asarray(0.0, f32), k_sqp,
            cfg.timestep, cfg.cost.qd_cost, cfg.cost.r_cost,
            cfg.integrator_type, cfg.gravity, cfg.cost.hessian,
            cfg.merit_mu, cfg.num_alphas, cfg.rho_factor, cfg.rho_min,
            cfg.rho_max, cfg.rho_reset, cfg.angle_wrap,
            cfg.cost.tracking, cfg.cost.q_cost, mat_bands=True,
        )
        results["mat_vs_base_x_maxdiff"] = float(
            jnp.max(jnp.abs(o0[0] - o1[0])))
        results["mat_vs_base_lam_maxdiff"] = float(
            jnp.max(jnp.abs(o0[2] - o1[2])))
        print(f"mat vs base: x maxdiff {results['mat_vs_base_x_maxdiff']}, "
              f"lam maxdiff {results['mat_vs_base_lam_maxdiff']}")
    except Exception as e:
        results["compare_error"] = repr(e)[:300]

    out = REPO / "results" / "round5" / f"mega_cg_probe_n{n}.json"
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(results, indent=1))
    print(f"-> {out}")


if __name__ == "__main__":
    main()
