#!/usr/bin/env python3
"""Pin down sqp_solve's per-call FIXED cost (the closed-loop 'base').

The round-3 microbench showed the non-SQP device work (_mpc_update:
rollout + shift + re-injection) is ~0-20 us/update, while the closed
loop's base is ~300 us -- so the base must be per-solve fixed overhead
inside sqp_solve (initial merit, while_loop machinery, stats plumbing,
inter-kernel glue).  This script times scans at TWO lengths and uses the
slope (no noisy 1-iteration subtraction) to decompose:

  solve_fixed_1it   : sqp_solve, 1 SQP iter, instant-exit PCG
  solve_fixed_2it   : same at 2 iters (slope = marginal iteration)
  solve_megasolve   : whole-solve megakernel variant at 1 / 2 / 4 iters
  mpc_update        : the non-SQP step, slope-timed for confirmation

    python scripts/tpu_base_profile.py [--n 64]
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


def slope_time(fn, carry, label, results, k1=64, k2=320):
    """us/iter from the slope between two scan lengths."""
    import jax

    @partial(jax.jit, static_argnames=("k",))
    def run(c, k):
        return jax.lax.scan(lambda c, _: (fn(c), None), c, None, length=k)[0]

    def t(k):
        out = run(carry, k)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = run(carry, k)
            np.asarray(jax.tree_util.tree_leaves(out)[0])
            best = min(best, time.perf_counter() - t0)
        return best * 1e6

    per_iter = (t(k2) - t(k1)) / (k2 - k1)
    results[label] = round(per_iter, 2)
    print(f"{label}: {per_iter:.1f} us/iter", flush=True)
    return per_iter


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print(f"device: {dev.platform}, N={args.n}")

    import __graft_entry__ as g
    from mpcgpu_tpu.config import PCGConfig, SolverConfig
    from mpcgpu_tpu.sqp import sqp_solve

    n = args.n
    model, (X, U, lam, goals, xs) = g._problem(n)
    rho = jnp.asarray(1e-3, jnp.float32)
    results = {"device": str(dev), "n": n}

    # warm duals + huge tol -> the PCG loop exits at iteration ~0, so the
    # measured time is (fixed overhead) + k * (iteration minus the CG work)
    big_tol = jnp.asarray(1e6, jnp.float32)

    def solve_step_factory(sqp_iters, mega_solve):
        cfg = dataclasses.replace(
            SolverConfig.for_knots(n, sqp_max_iter=sqp_iters),
            pallas_stages=True, megakernel=True,
            megakernel_solve=mega_solve,
            pcg=PCGConfig(max_iter=PCGConfig.tpu_tuned_max_iter(n)),
        )

        def step(carry):
            Xc, lamc = carry
            res = sqp_solve(model, cfg, Xc, U, lamc, goals, xs, rho,
                            big_tol, "pcg")
            return (Xc * 0.99999 + 1e-9 * res.X, res.lam)

        return step

    for mega_solve in (False, True):
        tag = "megasolve" if mega_solve else "megaiter"
        try:
            t1 = slope_time(solve_step_factory(1, mega_solve), (X, lam),
                            f"solve_{tag}_1it_n{n}_us", results)
            t2 = slope_time(solve_step_factory(2, mega_solve), (X, lam),
                            f"solve_{tag}_2it_n{n}_us", results)
            t4 = slope_time(solve_step_factory(4, mega_solve), (X, lam),
                            f"solve_{tag}_4it_n{n}_us", results)
            marg = (t4 - t2) / 2
            results[f"solve_{tag}_marginal_iter_n{n}_us"] = round(marg, 2)
            results[f"solve_{tag}_fixed_n{n}_us"] = round(t1 - marg, 1)
            print(f"[{tag}] marginal iter {marg:.1f} us, "
                  f"fixed {t1 - marg:.1f} us", flush=True)
        except Exception as e:
            results[f"solve_{tag}_error"] = repr(e)[:300]
            print(f"[{tag}] ERROR {e!r}", flush=True)

    # non-SQP step, slope-timed
    from mpcgpu_tpu.sim import _mpc_update
    from mpcgpu_tpu.utils.trajfiles import load_fixture_pair

    xu_full, ee_full = load_fixture_pair(REPO / "tests" / "fixtures", 0, 0)
    xu_j = jnp.asarray(xu_full); ee_j = jnp.asarray(ee_full)
    cfg1 = dataclasses.replace(SolverConfig.for_knots(n, sqp_max_iter=1),
                               pallas_stages=True)
    max_sub = int(np.ceil(2000e-6 / cfg1.sim_step_time)) + 1

    def update_step(carry):
        x, Xc, Uc, Gc, Lc = carry
        xs_n, Xn, Un, Gn, Ln, err = _mpc_update(
            model, cfg1, x, Xc, Uc, Gc, Lc, Uc, xu_j, ee_j,
            jnp.int32(5), jnp.float32(0.0), jnp.float32(2000.0),
            jnp.bool_(True), max_sub)
        return (xs_n, Xn, Un, Gn, Ln)

    slope_time(update_step, (xs, X, U, goals, lam), f"mpc_update_n{n}_us",
               results)

    out = Path(args.out) if args.out else (
        REPO / "results" / "round3" / f"base_profile_n{n}.json")
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(results, indent=1))
    print(f"-> {out}")


if __name__ == "__main__":
    main()
