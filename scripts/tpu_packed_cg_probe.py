#!/usr/bin/env python3
"""Cost split of the ARM-PACKED whole-solve megakernel vs single-arm.

The packed B=2/N=64 closed loop measures 609 us/batched update vs 267 us
single-arm (results/round3/bench_packed_b2.json) -- 2.3x, not the "~price
of one" lane-fill theory predicts.  Candidate causes: (a) `_pdot` does B
separate full-width reductions per CG dot (2 dots/iter); (b) the
candidate-major line search spans 8*B*N lanes (2x the tiles); (c)
lockstep CG runs to the slowest arm.  This probe separates (a) from
(b)+(c) by cap-sweeping BOTH kernels with tol=0 (cap-bound, so lockstep
is moot) under the identical slope protocol and least-squares fitting
marginal us/CG-iteration and fixed us/solve.

    python scripts/tpu_packed_cg_probe.py [--n 64 --arms 2]

Archives results/round3/packed_cg_probe_n{n}_b{arms}.json.
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
    ap.add_argument("--arms", type=int, default=2)
    ap.add_argument("--sqp-iters", type=int, default=4)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    import __graft_entry__ as g
    from mpcgpu_tpu.config import SolverConfig
    from mpcgpu_tpu.ops.pallas.sqp_megakernel import (
        sqp_solve_mega_pcg, sqp_solve_mega_pcg_packed)

    n = args.n
    B = args.arms
    assert B * n <= 128, "packed envelope"
    k_sqp = args.sqp_iters
    dev = jax.devices()[0]
    print(f"device: {dev}, N={n}, B={B}, sqp_iters={k_sqp}")
    results = {"device": str(dev), "n": n, "arms": B, "sqp_iters": k_sqp}

    model, (X, U, lam, goals, xs) = g._problem(n)
    cfg = SolverConfig.for_knots(n, sqp_max_iter=k_sqp)
    f32 = X.dtype
    nx, nu = cfg.state_size, cfg.nu
    static = (cfg.timestep, cfg.cost.qd_cost, cfg.cost.r_cost,
              cfg.integrator_type, cfg.gravity, cfg.cost.hessian,
              cfg.merit_mu, cfg.num_alphas, cfg.rho_factor, cfg.rho_min,
              cfg.rho_max, cfg.rho_reset, cfg.angle_wrap,
              cfg.cost.tracking, cfg.cost.q_cost)

    # single-arm lane inputs
    goals_l1 = goals[:, :3].T
    Ul1 = jnp.concatenate([U, jnp.zeros((1, nu), U.dtype)]).T
    Xl1 = X.T
    lam_l1 = lam.T

    # packed inputs: B perturbed copies of the same instance (same
    # construction as tests/test_megakernel.py::test_packed_arms_*)
    rng = np.random.default_rng(7)
    Xb = jnp.stack([X + 0.02 * jnp.asarray(rng.normal(size=X.shape), f32)
                    for _ in range(B)])
    pack = lambda Ab: jnp.reshape(jnp.transpose(Ab, (2, 0, 1)), (-1, B * n))
    Ub = jnp.broadcast_to(U, (B,) + U.shape)
    Xl = pack(Xb)
    Ul = pack(jnp.concatenate([Ub, jnp.zeros((B, 1, nu), f32)], axis=1))
    laml = pack(jnp.broadcast_to(lam, (B,) + lam.shape))
    goals_l = jnp.tile(goals[:, :3].T, (1, B))
    xs_l = jnp.repeat(Xb[:, 0].T, n, axis=1)
    rho_l = jnp.full((1, B * n), 1e-3, f32)

    # NOTE: the lam carry must stay COLD (lam0 each step, with only a
    # negligible data dependency on the previous solve's duals) -- feeding
    # the converged duals back in makes r0 ~ 0 and the CG loop exits at
    # iteration ~0 regardless of cap, so the sweep would measure only the
    # fixed cost (that flaw is why mega_cg_probe's cap column is flat).
    def single_factory(cap):
        def step(carry):
            Xc, lamc = carry
            outs = sqp_solve_mega_pcg(
                model, Xc, Ul1, goals_l1, xs, lamc,
                jnp.asarray(1e-3, f32), jnp.asarray(1.0, f32),
                jnp.asarray(1e30, f32), cap, jnp.asarray(0.0, f32), k_sqp,
                *static)
            return (Xc * 0.99999 + 1e-9 * outs[0],
                    lam_l1 + 1e-30 * outs[2])
        return step

    def packed_factory(cap):
        def step(carry):
            Xc, lamc = carry
            outs = sqp_solve_mega_pcg_packed(
                model, Xc, Ul, goals_l, xs_l, lamc, rho_l,
                jnp.ones_like(rho_l), cap, jnp.asarray(0.0, f32), B, k_sqp,
                *static)
            return (Xc * 0.99999 + 1e-9 * outs[0],
                    laml + 1e-30 * outs[2])
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
    for tag, factory, carry in (
            ("single", single_factory, (Xl1, lam_l1)),
            ("packed", packed_factory, (Xl, laml))):
        per = {}
        try:
            for cap in caps:
                us = slope_time(factory(cap), carry)
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

    out = REPO / "results" / "round3" / f"packed_cg_probe_n{n}_b{B}.json"
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(results, indent=1))
    print(f"-> {out}")


if __name__ == "__main__":
    main()


