#!/usr/bin/env python3
"""Decompose the CG iteration inside the fused PCG kernel: SpMV cost vs
dot-product (cross-lane reduction) cost, and reduction formulations.

The per-CG-iteration cost goes superlinear with horizon (1.28 / 1.75 /
5.19 us at N = 64 / 256 / 512, results/round3/pcg_cost_n*.json); the
suspects are the two full-array dot reductions per iteration once the
lane axis spans multiple 128-wide tiles.  Variants, each a fixed-100-
iteration loop in one Pallas kernel over the flagship-shaped operands:

  spmv_only   : two band SpMVs per iter, no dots (alpha/beta fixed)
  dots_only   : two jnp.sum(a*b) dots per iter, no SpMV
  full        : the production _pcg_loop at tol=0 (cap-bound)
  full_2stage : _pcg_loop with dots as sum(axis=0) -> lane row-sum
  spmv_lead   : SpMVs with bands pre-transposed to (j, i, N) so the
                per-band-element extract is a LEADING-dim slab pick
                instead of a middle(sublane)-dim offset extract
  spmv_rowred : (i, j, N) bands, leading-dim extract per OUTPUT row,
                sublane-reduction contraction (risky: Mosaic has
                rejected this shape before; errors are recorded)
  full_lead   : the whole CG loop on (j, i, N) bands

    python scripts/tpu_cg_probe.py [--n 64] [--cpu] [--modes a,b,...]

Archives results/round3/cg_probe_n{n}.json.
"""
from __future__ import annotations

import argparse
import functools
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

ITERS = 100


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--scan-iters", type=int, default=100)
    ap.add_argument("--modes", type=str, default="")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    import __graft_entry__ as g
    from mpcgpu_tpu.config import SolverConfig
    from mpcgpu_tpu.ops.pallas.kkt_schur_kernel import (
        form_kkt_schur_pallas, form_kkt_schur_tiled)
    from mpcgpu_tpu.ops.pallas.pcg_kernel import _band_spmv, _pcg_loop

    interp = args.cpu
    n = args.n
    dev = jax.devices()[0]
    print(f"device: {dev}, N={n}")
    results = {"device": str(dev), "n": n, "loop_iters": ITERS}

    model, (X, U, lam, goals, xs) = g._problem(n)
    cfg = SolverConfig.for_knots(n, sqp_max_iter=4)
    form = form_kkt_schur_pallas if n <= 128 else form_kkt_schur_tiled
    ls = form(model, X, U, goals, xs, jnp.float32(1e-3), cfg.timestep,
              cfg.cost.qd_cost, cfg.cost.r_cost, cfg.integrator_type,
              cfg.gravity, cfg.cost.hessian, True, cfg.angle_wrap,
              cfg.cost.tracking, cfg.cost.q_cost, interpret=interp)
    lam_l = lam.T

    def dot_full(a, b):
        return jnp.sum(a * b)

    def dot_2stage(a, b):
        # sublane reduce first -> (1, N), then a lane reduction on the
        # single remaining row
        return jnp.sum(jnp.sum(a * b, axis=0, keepdims=True))

    def spmv_lead(Lt, Dt, Ut, x):
        """Bands pre-transposed to (j, i, N): extracts are leading-dim
        slab picks (no sublane-offset relayout)."""
        n_ = x.shape[1]
        s = x.shape[0]
        xm = pltpu.roll(x, 1, axis=1)
        xp = pltpu.roll(x, n_ - 1, axis=1)
        acc = Dt[0] * x[0:1, :]
        for j in range(1, s):
            acc = acc + Dt[j] * x[j:j + 1, :]
        for j in range(s):
            acc = acc + Lt[j] * xm[j:j + 1, :]
            acc = acc + Ut[j] * xp[j:j + 1, :]
        return acc

    def spmv_rowred(L, D, U, x):
        """Original (i, j, N) bands, leading-dim extract per OUTPUT row;
        contraction via a sublane reduction instead of broadcasts."""
        n_ = x.shape[1]
        xm = pltpu.roll(x, 1, axis=1)
        xp = pltpu.roll(x, n_ - 1, axis=1)
        rows = []
        for i in range(x.shape[0]):
            t = D[i] * x + L[i] * xm + U[i] * xp
            rows.append(jnp.sum(t, axis=0, keepdims=True))
        return jnp.concatenate(rows, axis=0)

    def cg_loop_with(spmv, SL, SD, SU, PL, PD, PU, gamma, x,
                     dot=None):
        dot = dot or dot_full
        r = gamma - spmv(SL, SD, SU, x)
        p = spmv(PL, PD, PU, r)
        eta = dot(r, p)

        def body(c):
            lam_c, r_c, p_c, eta_c, i = c
            ups = spmv(SL, SD, SU, p_c)
            alpha = eta_c / dot(p_c, ups)
            lam_c = lam_c + alpha * p_c
            r_c = r_c - alpha * ups
            rt = spmv(PL, PD, PU, r_c)
            eta_new = dot(r_c, rt)
            p_c = rt + (eta_new / eta_c) * p_c
            return lam_c, r_c, p_c, eta_new, i + 1

        c = jax.lax.while_loop(lambda c: c[4] < ITERS, body,
                               (x, r, p, eta, jnp.int32(0)))
        return c[0]

    def variant_kernel(mode, sl, sd, su, pl_, pd, pu, gam, lam0, out_ref):
        x = lam0[:]
        SL, SD, SU = sl[:], sd[:], su[:]
        PL, PD, PU = pl_[:], pd[:], pu[:]
        gamma = gam[:]

        if mode in ("spmv_lead", "spmv_rowred", "full_lead", "full_rowred",
                    "full_lead2", "full_rowred2"):
            spmv = spmv_lead if "lead" in mode else spmv_rowred
            if mode.startswith("full"):
                dot = dot_2stage if mode.endswith("2") else dot_full
                out_ref[:] = cg_loop_with(spmv, SL, SD, SU, PL, PD, PU,
                                          gamma, x, dot=dot)
                return

            def body(c):
                y, i = c
                y1 = spmv(SL, SD, SU, y)
                y2 = spmv(PL, PD, PU, y1)
                return y * 0.999 + 1e-9 * y2, i + 1

            c = jax.lax.while_loop(lambda c: c[1] < ITERS, body,
                                   (x, jnp.int32(0)))
            out_ref[:] = c[0]
            return
        if mode == "full":
            lam_out, _, _ = _pcg_loop(SL, SD, SU, PL, PD, PU, gamma, x,
                                      jnp.int32(ITERS), 0.0)
            out_ref[:] = lam_out
            return
        if mode == "full_2stage":
            r = gamma - _band_spmv(SL, SD, SU, x)
            p = _band_spmv(PL, PD, PU, r)
            eta = dot_2stage(r, p)

            def body(c):
                lam_c, r_c, p_c, eta_c, i = c
                ups = _band_spmv(SL, SD, SU, p_c)
                alpha = eta_c / dot_2stage(p_c, ups)
                lam_c = lam_c + alpha * p_c
                r_c = r_c - alpha * ups
                rt = _band_spmv(PL, PD, PU, r_c)
                eta_new = dot_2stage(r_c, rt)
                p_c = rt + (eta_new / eta_c) * p_c
                return lam_c, r_c, p_c, eta_new, i + 1

            c = jax.lax.while_loop(lambda c: c[4] < ITERS, body,
                                   (x, r, p, eta, jnp.int32(0)))
            out_ref[:] = c[0]
            return
        if mode == "spmv_only":
            def body(c):
                y, i = c
                y1 = _band_spmv(SL, SD, SU, y)
                y2 = _band_spmv(PL, PD, PU, y1)
                return y * 0.999 + 1e-9 * y2, i + 1

            c = jax.lax.while_loop(lambda c: c[1] < ITERS, body,
                                   (x, jnp.int32(0)))
            out_ref[:] = c[0]
            return
        if mode == "dots_only":
            def body(c):
                y, acc, i = c
                d1 = dot_full(y, gamma)
                d2 = dot_full(y + d1 * 1e-9, y)
                return y * 0.999 + 1e-12 * d2, acc + d1, i + 1

            c = jax.lax.while_loop(lambda c: c[2] < ITERS, body,
                                   (x, jnp.float32(0.0), jnp.int32(0)))
            out_ref[:] = c[0] + c[1] * 1e-20
            return
        raise ValueError(mode)

    def run_variant(mode):
        f32 = ls.gamma.dtype
        s, n_ = ls.gamma.shape
        vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
        kern = pl.pallas_call(
            functools.partial(variant_kernel, mode),
            out_shape=jax.ShapeDtypeStruct((s, n_), f32),
            in_specs=[vmem] * 8,
            out_specs=vmem,
            interpret=interp,
        )
        # lead variants take bands pre-transposed to (j, i, N) by XLA
        tb = ((lambda b: jnp.swapaxes(b, 0, 1)) if "lead" in mode
              else (lambda b: b))
        bands = tuple(tb(b) for b in
                      (ls.SL, ls.SD, ls.SU, ls.PL, ls.PD, ls.PU))

        @partial(jax.jit, static_argnames=("k",))
        def scan(lam0, k):
            def body(c, _):
                o = kern(*bands, ls.gamma, c)
                return c * 0.999 + 1e-9 * o, None
            return jax.lax.scan(body, lam0, None, length=k)[0]

        k1, k2 = 8, args.scan_iters
        out = scan(lam_l, k2); np.asarray(out)

        def t(k):
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                o = scan(lam_l, k); np.asarray(o)
                best = min(best, time.perf_counter() - t0)
            return best * 1e6

        t(k1)
        per_call = (t(k2) - t(k1)) / (k2 - k1)
        per_iter = per_call / ITERS
        results[mode] = {"us_per_call": round(per_call, 2),
                         "us_per_cg_iter": round(per_iter, 3)}
        print(f"{mode}: {per_call:.1f} us/call -> {per_iter:.3f} "
              f"us/iteration", flush=True)

    all_modes = ("full", "spmv_only", "dots_only", "full_2stage",
                 "spmv_lead", "spmv_rowred", "full_lead")
    modes = args.modes.split(",") if args.modes else all_modes
    for mode in modes:
        try:
            run_variant(mode)
        except Exception as e:
            results[f"{mode}_error"] = repr(e)[:300]
            print(f"{mode}: ERROR {e!r}", flush=True)

    out = REPO / "results" / "round3" / f"cg_probe_n{n}.json"
    out.parent.mkdir(parents=True, exist_ok=True)
    if out.exists():  # merge partial-mode reruns into prior results
        prior = json.loads(out.read_text())
        prior.update(results)
        results = prior
    out.write_text(json.dumps(results, indent=1))
    print(f"-> {out}")


if __name__ == "__main__":
    main()
