"""Bisect the arm-packed megakernel's remote-compile crash (HTTP 500).

Compiles each sub-stage of sqp_solve_mega_pcg_packed as its own Pallas
kernel on the real TPU, in dependency order, and records which stage
first kills the Mosaic compiler.  The staged single-arm twins of every
stage are hardware-proven, so the first failing stage isolates the
packed-specific construct at fault.

Usage:  python scripts/probe_packed_bisect.py [--n 64] [--b 2] \
            [--stages perknot pcg ls iter solve]
Writes results/round3/packed_bisect.json incrementally.
"""
from __future__ import annotations

import argparse
import functools
import json
import sys
import time
import traceback
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--b", type=int, default=2)
    ap.add_argument("--stages", nargs="*",
                    default=["perknot", "pcg", "ls", "iter", "solve"])
    ap.add_argument("--out", default=str(REPO / "results" / "round3" /
                                         "packed_bisect.json"))
    ap.add_argument("--cpu", action="store_true",
                    help="interpreter-mode smoke of the probe itself")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update("jax_default_matmul_precision", "highest")
    print("device:", jax.devices()[0])

    import __graft_entry__ as g
    from mpcgpu_tpu.config import SolverConfig
    from mpcgpu_tpu.ops.pallas import lanedyn as ld
    from mpcgpu_tpu.ops.pallas import sqp_megakernel as mk
    from mpcgpu_tpu.ops.pallas.kkt_schur_kernel import _perknot

    n, b_arms = args.n, args.b
    nt = b_arms * n
    model, (X, U, lam, goals, xs) = g._problem(n)
    cfg = SolverConfig.for_knots(n, sqp_max_iter=4)
    f32 = jnp.float32
    nx, nu, nq = cfg.state_size, cfg.nu, cfg.nq
    rng = np.random.default_rng(11)
    Xb = jnp.stack([
        jnp.asarray(np.asarray(X) + 0.02 * rng.normal(size=X.shape), f32)
        for _ in range(b_arms)])
    pack = lambda Ab: jnp.reshape(
        jnp.transpose(Ab, (2, 0, 1)), (-1, b_arms * n))
    Ub = jnp.broadcast_to(U, (b_arms,) + U.shape)
    Xl = pack(Xb)
    Ul = pack(jnp.concatenate([Ub, jnp.zeros((b_arms, 1, nu), f32)], axis=1))
    laml = pack(jnp.broadcast_to(lam, (b_arms,) + lam.shape))
    goals_l = jnp.tile(goals[:, :3].T, (1, b_arms))
    xs_l = jnp.repeat(Xb[:, 0].T, n, axis=1)
    rho_full = jnp.full((nx, nt), 1e-3, f32)
    drho_full = jnp.ones((nx, nt), f32)

    static = dict(dt=cfg.timestep, qd_cost=cfg.cost.qd_cost,
                  r_cost=cfg.cost.r_cost, integrator_type=cfg.integrator_type,
                  gravity=cfg.gravity, hessian=cfg.cost.hessian,
                  mu=cfg.merit_mu, num_alphas=cfg.num_alphas,
                  rho_factor=cfg.rho_factor, rho_min=cfg.rho_min,
                  rho_max=cfg.rho_max, rho_reset=cfg.rho_reset)

    def probe_kernel(stage, max_iter_ref, tol_ref, x_ref, u_ref, goals_ref,
                     xs_ref, lam0_ref, rho_ref, drho_ref,
                     hc, hs, hk, dhc, dhs, dhk, xc, xs_t, xk, i_ref, out_ref):
        x_tab = (xc[:], xs_t[:], xk[:])
        h_tab = (hc[:], hs[:], hk[:])
        dh_tab = (dhc[:], dhs[:], dhk[:])
        I_tab = i_ref[:]
        X0, U0 = x_ref[:], u_ref[:]
        goals_k, xs_k = goals_ref[:], xs_ref[:]
        rho_l, drho_l = rho_ref[:], drho_ref[:]
        max_iter, tol = max_iter_ref[0], tol_ref[0]
        dtype = X0.dtype
        s = static

        if stage == "perknot":
            (A, Bm, f_pred, Qinv, Rinv, qg, rg, AQi, T, t_vec,
             Qiq) = _perknot(nq, nu, s["dt"], s["qd_cost"], s["r_cost"],
                             s["integrator_type"], s["gravity"], s["hessian"],
                             rho_l, X0, U0, goals_k, x_tab, h_tab, dh_tab,
                             I_tab)
            out_ref[:] = ld.lane_matvec(Qinv, qg) + f_pred
            return

        if stage == "ls":
            bm, ba = mk._line_search_packed(
                nq, nu, s["dt"], s["qd_cost"], s["r_cost"],
                s["integrator_type"], s["gravity"], s["mu"], s["num_alphas"],
                b_arms, n, X0, U0, X0 * 0.01, U0 * 0.01, goals_k, xs_k,
                x_tab, h_tab, I_tab)
            out_ref[:] = bm + ba
            return

        if stage == "pcg":
            (A, Bm, f_pred, Qinv, Rinv, qg, rg, AQi, T, t_vec,
             Qiq) = _perknot(nq, nu, s["dt"], s["qd_cost"], s["r_cost"],
                             s["integrator_type"], s["gravity"], s["hessian"],
                             rho_l, X0, U0, goals_k, x_tab, h_tab, dh_tab,
                             I_tab)
            m1v, mNv = mk._seg_masks(n, nt, dtype)
            m1, mN = m1v[None], mNv[None]
            x_next = pltpu.roll(X0, nt - 1, axis=1)
            err = x_next - f_pred
            c = pltpu.roll(err, 1, axis=1) * m1v
            theta = Qinv + pltpu.roll(T, 1, axis=2) * m1
            phi = -pltpu.roll(AQi, 1, axis=2) * m1
            SU = -ld.lane_transpose(AQi) * mN
            gamma = Qiq - pltpu.roll(t_vec, 1, axis=1) * m1v - c
            theta_inv = ld.spd_inverse_lane(theta)
            PL = -ld.lane_matmul(ld.lane_matmul(theta_inv, phi),
                                 pltpu.roll(theta_inv, 1, axis=2)) * m1
            PU = -ld.lane_matmul(ld.lane_matmul(theta_inv, SU),
                                 pltpu.roll(theta_inv, nt - 1, axis=2)) * mN
            arm_masks = mk._arm_lane_masks(b_arms, n, dtype, rows=nx)
            lam_k, iters, eta = mk._pcg_loop_packed(
                ld.lane_transpose(phi), ld.lane_transpose(theta),
                ld.lane_transpose(SU), ld.lane_transpose(PL),
                ld.lane_transpose(theta_inv), ld.lane_transpose(PU),
                gamma, lam0_ref[:], max_iter, tol, arm_masks)
            out_ref[:] = lam_k + eta
            return

        if stage == "iter":
            (Xn, Un, lam_k, rhon, drhon, meritn, _acc, _bail, _it,
             _eta) = mk._iteration_pcg_packed(
                nq, nu, s["dt"], s["qd_cost"], s["r_cost"],
                s["integrator_type"], s["gravity"], s["hessian"], s["mu"],
                s["num_alphas"], s["rho_factor"], s["rho_min"], s["rho_max"],
                s["rho_reset"], False, "eepos", 1.0, b_arms, n,
                X0, U0, goals_k, xs_k, lam0_ref[:], rho_l, drho_l,
                jnp.full_like(rho_l, 1e6), max_iter, tol,
                x_tab, h_tab, dh_tab, I_tab)
            out_ref[:] = Xn + lam_k + rhon + meritn
            return
        raise ValueError(stage)

    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    sds = jax.ShapeDtypeStruct

    def run_stage(stage):
        if stage == "solve":
            rho_row = jnp.full((1, nt), 1e-3, f32)
            out = mk.sqp_solve_mega_pcg_packed(
                model, Xl, Ul, goals_l, xs_l, laml, rho_row,
                jnp.ones_like(rho_row), 16, jnp.asarray(1e-9, f32),
                b_arms, 4, static["dt"], static["qd_cost"],
                static["r_cost"], static["integrator_type"],
                static["gravity"], static["hessian"], static["mu"],
                static["num_alphas"], static["rho_factor"],
                static["rho_min"], static["rho_max"], static["rho_reset"])
            return float(jnp.sum(out[0]))
        out = pl.pallas_call(
            functools.partial(probe_kernel, stage),
            out_shape=sds((nx, nt), f32),
            in_specs=[smem, smem] + [vmem] * 17,
            out_specs=vmem,
            interpret=args.cpu,
        )(
            jnp.asarray(16, jnp.int32).reshape(1),
            jnp.asarray(1e-9, f32).reshape(1),
            Xl, Ul, goals_l, xs_l, laml, rho_full, drho_full,
            model.Hc, model.Hs, model.Hk, model.dHc, model.dHs, model.dHk,
            model.Xc, model.Xs, model.Xk, model.I,
        )
        return float(jnp.sum(out))

    results = {"n": n, "b": b_arms, "ts": time.time()}
    for stage in args.stages:
        t0 = time.time()
        try:
            val = run_stage(stage)
            ok = bool(np.isfinite(val))
            results[stage] = {"ok": ok, "sum": val,
                              "compile_s": round(time.time() - t0, 1)}
        except Exception:
            results[stage] = {"ok": False,
                              "compile_s": round(time.time() - t0, 1),
                              "error": traceback.format_exc()[-600:]}
        print(stage, results[stage].get("ok"),
              f"{results[stage]['compile_s']}s", flush=True)
        Path(args.out).write_text(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
