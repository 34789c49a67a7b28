#!/usr/bin/env python3
"""On-hardware Pallas kernel regression: compile + run every fused kernel
across the reference's tuned horizon range and assert numeric agreement
with the portable XLA stages.

The pytest suite runs kernels in interpreter mode on CPU, so Mosaic
compile/layout regressions (the round-1 bug class) are invisible to it;
this script is the hardware gate.  Run under the default (TPU) env:

    python scripts/tpu_kernel_regression.py [--ns 32 64 128 256 512]

Archives pass/fail + max errors to results/kernel_regression_<dev>.json
and exits non-zero on any failure (compile crash or numeric mismatch).
"""
from __future__ import annotations

import argparse
import json
import re
import sys
import time
import traceback
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from mpcgpu_tpu.utils.compcache import enable_persistent_cache  # noqa: E402
enable_persistent_cache()

import numpy as np  # noqa: E402


def _maxerr(a, b):
    return float(np.abs(np.asarray(a) - np.asarray(b)).max())


def _relerr(a, b):
    """Max abs error relative to the target's scale (theta/Qinv entries are
    O(1/rho) = 1e3+, so absolute tolerances are meaningless there)."""
    b = np.asarray(b)
    return _maxerr(a, b) / max(float(np.abs(b).max()), 1e-12)


def check_kkt_schur(model, X, U, goals, xs, rho, results, n):
    import jax.numpy as jnp

    from mpcgpu_tpu.ops.kkt import form_kkt
    from mpcgpu_tpu.ops.schur import form_schur
    from mpcgpu_tpu.ops.pallas.kkt_schur_kernel import (
        form_kkt_schur_pallas, form_kkt_schur_tiled)

    kkt = form_kkt(model, X, U, goals, xs, 0.015625, 1e-4, 1e-3)
    sch = form_schur(kkt, rho, preconditioned=True)
    form = form_kkt_schur_pallas if n <= 128 else form_kkt_schur_tiled
    ls = form(model, X, U, goals, xs, rho, 0.015625, 1e-4, 1e-3,
              interpret=False)

    l2k = lambda a: np.transpose(np.asarray(a), (2, 0, 1))
    errs = {
        "theta": _relerr(l2k(ls.SD), sch.S.diag),
        "phi": _relerr(l2k(ls.SL), sch.S.lower),
        "su": _relerr(l2k(ls.SU), sch.S.upper),
        "gamma": _relerr(np.asarray(ls.gamma).T, sch.gamma),
        "pinv_diag": _relerr(l2k(ls.PD), sch.Pinv.diag),
        "pinv_lower": _relerr(l2k(ls.PL), sch.Pinv.lower),
        "pinv_upper": _relerr(l2k(ls.PU), sch.Pinv.upper),
    }
    # gamma tolerates 1e-3: it is Qinv-amplified (||Qinv|| ~ 1/rho = 1e3
    # turns f32 transcendental noise of ~1e-7 into ~1e-4 relative here)
    ok = all(e < 1e-4 for k, e in errs.items() if k != "gamma")
    ok = ok and errs["gamma"] < 1e-3
    results[f"kkt_schur_n{n}"] = {"ok": ok, "kernel": form.__name__, **errs}
    return ls, sch, kkt, ok


def check_pcg_dz(ls, sch, kkt, lam0, results, n):
    import jax.numpy as jnp

    from mpcgpu_tpu.ops.dz import compute_dz
    from mpcgpu_tpu.ops.pcg import pcg
    from mpcgpu_tpu.ops.pallas.pcg_kernel import pcg_dz_pallas_lanes

    max_iter, tol = 120, 1e-9
    lam_l, dX, dU, iters, hit = pcg_dz_pallas_lanes(
        ls, lam0.T, max_iter, jnp.asarray(tol, jnp.float32), interpret=False)
    ref = pcg(sch.S, sch.Pinv, sch.gamma, lam0, max_iter=max_iter,
              exit_tol=tol)
    dX_ref, dU_ref = compute_dz(kkt, sch, ref.lam)
    errs = {
        "lam": _relerr(np.asarray(lam_l).T, ref.lam),
        "dx": _relerr(dX, dX_ref),
        "du": _relerr(dU, dU_ref),
        "iters_fused": int(iters),
        "iters_ref": int(ref.iters),
    }
    ok = errs["lam"] < 1e-3 and errs["dx"] < 1e-3 and errs["du"] < 1e-3
    results[f"pcg_dz_n{n}"] = {"ok": ok, **errs}

    # chunked exit (exit_check_every > 1) must be bit-identical to the
    # per-iteration exit when the solve is cap-bound (tol = 0)
    lam_c1, _, _, it1, _ = pcg_dz_pallas_lanes(
        ls, lam0.T, 40, jnp.asarray(0.0, jnp.float32), interpret=False)
    lam_c8, _, _, it8, _ = pcg_dz_pallas_lanes(
        ls, lam0.T, 40, jnp.asarray(0.0, jnp.float32), interpret=False,
        check_every=8)
    cerrs = {"maxdiff": _maxerr(lam_c1, lam_c8),
             "iters": [int(it1), int(it8)]}
    cok = cerrs["maxdiff"] == 0.0 and int(it1) == int(it8) == 40
    results[f"pcg_dz_chunked_n{n}"] = {"ok": cok, **cerrs}
    return ok and cok


def check_bcr_dz(ls, sch, kkt, results, n):
    import jax.numpy as jnp

    from mpcgpu_tpu.ops.btridiag import spmv
    from mpcgpu_tpu.ops.btsolve import bcr_solve
    from mpcgpu_tpu.ops.dz import compute_dz
    from mpcgpu_tpu.ops.pallas.bcr_kernel import bcr_dz_pallas_lanes

    lam_l, dX, dU, _, _ = bcr_dz_pallas_lanes(ls, interpret=False)
    lam_ref = bcr_solve(sch.S, sch.gamma)
    dX_ref, dU_ref = compute_dz(kkt, sch, lam_ref)

    # solution-difference metrics are amplified by cond(S) at long
    # horizons; the correctness gate for an exact solver is the RESIDUAL
    def rel_res(lam):
        r = np.asarray(spmv(sch.S, jnp.asarray(lam))) - np.asarray(sch.gamma)
        return float(np.linalg.norm(r) / np.linalg.norm(np.asarray(sch.gamma)))

    errs = {
        "res_fused": rel_res(np.asarray(lam_l).T),
        "res_portable": rel_res(np.asarray(lam_ref)),
        "lam_vs_portable": _relerr(np.asarray(lam_l).T, lam_ref),
        "dx_vs_portable": _relerr(dX, dX_ref),
        "du_vs_portable": _relerr(dU, dU_ref),
    }
    ok = errs["res_fused"] < max(10.0 * errs["res_portable"], 1e-4)
    results[f"bcr_dz_n{n}"] = {"ok": ok, **errs}
    return ok


def check_bcr_pcg_dz(ls, sch, kkt, lam0, results, n):
    """Warm-started BCR-preconditioned CG hybrid (one fused kernel).

    Gate on the RESIDUAL like check_bcr_dz (the near-exact M converges in
    a handful of iterations; solution-difference metrics amplify cond(S)),
    and require the fused kernel to match the portable twin's iteration
    count (same eta exit policy)."""
    import jax.numpy as jnp

    import dataclasses

    from mpcgpu_tpu.config import SolverConfig
    from mpcgpu_tpu.ops.btridiag import spmv
    from mpcgpu_tpu.ops.btsolve import _solve_linsys_bcr_pcg
    from mpcgpu_tpu.ops.pallas.bcr_kernel import bcr_pcg_dz_pallas_lanes

    max_iter, tol = 12, 1e-8
    lam_l, dX, dU, iters, hit = bcr_pcg_dz_pallas_lanes(
        ls, lam0.T, max_iter, jnp.asarray(tol, jnp.float32), interpret=False)
    cfg = SolverConfig()
    cfg = dataclasses.replace(
        cfg, pcg=dataclasses.replace(cfg.pcg, max_iter=max_iter))
    lam_ref, iters_ref, _ = _solve_linsys_bcr_pcg(
        cfg, sch, jnp.asarray(lam0), jnp.asarray(tol, jnp.float32))

    def rel_res(lam):
        r = np.asarray(spmv(sch.S, jnp.asarray(lam))) - np.asarray(sch.gamma)
        return float(np.linalg.norm(r) / np.linalg.norm(np.asarray(sch.gamma)))

    errs = {
        "res_fused": rel_res(np.asarray(lam_l).T),
        "res_portable": rel_res(np.asarray(lam_ref)),
        "iters_fused": int(iters),
        "iters_ref": int(iters_ref),
    }
    ok = (errs["res_fused"] < max(10.0 * errs["res_portable"], 1e-4)
          and abs(errs["iters_fused"] - errs["iters_ref"]) <= 1)
    results[f"bcr_pcg_dz_n{n}"] = {"ok": ok, **errs}
    return ok


def check_merit(model, X, U, goals, xs, results, n):
    import jax.numpy as jnp

    from mpcgpu_tpu.ops import merit as merit_ops
    from mpcgpu_tpu.ops.pallas.merit_kernel import line_search_merits_pallas

    key_dX = 1e-3 * np.sin(np.arange(X.size)).reshape(X.shape)
    dX = jnp.asarray(key_dX, jnp.float32)
    dU = jnp.asarray(1e-3 * np.cos(np.arange(U.size)).reshape(U.shape),
                     jnp.float32)
    alphas = (1.0 / 2 ** jnp.arange(8)).astype(jnp.float32)
    got = line_search_merits_pallas(
        model, X, U, dX, dU, 8, goals, xs, 0.015625, 10.0, 1e-4, 1e-3,
        interpret=False)[:8]
    want = merit_ops.line_search_merits(
        model, X, U, dX, dU, alphas, goals, xs, 0.015625, 10.0, 1e-4, 1e-3)
    rel = float(np.max(np.abs(np.asarray(got) - np.asarray(want))
                       / np.maximum(np.abs(np.asarray(want)), 1e-6)))
    ok = rel < 2e-3
    results[f"merit_n{n}"] = {"ok": ok, "rel_err": rel}
    return ok


def check_megakernel(model, X, U, lam, goals, xs, results, n):
    """End-to-end: the whole-iteration megakernel (one Pallas dispatch per
    SQP iteration) must track the staged bcr path over a 2-iteration solve."""
    import dataclasses

    import jax.numpy as jnp

    from mpcgpu_tpu.config import SolverConfig
    from mpcgpu_tpu.sqp import sqp_solve

    base = dataclasses.replace(SolverConfig.for_knots(n, sqp_max_iter=2),
                               pallas_stages=True)
    rho = jnp.asarray(1e-3, jnp.float32)
    tol = jnp.asarray(1e-6, jnp.float32)
    rm = sqp_solve(model, dataclasses.replace(base, megakernel=True),
                   X, U, lam, goals, xs, rho, tol, "bcr")
    rs = sqp_solve(model, dataclasses.replace(base, megakernel=False),
                   X, U, lam, goals, xs, rho, tol, "bcr")
    errs = {
        "x": _relerr(rm.X, rs.X),
        "u": _relerr(rm.U, rs.U),
        "merit": abs(float(rm.stats.final_merit) - float(rs.stats.final_merit))
        / max(abs(float(rs.stats.final_merit)), 1e-9),
        "accept_match": bool(
            (np.asarray(rm.stats.accepted) == np.asarray(rs.stats.accepted))
            .all()),
    }
    ok = (errs["x"] < 1e-2 and errs["u"] < 1e-2 and errs["merit"] < 1e-2
          and errs["accept_match"])
    results[f"megakernel_n{n}"] = {"ok": ok, **errs}
    return ok


def check_envelope_knobs(model, X, U, goals, xs, rho, results, n):
    """Round-3 envelope closure: angle_wrap and joint-space tracking in
    the fused KKT+Schur kernel must compile on hardware and match the
    portable path (the two former NotImplementedError knobs)."""
    import jax.numpy as jnp

    from mpcgpu_tpu.ops.kkt import form_kkt
    from mpcgpu_tpu.ops.schur import form_schur
    from mpcgpu_tpu.ops.pallas.kkt_schur_kernel import form_kkt_schur_pallas

    # angle wrap: push q near pi so the reflection fires
    Xw = X + jnp.concatenate(
        [jnp.full((n, 7), 3.0, jnp.float32),
         jnp.zeros((n, 7), jnp.float32)], axis=1)
    kkt = form_kkt(model, Xw, U, goals, xs, 0.015625, 1e-4, 1e-3,
                   angle_wrap=True)
    sch = form_schur(kkt, rho, preconditioned=True)
    ls = form_kkt_schur_pallas(model, Xw, U, goals, xs, rho, 0.015625,
                               1e-4, 1e-3, wrap=True, interpret=False)
    errs = {"wrap_gamma": _relerr(np.asarray(ls.gamma).T, sch.gamma)}

    # joint-space tracking: recorded states as the reference
    kkt_j = form_kkt(model, X, U, X, xs, 0.015625, 1e-4, 1e-3,
                     tracking="joint", q_cost=2.0)
    sch_j = form_schur(kkt_j, rho, preconditioned=True)
    ls_j = form_kkt_schur_pallas(model, X, U, X, xs, rho, 0.015625,
                                 1e-4, 1e-3, tracking="joint", q_cost=2.0,
                                 interpret=False)
    l2k = lambda a: np.transpose(np.asarray(a), (2, 0, 1))
    errs["joint_gamma"] = _relerr(np.asarray(ls_j.gamma).T, sch_j.gamma)
    errs["joint_theta"] = _relerr(l2k(ls_j.SD), sch_j.S.diag)

    ok = all(e < 1e-3 for e in errs.values())
    results[f"envelope_n{n}"] = {"ok": ok, **errs}
    return ok


def check_megakernel_pcg(model, X, U, lam, goals, xs, results, n):
    """The tracking-grade megakernel (warm-started stair-PCG fused with
    the whole iteration) must reproduce the staged fused-PCG path --
    same CG loop, same iteration counts, same accept decisions."""
    import dataclasses

    import jax.numpy as jnp

    from mpcgpu_tpu.config import SolverConfig
    from mpcgpu_tpu.sqp import sqp_solve

    base = dataclasses.replace(SolverConfig.for_knots(n, sqp_max_iter=2),
                               pallas_stages=True)
    # perturbed start so the CG loop actually iterates
    rng = np.random.default_rng(5)
    Xp = jnp.asarray(np.asarray(X) + 0.02 * rng.normal(size=X.shape),
                     jnp.float32)
    rho = jnp.asarray(1e-3, jnp.float32)
    tol = jnp.asarray(1e-6, jnp.float32)
    rm = sqp_solve(model, dataclasses.replace(base, megakernel=True),
                   Xp, U, lam, goals, xs, rho, tol, "pcg")
    rs = sqp_solve(model, dataclasses.replace(base, megakernel=False),
                   Xp, U, lam, goals, xs, rho, tol, "pcg")
    it_m = np.asarray(rm.stats.pcg_iters)
    it_s = np.asarray(rs.stats.pcg_iters)
    errs = {
        "x": _relerr(rm.X, rs.X),
        "u": _relerr(rm.U, rs.U),
        "lam": _relerr(rm.lam, rs.lam),
        "merit": abs(float(rm.stats.final_merit) - float(rs.stats.final_merit))
        / max(abs(float(rs.stats.final_merit)), 1e-9),
        "accept_match": bool(
            (np.asarray(rm.stats.accepted) == np.asarray(rs.stats.accepted))
            .all()),
        "iters_mega": it_m.tolist(),
        "iters_staged": it_s.tolist(),
        "iters_ran": bool((it_m[it_m >= 0] > 0).any()),
    }
    ok = (errs["x"] < 1e-2 and errs["u"] < 1e-2 and errs["merit"] < 1e-2
          and errs["accept_match"] and errs["iters_ran"])
    results[f"megakernel_pcg_n{n}"] = {"ok": ok, **errs}
    return ok


def check_megakernel_solve(model, X, U, lam, goals, xs, results, n):
    """The whole-solve megakernel (all SQP iterations in ONE dispatch,
    in-kernel fori_loop with rho-bail masking) must reproduce the
    while_loop over single-iteration megakernels exactly."""
    import dataclasses

    import jax.numpy as jnp

    from mpcgpu_tpu.config import SolverConfig
    from mpcgpu_tpu.sqp import sqp_solve

    base = dataclasses.replace(SolverConfig.for_knots(n, sqp_max_iter=4),
                               pallas_stages=True, megakernel=True)
    rng = np.random.default_rng(5)
    Xp = jnp.asarray(np.asarray(X) + 0.02 * rng.normal(size=X.shape),
                     jnp.float32)
    rho = jnp.asarray(1e-3, jnp.float32)
    tol = jnp.asarray(1e-6, jnp.float32)
    rw = sqp_solve(model, dataclasses.replace(base, megakernel_solve=True),
                   Xp, U, lam, goals, xs, rho, tol, "pcg")
    ri = sqp_solve(model, base, Xp, U, lam, goals, xs, rho, tol, "pcg")
    errs = {
        # loop-context compilation reassociates f32 differently than the
        # standalone iteration kernel: expect ~1e-5 agreement + identical
        # decisions, not bitwise equality
        "x": _relerr(rw.X, ri.X),
        "u": _relerr(rw.U, ri.U),
        "lam": _relerr(rw.lam, ri.lam),
        "merit": abs(float(rw.stats.final_merit)
                     - float(ri.stats.final_merit))
        / max(abs(float(ri.stats.final_merit)), 1e-9),
        "sqp_iters_match": int(rw.stats.sqp_iters) == int(ri.stats.sqp_iters),
        "accept_match": bool(
            (np.asarray(rw.stats.accepted) == np.asarray(ri.stats.accepted))
            .all()),
        "pcg_iters_match": bool(
            (np.asarray(rw.stats.pcg_iters) == np.asarray(ri.stats.pcg_iters))
            .all()),
    }
    ok = (errs["x"] < 1e-3 and errs["u"] < 1e-3 and errs["lam"] < 1e-2
          and errs["merit"] < 1e-3
          and errs["sqp_iters_match"] and errs["accept_match"]
          and errs["pcg_iters_match"])
    results[f"megakernel_solve_n{n}"] = {"ok": ok, **errs}
    return ok


def check_mat_bands(model, X, U, lam, goals, xs, results, n):
    """megakernel_mat_bands (canonical-layout band copies before the
    in-kernel CG loop) is a pure layout hint: the whole-solve megakernel
    must be BIT identical with it on and off."""
    import dataclasses

    import jax.numpy as jnp

    from mpcgpu_tpu.config import SolverConfig
    from mpcgpu_tpu.sqp import sqp_solve

    base = dataclasses.replace(SolverConfig.for_knots(n, sqp_max_iter=4),
                               pallas_stages=True, megakernel=True,
                               megakernel_solve=True)
    rho = jnp.asarray(1e-3, jnp.float32)
    tol = jnp.asarray(1e-6, jnp.float32)
    outs = [sqp_solve(model,
                      dataclasses.replace(base, megakernel_mat_bands=mb),
                      X, U, lam, goals, xs, rho, tol, "pcg")
            for mb in (False, True)]
    errs = {
        "x_maxdiff": float(np.max(np.abs(np.asarray(outs[0].X)
                                         - np.asarray(outs[1].X)))),
        "lam_maxdiff": float(np.max(np.abs(np.asarray(outs[0].lam)
                                           - np.asarray(outs[1].lam)))),
        "sqp_iters_match": int(outs[0].stats.sqp_iters)
        == int(outs[1].stats.sqp_iters),
    }
    ok = (errs["x_maxdiff"] == 0.0 and errs["lam_maxdiff"] == 0.0
          and errs["sqp_iters_match"])
    results[f"mat_bands_n{n}"] = {"ok": ok, **errs}
    return ok


def check_packed_arms(model, X, U, lam, goals, xs, results, n, b_arms=2):
    """The arm-packed whole-solve megakernel (B arms sharing the lane
    batch, per-arm dots / edge masks / rho rows) must reproduce B
    independent single-arm whole-solve megakernels.  Per-arm reductions
    sum over the padded full width, so expect float-tolerance agreement
    and identical decisions, not bitwise."""
    import jax.numpy as jnp

    from mpcgpu_tpu.config import SolverConfig
    from mpcgpu_tpu.ops.pallas.merit_kernel import line_search_merits_pallas
    from mpcgpu_tpu.ops.pallas.sqp_megakernel import (
        sqp_solve_mega_pcg, sqp_solve_mega_pcg_packed)

    cfg = SolverConfig.for_knots(n, sqp_max_iter=4)
    f32 = jnp.float32
    nx, nu = cfg.state_size, cfg.nu
    k_sqp, cap = 4, 16
    rng = np.random.default_rng(11)
    Xb = jnp.stack([
        jnp.asarray(np.asarray(X) + 0.02 * rng.normal(size=X.shape), f32)
        for _ in range(b_arms)])
    tol = jnp.asarray(1e-9, f32)

    def merit_of(Xa):
        return line_search_merits_pallas(
            model, Xa, U, jnp.zeros_like(Xa), jnp.zeros_like(U),
            cfg.num_alphas, goals, Xa[0], cfg.timestep, cfg.merit_mu,
            cfg.cost.qd_cost, cfg.cost.r_cost, cfg.integrator_type,
            cfg.gravity, cfg.angle_wrap, cfg.cost.tracking,
            cfg.cost.q_cost)[cfg.num_alphas]

    static = (cfg.timestep, cfg.cost.qd_cost, cfg.cost.r_cost,
              cfg.integrator_type, cfg.gravity, cfg.cost.hessian,
              cfg.merit_mu, cfg.num_alphas, cfg.rho_factor, cfg.rho_min,
              cfg.rho_max, cfg.rho_reset, cfg.angle_wrap,
              cfg.cost.tracking, cfg.cost.q_cost)
    singles = []
    for a in range(b_arms):
        Xa = Xb[a]
        Ul = jnp.concatenate([U, jnp.zeros((1, nu), f32)]).T
        singles.append(sqp_solve_mega_pcg(
            model, Xa.T, Ul, goals[:, :3].T, Xa[0], lam.T,
            jnp.asarray(1e-3, f32), jnp.asarray(1.0, f32), merit_of(Xa),
            cap, tol, k_sqp, *static))

    pack = lambda Ab: jnp.reshape(
        jnp.transpose(Ab, (2, 0, 1)), (-1, b_arms * n))
    Ub = jnp.broadcast_to(U, (b_arms,) + U.shape)
    Xl = pack(Xb)
    Ul = pack(jnp.concatenate([Ub, jnp.zeros((b_arms, 1, nu), f32)],
                              axis=1))
    laml = pack(jnp.broadcast_to(lam, (b_arms,) + lam.shape))
    goals_l = jnp.tile(goals[:, :3].T, (1, b_arms))
    xs_l = jnp.repeat(Xb[:, 0].T, n, axis=1)
    rho_l = jnp.full((1, b_arms * n), 1e-3, f32)
    (Xp, Up, lamp, rhop, meritp, itcp, bailp,
     pcg_tot) = sqp_solve_mega_pcg_packed(
        model, Xl, Ul, goals_l, xs_l, laml, rho_l, jnp.ones_like(rho_l),
        cap, tol, b_arms, k_sqp, *static)
    unpack = lambda Al: jnp.transpose(
        jnp.reshape(Al, (Al.shape[0], b_arms, n)), (1, 2, 0))
    Xp_b, Up_b, lamp_b = unpack(Xp), unpack(Up), unpack(lamp)
    errs = {}
    ok = True
    for a in range(b_arms):
        ex = _relerr(Xp_b[a], jnp.transpose(singles[a][0]))
        eu = _relerr(Up_b[a][:-1], jnp.transpose(singles[a][1])[:-1])
        el = _relerr(lamp_b[a], jnp.transpose(singles[a][2]))
        im = int(itcp[0, a * n]) == int(singles[a][6])
        er = abs(float(rhop[0, a * n]) - float(singles[a][3])) / max(
            abs(float(singles[a][3])), 1e-12)
        errs[f"arm{a}"] = {"x": ex, "u": eu, "lam": el, "rho": er,
                           "sqp_iters_match": im}
        ok &= ex < 1e-3 and eu < 1e-3 and el < 1e-2 and er < 1e-4 and im
    results[f"packed_arms_n{n}_b{b_arms}"] = {"ok": ok, **errs}
    return ok


def check_second_robot(results, n=16):
    """Second robot END-TO-END ON HARDWARE (round-4 VERDICT weak #6): the
    planar-2R URDF model (nq=2, models/planar2r.py) through the fused
    KKT+Schur lane kernel and the whole-solve PCG megakernel, with a
    synthesized dynamically consistent fixture (utils/synth.py).  This is
    the Mosaic-compile gate for non-IIWA row counts (rows = 2*nq = 4):
    the CPU twin is tests/test_second_robot.py."""
    import dataclasses

    import jax.numpy as jnp

    from mpcgpu_tpu.config import CostConfig, PCGConfig, SolverConfig
    from mpcgpu_tpu.models.planar2r import planar2r
    from mpcgpu_tpu.ops.kkt import form_kkt
    from mpcgpu_tpu.ops.schur import form_schur
    from mpcgpu_tpu.ops.pallas.kkt_schur_kernel import form_kkt_schur_pallas
    from mpcgpu_tpu.sqp import sqp_solve
    from mpcgpu_tpu.utils.synth import synthesize_tracking_fixture
    from mpcgpu_tpu.utils.trajfiles import horizon_slices

    dt, qd_c, r_c = 0.05, 1e-3, 1e-4
    model = planar2r()
    xu, ee = synthesize_tracking_fixture(
        model, q0=[0.4, 0.6], amplitude=0.35, n_steps=4 * n, dt=dt)
    X, U, goals, xs = horizon_slices(xu, ee, n, nx=4)
    X = jnp.asarray(X); U = jnp.asarray(U)
    goals = jnp.asarray(goals); xs = jnp.asarray(xs)
    lam = jnp.zeros((n, 4), jnp.float32)
    rho = jnp.asarray(1e-3, jnp.float32)

    # fused KKT+Schur formation at nq=2 vs the portable stages
    kkt = form_kkt(model, X, U, goals, xs, dt, qd_c, r_c)
    sch = form_schur(kkt, rho, preconditioned=True)
    ls = form_kkt_schur_pallas(model, X, U, goals, xs, rho, dt, qd_c, r_c,
                               interpret=False)
    l2k = lambda a: np.transpose(np.asarray(a), (2, 0, 1))
    errs = {
        "theta": _relerr(l2k(ls.SD), sch.S.diag),
        "phi": _relerr(l2k(ls.SL), sch.S.lower),
        "gamma": _relerr(np.asarray(ls.gamma).T, sch.gamma),
        "pinv_diag": _relerr(l2k(ls.PD), sch.Pinv.diag),
    }
    ok = (all(e < 1e-4 for k, e in errs.items() if k != "gamma")
          and errs["gamma"] < 1e-3)
    results[f"second_robot_kkt_schur_n{n}"] = {"ok": ok, "nq": 2, **errs}

    # full solve: portable vs staged-fused vs whole-solve megakernel
    cfg = SolverConfig(
        knot_points=n, state_size=4, control_size=2, timestep=dt,
        sqp_max_iter=3, pcg=PCGConfig(max_iter=30),
        cost=CostConfig(qd_cost=qd_c, r_cost=r_c))
    tol = jnp.asarray(1e-6, jnp.float32)
    r_port = sqp_solve(model, cfg, X, U, lam, goals, xs, rho, tol, "pcg")
    r_staged = sqp_solve(model, dataclasses.replace(cfg, pallas_stages=True),
                         X, U, lam, goals, xs, rho, tol, "pcg")
    r_mega = sqp_solve(
        model, dataclasses.replace(cfg, pallas_stages=True, megakernel=True,
                                   megakernel_solve=True),
        X, U, lam, goals, xs, rho, tol, "pcg")
    errs2 = {
        "staged_vs_portable_x": _relerr(r_staged.X, r_port.X),
        "mega_vs_staged_x": _relerr(r_mega.X, r_staged.X),
        "mega_vs_staged_lam": _relerr(r_mega.lam, r_staged.lam),
        "sqp_iters": [int(r_port.stats.sqp_iters),
                      int(r_staged.stats.sqp_iters),
                      int(r_mega.stats.sqp_iters)],
        "accept_match": bool(
            (np.asarray(r_mega.stats.accepted)
             == np.asarray(r_staged.stats.accepted)).all()),
    }
    ok2 = (errs2["staged_vs_portable_x"] < 1e-2
           and errs2["mega_vs_staged_x"] < 1e-3
           and errs2["mega_vs_staged_lam"] < 1e-2
           and errs2["sqp_iters"][1] == errs2["sqp_iters"][2]
           and errs2["accept_match"])
    results[f"second_robot_solve_n{n}"] = {"ok": ok2, **errs2}
    return ok and ok2


def check_rollout(model, X, U, goals, results):
    import jax.numpy as jnp

    from mpcgpu_tpu.config import SolverConfig
    from mpcgpu_tpu.ops.pallas.rollout_kernel import plant_rollout_pallas
    from mpcgpu_tpu.sim import _plant_rollout, _tracking_error

    cfg = SolverConfig()
    xs = X[0]
    got_x, got_e = plant_rollout_pallas(
        model, xs, U, goals[0], 0.0, 2000.0, cfg.timestep,
        cfg.sim_step_time, 11, cfg.gravity, interpret=False)
    want_x = _plant_rollout(model, cfg, xs, U, jnp.asarray(0.0, jnp.float32),
                            jnp.asarray(2000.0, jnp.float32), 11)
    want_e = _tracking_error(model, want_x, goals[0])
    errs = {"x": _maxerr(got_x, want_x), "err": _maxerr(got_e, want_e)}
    ok = all(e < 2e-4 for e in errs.values())
    results["rollout"] = {"ok": ok, **errs}
    return ok


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ns", type=int, nargs="*",
                    default=[32, 64, 128, 256, 512])
    ap.add_argument("--out", default=None)
    ap.add_argument("--checks", nargs="*", default=None,
                    help="run only these named checks (e.g. megakernel_solve)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    # f32 reference values: at default precision the portable path's
    # einsums run on the MXU in bf16, which would swamp the comparison.
    jax.config.update("jax_default_matmul_precision", "highest")

    dev = jax.devices()[0]
    print(f"device: {dev.platform} {getattr(dev, 'device_kind', '')}")

    import __graft_entry__ as g

    out = Path(args.out) if args.out else (
        REPO / "results" / f"kernel_regression_{dev.platform}.json")
    results: dict = {}
    if args.checks is not None and out.exists():
        # filtered run: merge into the existing archive instead of
        # clobbering the full suite's results
        results = json.loads(out.read_text())
        results.pop("all_ok", None)
    results.update({"device": str(dev), "ts": time.time()})
    all_ok = True
    rho = jnp.asarray(1e-3, jnp.float32)

    for n in args.ns:
        model, (X, U, lam, goals, xs) = g._problem(n)
        t0 = time.time()
        if n < 4:
            # fused-kernel envelope FLOOR (round 5): at the degenerate
            # N=2 lane width the cross-knot pltpu.roll misbehaves on
            # hardware (gamma rel 6e-3 vs portable; N=4 exact, interpret
            # mode exact at both) -- sqp.megakernel_engages and
            # use_fused_stages route N<4 through the portable path, so
            # the hardware gate here is the PORTABLE solver.
            import dataclasses as _dc

            import jax.numpy as jnp

            from mpcgpu_tpu.config import SolverConfig
            from mpcgpu_tpu.sqp import sqp_solve

            cfg_t = SolverConfig.for_knots(n, sqp_max_iter=2)
            res_t = sqp_solve(model, cfg_t, X, U, lam, goals, xs,
                              jnp.asarray(1e-3, jnp.float32),
                              jnp.asarray(1e-8, jnp.float32), "pcg")
            fin = bool(np.isfinite(np.asarray(res_t.X)).all()
                       and np.isfinite(float(res_t.stats.final_merit)))
            # fused-config fallback must produce the identical program
            res_f = sqp_solve(
                model, _dc.replace(cfg_t, pallas_stages=True,
                                   megakernel=True, megakernel_solve=True),
                X, U, lam, goals, xs, jnp.asarray(1e-3, jnp.float32),
                jnp.asarray(1e-8, jnp.float32), "pcg")
            same = _maxerr(res_f.X, res_t.X) == 0.0
            # drop stale fused-check entries for this n from a previous
            # (pre-gate) run of this script
            for k in [k for k in results
                      if re.search(rf"_n{n}(_|$)", k)
                      and "portable_floor" not in k]:
                del results[k]
            results[f"portable_floor_n{n}"] = {
                "ok": fin and same, "finite": fin,
                "fused_cfg_falls_back_bitexact": same,
                "note": "N<4 is outside the fused envelope by design "
                        "(width-2 pltpu.roll hardware artifact); "
                        "portable path serves it"}
            all_ok &= fin and same
            print(f"N={n}: {time.time() - t0:.1f}s portable-floor "
                  f"{'OK' if fin and same else 'FAIL'}")
            out.parent.mkdir(parents=True, exist_ok=True)
            out.write_text(json.dumps(results, indent=1))
            continue
        for name, fn in (
            ("kkt_schur", lambda: check_kkt_schur(model, X, U, goals, xs,
                                                  rho, results, n)),
        ):
            try:
                ls, sch, kkt, ok = fn()
                all_ok &= ok
            except Exception:
                results[f"{name}_n{n}"] = {"ok": False,
                                           "error": traceback.format_exc()[-800:]}
                all_ok = False
                ls = None
        if ls is not None:
            checks = [
                ("pcg_dz", lambda: check_pcg_dz(ls, sch, kkt, lam, results, n)),
                ("merit", lambda: check_merit(model, X, U, goals, xs,
                                              results, n)),
            ]
            # the fused BCR path serves all swept N: one kernel through
            # N=256, the split two-dispatch solve+refine form at N=512
            # (bcr_kernel.bcr_dz_pallas_lanes)
            checks.insert(1, ("bcr_dz",
                              lambda: check_bcr_dz(ls, sch, kkt,
                                                   results, n)))
            checks.insert(2, ("bcr_pcg_dz",
                              lambda: check_bcr_pcg_dz(ls, sch, kkt,
                                                       lam, results, n)))
            if n <= 128 and (n & (n - 1)) == 0:
                checks.append(
                    ("megakernel",
                     lambda: check_megakernel(model, X, U, lam, goals, xs,
                                              results, n)))
            if n <= 128 or n % 128 == 0:
                # pcg megakernels tile the per-knot stage in-kernel
                # beyond 128 lanes (kkt_schur_kernel._perknot_tiled)
                checks.append(
                    ("megakernel_pcg",
                     lambda: check_megakernel_pcg(model, X, U, lam, goals,
                                                  xs, results, n)))
                checks.append(
                    ("megakernel_solve",
                     lambda: check_megakernel_solve(model, X, U, lam, goals,
                                                    xs, results, n)))
            if n == 64:
                checks.append(
                    ("mat_bands",
                     lambda: check_mat_bands(model, X, U, lam, goals,
                                             xs, results, n)))
            if n <= 128:
                # arm-packed megakernel: B=2 arms fill one 128-lane tile
                # through N=64; B=2/N=128 exercises the multi-tile packed
                # path (256 lanes, per-knot stage tiled in-kernel)
                checks.append(
                    ("packed_arms",
                     lambda: check_packed_arms(model, X, U, lam, goals,
                                               xs, results, n)))
            if n == 32:
                # 8 packed arms at N=32 = 256 lanes: the multi-tile packed
                # width with the most arm segments per tile boundary
                checks.append(
                    ("packed_arms_b8",
                     lambda: check_packed_arms(model, X, U, lam, goals,
                                               xs, results, n, b_arms=8)))
            if n == 32:
                checks.append(
                    ("envelope",
                     lambda: check_envelope_knobs(model, X, U, goals, xs,
                                                  rho, results, n)))
            if args.checks is not None:
                checks = [(nm, f) for nm, f in checks if nm in args.checks]
            for name, fn in checks:
                try:
                    all_ok &= fn()
                except Exception:
                    results[f"{name}_n{n}"] = {
                        "ok": False, "error": traceback.format_exc()[-800:]}
                    all_ok = False
        print(f"N={n}: {time.time() - t0:.1f}s "
              f"{'OK' if all_ok else 'FAILURES (see json)'}")
        for key in (f"kkt_schur_n{n}", f"pcg_dz_n{n}",
                    f"pcg_dz_chunked_n{n}", f"bcr_dz_n{n}",
                    f"bcr_pcg_dz_n{n}",
                    f"merit_n{n}", f"megakernel_n{n}",
                    f"megakernel_pcg_n{n}", f"megakernel_solve_n{n}",
                    f"envelope_n{n}"):
            if key in results:
                print(f"  {key}: {results[key]}")
        # checkpoint partial results so mid-run failures are inspectable
        out.parent.mkdir(parents=True, exist_ok=True)
        out.write_text(json.dumps(results, indent=1))

    try:
        if args.checks is None or "rollout" in args.checks:
            model, (X, U, lam, goals, xs) = g._problem(32)
            all_ok &= check_rollout(model, X, U, goals, results)
    except Exception:
        results["rollout"] = {"ok": False,
                              "error": traceback.format_exc()[-800:]}
        all_ok = False

    try:
        if args.checks is None or "second_robot" in args.checks:
            all_ok &= check_second_robot(results)
    except Exception:
        results["second_robot_solve_n16"] = {
            "ok": False, "error": traceback.format_exc()[-800:]}
        all_ok = False

    # with merged (filtered-run) entries, all_ok covers the whole archive
    all_ok = all_ok and all(v.get("ok", True) for v in results.values()
                            if isinstance(v, dict))
    results["all_ok"] = all_ok
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(results, indent=1))
    print(f"{'ALL OK' if all_ok else 'FAILURES'} -> {out}")
    return 0 if all_ok else 1


if __name__ == "__main__":
    sys.exit(main())
