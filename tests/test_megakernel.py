"""Whole-iteration megakernel vs the staged fused path.

The megakernel (ops/pallas/sqp_megakernel.py) fuses KKT+Schur, the exact
BCR dual solve, primal recovery, the 8-alpha line search, and the
Levenberg rho update (reference include/pcg/sqp.cuh:203-423) into one
Pallas dispatch; it must reproduce the staged path's iterates exactly
(same arithmetic, same acceptance decisions).  Interpreter mode is slow,
so this runs one tiny configuration; hardware parity across N is gated
by scripts/tpu_kernel_regression.py (check_megakernel).
"""
import dataclasses

import jax.numpy as jnp
import numpy as np

from mpcgpu_tpu.config import SolverConfig
from mpcgpu_tpu.sqp import sqp_solve


def test_megakernel_matches_staged(iiwa, traj_0_0):
    xu, ee = traj_0_0
    n = 4
    base = dataclasses.replace(SolverConfig.for_knots(n, sqp_max_iter=2),
                               pallas_stages=True)
    X = jnp.asarray(xu[:n, :14])
    U = jnp.asarray(xu[: n - 1, 14:])
    goals = jnp.asarray(ee[:n])
    xs = X[0]
    lam = jnp.zeros((n, 14), jnp.float32)
    rho = jnp.asarray(1e-3, jnp.float32)

    rm = sqp_solve(iiwa, dataclasses.replace(base, megakernel=True),
                   X, U, lam, goals, xs, rho, 1e-6, "bcr")
    rs = sqp_solve(iiwa, dataclasses.replace(base, megakernel=False),
                   X, U, lam, goals, xs, rho, 1e-6, "bcr")

    np.testing.assert_allclose(np.asarray(rm.X), np.asarray(rs.X),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(rm.U), np.asarray(rs.U),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(rm.lam), np.asarray(rs.lam),
                               rtol=1e-4, atol=1e-5)
    assert (np.asarray(rm.stats.accepted) == np.asarray(rs.stats.accepted)).all()
    np.testing.assert_allclose(float(rm.stats.final_merit),
                               float(rs.stats.final_merit), rtol=1e-5)


def test_megakernel_pcg_matches_staged(iiwa, traj_0_0):
    """The tracking-grade megakernel (warm-started stair-PCG dual solve
    fused with the whole iteration) must reproduce the staged fused-PCG
    path: same warm start, same exit tolerance, same CG loop."""
    xu, ee = traj_0_0
    n = 4
    base = dataclasses.replace(SolverConfig.for_knots(n, sqp_max_iter=2),
                               pallas_stages=True)
    rng = np.random.default_rng(5)
    # perturbed start so the CG loop actually iterates (the unperturbed
    # fixture start exits at 0 iterations at this tolerance)
    X = jnp.asarray(xu[:n, :14] + 0.02 * rng.normal(size=(n, 14)),
                    jnp.float32)
    U = jnp.asarray(xu[: n - 1, 14:])
    goals = jnp.asarray(ee[:n])
    xs = X[0]
    lam = jnp.zeros((n, 14), jnp.float32)
    rho = jnp.asarray(1e-3, jnp.float32)

    rm = sqp_solve(iiwa, dataclasses.replace(base, megakernel=True),
                   X, U, lam, goals, xs, rho, 1e-6, "pcg")
    rs = sqp_solve(iiwa, dataclasses.replace(base, megakernel=False),
                   X, U, lam, goals, xs, rho, 1e-6, "pcg")

    np.testing.assert_allclose(np.asarray(rm.X), np.asarray(rs.X),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(rm.U), np.asarray(rs.U),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(rm.lam), np.asarray(rs.lam),
                               rtol=1e-4, atol=1e-5)
    assert (np.asarray(rm.stats.accepted) == np.asarray(rs.stats.accepted)).all()
    # PCG iteration counts must be recorded (not the BCR path's zeros)
    it_m = np.asarray(rm.stats.pcg_iters)
    it_s = np.asarray(rs.stats.pcg_iters)
    np.testing.assert_array_equal(it_m, it_s)
    assert (it_m[it_m >= 0] > 0).any()
    np.testing.assert_allclose(float(rm.stats.final_merit),
                               float(rs.stats.final_merit), rtol=1e-5)


def test_megakernel_whole_solve_matches_iter_loop(iiwa, traj_0_0):
    """The whole-solve megakernel (all SQP iterations in ONE dispatch,
    rho-bail masking) must reproduce the while_loop over single-iteration
    megakernels exactly: same iterates, same stats arrays."""
    xu, ee = traj_0_0
    n = 4
    base = dataclasses.replace(SolverConfig.for_knots(n, sqp_max_iter=3),
                               pallas_stages=True, megakernel=True)
    rng = np.random.default_rng(5)
    X = jnp.asarray(xu[:n, :14] + 0.02 * rng.normal(size=(n, 14)),
                    jnp.float32)
    U = jnp.asarray(xu[: n - 1, 14:])
    goals = jnp.asarray(ee[:n])
    xs = X[0]
    lam = jnp.zeros((n, 14), jnp.float32)
    rho = jnp.asarray(1e-3, jnp.float32)

    rw = sqp_solve(iiwa, dataclasses.replace(base, megakernel_solve=True),
                   X, U, lam, goals, xs, rho, 1e-6, "pcg")
    ri = sqp_solve(iiwa, base, X, U, lam, goals, xs, rho, 1e-6, "pcg")

    # same math, but the loop-context compilation reassociates f32
    # differently than the standalone single-iteration kernel -- expect
    # numerical equivalence (~1e-5), identical decisions, not bitwise.
    np.testing.assert_allclose(np.asarray(rw.X), np.asarray(ri.X),
                               rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(rw.U), np.asarray(ri.U),
                               rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(rw.lam), np.asarray(ri.lam),
                               rtol=1e-3, atol=1e-4)
    assert int(rw.stats.sqp_iters) == int(ri.stats.sqp_iters)
    assert bool(rw.stats.rho_bailed) == bool(ri.stats.rho_bailed)
    np.testing.assert_array_equal(np.asarray(rw.stats.pcg_iters),
                                  np.asarray(ri.stats.pcg_iters))
    np.testing.assert_array_equal(np.asarray(rw.stats.accepted),
                                  np.asarray(ri.stats.accepted))
    np.testing.assert_allclose(float(rw.stats.final_merit),
                               float(ri.stats.final_merit), rtol=1e-4)


def test_mat_bands_bit_identical(iiwa, traj_0_0):
    """megakernel_mat_bands (canonical-layout band copies before the
    in-kernel CG loop) is a pure layout hint: outputs must be BIT
    identical to the default path (results/round3/mega_cg_probe_n64.json
    shows the same on hardware)."""
    xu, ee = traj_0_0
    n = 4
    base = dataclasses.replace(
        SolverConfig.for_knots(n, sqp_max_iter=2),
        pallas_stages=True, megakernel=True, megakernel_solve=True)
    base = dataclasses.replace(
        base, pcg=dataclasses.replace(base.pcg, max_iter=6))
    X = jnp.asarray(xu[:n, :14])
    U = jnp.asarray(xu[: n - 1, 14:])
    goals = jnp.asarray(ee[:n])
    lam = jnp.zeros((n, 14), jnp.float32)
    rho = jnp.asarray(1e-3, jnp.float32)

    outs = [sqp_solve(iiwa,
                      dataclasses.replace(base, megakernel_mat_bands=mb),
                      X, U, lam, goals, X[0], rho, 1e-9, "pcg")
            for mb in (False, True)]
    np.testing.assert_array_equal(np.asarray(outs[0].X),
                                  np.asarray(outs[1].X))
    np.testing.assert_array_equal(np.asarray(outs[0].U),
                                  np.asarray(outs[1].U))
    np.testing.assert_array_equal(np.asarray(outs[0].lam),
                                  np.asarray(outs[1].lam))
    assert int(outs[0].stats.sqp_iters) == int(outs[1].stats.sqp_iters)


def test_packed_arms_match_single_arm_solves(iiwa, traj_0_0):
    """The arm-packed whole-solve megakernel (B arms sharing the lane
    batch, per-arm dots / masks / rho rows) must reproduce B independent
    single-arm whole-solve megakernels to float tolerance (per-arm dot
    reductions sum over the padded full width, so reduction order -- not
    math -- differs)."""
    from mpcgpu_tpu.ops.pallas.merit_kernel import line_search_merits_pallas
    from mpcgpu_tpu.ops.pallas.sqp_megakernel import (
        sqp_solve_mega_pcg, sqp_solve_mega_pcg_packed)

    xu, ee = traj_0_0
    n, b_arms, k_sqp, cap = 4, 2, 2, 8   # interpreter mode is slow: keep tiny
    cfg = SolverConfig.for_knots(n, sqp_max_iter=k_sqp)
    f32 = jnp.float32
    nx, nu, nq = cfg.state_size, cfg.nu, cfg.nq
    rng = np.random.default_rng(7)
    X = jnp.asarray(xu[:n, :14], f32)
    U = jnp.asarray(xu[: n - 1, 14:], f32)
    goals = jnp.asarray(ee[:n])
    lam = jnp.zeros((n, nx), f32)
    Xb = jnp.stack([
        X + 0.02 * jnp.asarray(rng.normal(size=(n, nx)), f32)
        for _ in range(b_arms)])
    tol = jnp.asarray(1e-9, f32)

    def merit_of(Xa):
        return line_search_merits_pallas(
            iiwa, Xa, U, jnp.zeros_like(Xa), jnp.zeros_like(U),
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
        outs = sqp_solve_mega_pcg(
            iiwa, Xa.T, Ul, goals[:, :3].T, Xa[0], lam.T,
            jnp.asarray(1e-3, f32), jnp.asarray(1.0, f32), merit_of(Xa),
            cap, tol, k_sqp, *static)
        singles.append(outs)

    pack = lambda Ab: jnp.reshape(
        jnp.transpose(Ab, (2, 0, 1)), (-1, b_arms * n))
    Ub = jnp.broadcast_to(U, (b_arms,) + U.shape)
    Xl = pack(Xb)
    Ul = pack(jnp.concatenate([Ub, jnp.zeros((b_arms, 1, nu), f32)], axis=1))
    laml = pack(jnp.broadcast_to(lam, (b_arms,) + lam.shape))
    goals_l = jnp.tile(goals[:, :3].T, (1, b_arms))
    xs_l = jnp.repeat(Xb[:, 0].T, n, axis=1)
    rho_l = jnp.full((1, b_arms * n), 1e-3, f32)
    (Xp, Up, lamp, rhop, meritp, itcp, bailp,
     pcg_tot) = sqp_solve_mega_pcg_packed(
        iiwa, Xl, Ul, goals_l, xs_l, laml, rho_l, jnp.ones_like(rho_l),
        cap, tol, b_arms, k_sqp, *static)

    unpack = lambda Al: jnp.transpose(
        jnp.reshape(Al, (Al.shape[0], b_arms, n)), (1, 2, 0))
    Xp_b, Up_b, lamp_b = unpack(Xp), unpack(Up), unpack(lamp)
    for a in range(b_arms):
        np.testing.assert_allclose(np.asarray(Xp_b[a]),
                                   np.asarray(singles[a][0]).T,
                                   rtol=1e-3, atol=1e-5)
        np.testing.assert_allclose(np.asarray(Up_b[a][:-1]),
                                   np.asarray(singles[a][1]).T[:-1],
                                   rtol=1e-3, atol=1e-5)
        np.testing.assert_allclose(np.asarray(lamp_b[a]),
                                   np.asarray(singles[a][2]).T,
                                   rtol=1e-3, atol=1e-4)
        assert int(itcp[0, a * n]) == int(singles[a][6])
        np.testing.assert_allclose(float(rhop[0, a * n]),
                                   float(singles[a][3]), rtol=1e-5)
        np.testing.assert_allclose(float(meritp[0, a * n]),
                                   float(singles[a][5]), rtol=1e-4)
