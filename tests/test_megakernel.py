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
