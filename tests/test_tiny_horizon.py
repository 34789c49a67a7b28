"""Degenerate-horizon envelope (round-4 VERDICT missing #2): the reference
sweeps N from 2 (reference experiments/01_precond_then_long_running.py:8);
N=2 and N=4 are where padding/tiling assumptions break silently.  Runs the
full solver stack -- portable, fused lane stages, whole-solve megakernel,
BCR -- at N in {2, 4} (Pallas in interpreter mode on CPU; the hardware
twin is scripts/tpu_kernel_regression.py --ns 2 4).
"""
import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from mpcgpu_tpu.config import PCGConfig, SolverConfig
from mpcgpu_tpu.sim import simulate_mpc_scan
from mpcgpu_tpu.sqp import sqp_solve
from mpcgpu_tpu.utils.trajfiles import load_fixture_pair, horizon_slices


@pytest.fixture(scope="module")
def traj(fixtures_dir):
    return load_fixture_pair(fixtures_dir, 0, 0)


def _args(xu, ee, n):
    X, U, goals, xs = horizon_slices(xu, ee, n)
    return (jnp.asarray(X), jnp.asarray(U),
            jnp.zeros((n, 14), jnp.float32), jnp.asarray(goals),
            jnp.asarray(xs))


@pytest.mark.parametrize("n", [2, 4])
def test_tiny_horizon_fused_matches_portable(iiwa, traj, n):
    xu, ee = traj
    X, U, lam, goals, xs = _args(xu, ee, n)
    cfg = dataclasses.replace(
        SolverConfig.for_knots(n, sqp_max_iter=2),
        pcg=PCGConfig(max_iter=20))
    rho = jnp.asarray(1e-3, jnp.float32)
    ref = sqp_solve(iiwa, cfg, X, U, lam, goals, xs, rho, 1e-8, "pcg")
    out = sqp_solve(iiwa, dataclasses.replace(cfg, pallas_stages=True),
                    X, U, lam, goals, xs, rho, 1e-8, "pcg")
    np.testing.assert_allclose(np.asarray(out.X), np.asarray(ref.X),
                               rtol=1e-3, atol=1e-4)
    assert int(out.stats.sqp_iters) == int(ref.stats.sqp_iters)


@pytest.mark.parametrize("n", [2, 4])
def test_tiny_horizon_megasolve_matches_staged(iiwa, traj, n):
    xu, ee = traj
    X, U, lam, goals, xs = _args(xu, ee, n)
    base = dataclasses.replace(
        SolverConfig.for_knots(n, sqp_max_iter=2),
        pcg=PCGConfig(max_iter=20), pallas_stages=True)
    rho = jnp.asarray(1e-3, jnp.float32)
    rs = sqp_solve(iiwa, base, X, U, lam, goals, xs, rho, 1e-8, "pcg")
    rw = sqp_solve(iiwa, dataclasses.replace(base, megakernel=True,
                                             megakernel_solve=True),
                   X, U, lam, goals, xs, rho, 1e-8, "pcg")
    np.testing.assert_allclose(np.asarray(rw.X), np.asarray(rs.X),
                               rtol=1e-4, atol=1e-5)
    assert int(rw.stats.sqp_iters) == int(rs.stats.sqp_iters)
    np.testing.assert_array_equal(np.asarray(rw.stats.accepted),
                                  np.asarray(rs.stats.accepted))


@pytest.mark.parametrize("n", [2, 4])
def test_tiny_horizon_bcr_exact(iiwa, traj, n):
    """BCR at recursion depth log2(2)=1 / log2(4)=2."""
    xu, ee = traj
    X, U, lam, goals, xs = _args(xu, ee, n)
    cfg = dataclasses.replace(SolverConfig.for_knots(n, sqp_max_iter=2),
                              pallas_stages=True)
    rho = jnp.asarray(1e-3, jnp.float32)
    rb = sqp_solve(iiwa, cfg, X, U, lam, goals, xs, rho, 1e-8, "bcr")
    rd = sqp_solve(iiwa, dataclasses.replace(cfg, pallas_stages=False),
                   X, U, lam, goals, xs, rho, 1e-8, "dense")
    # two EXACT f32 solvers on cond~1e7 Schur systems: agreement to
    # ~5e-4 absolute on the state (judge exact solvers by residual,
    # CLAUDE.md; at N=2 a 3.7e-4 velocity diff is solve-path noise)
    np.testing.assert_allclose(np.asarray(rb.X), np.asarray(rd.X),
                               rtol=2e-3, atol=5e-4)


def test_tiny_horizon_closed_loop_n4(iiwa, traj):
    """The full device-resident loop at N=4: shift/refill/re-injection at
    a horizon shorter than the substep count."""
    xu, ee = traj
    n = 4
    cfg = dataclasses.replace(
        SolverConfig.for_knots(n, sqp_max_iter=2),
        pcg=PCGConfig(max_iter=10), pallas_stages=True,
        megakernel=True, megakernel_solve=True)
    X, U, goals, xs = horizon_slices(xu, ee, n)
    out = simulate_mpc_scan(
        iiwa, cfg, jnp.asarray(xu), jnp.asarray(ee), jnp.asarray(X),
        jnp.asarray(U), jnp.zeros((n, 14), jnp.float32),
        jnp.asarray(1e-3, jnp.float32), 1e-6, 4, "pcg")
    errs = np.asarray(out["tracking_errors"])
    assert np.isfinite(errs).all()
    assert np.isfinite(np.asarray(out["tracking_path"])).all()
