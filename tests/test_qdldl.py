"""Host LDL' oracle backend tests (the reference's QDLDL path)."""
import jax.numpy as jnp
import numpy as np
import pytest

import mpcgpu_tpu.linsys.qdldl_host as qh
from mpcgpu_tpu.ops import btridiag
from mpcgpu_tpu.ops.schur import form_schur
from tests.test_schur_pcg import N, NX, RHO, random_kkt


def _random_btd_spd(n, s, seed=0):
    rng = np.random.default_rng(seed)
    off = 0.2 * rng.normal(size=(n - 1, s, s)).astype(np.float32)
    d = rng.normal(size=(n, s, s)).astype(np.float32)
    diag = np.einsum("kij,klj->kil", d, d) + 5 * np.eye(s, dtype=np.float32)
    lower = np.concatenate([np.zeros((1, s, s), np.float32), off])
    upper = np.concatenate([np.swapaxes(off, 1, 2), np.zeros((1, s, s), np.float32)])
    return lower, diag, upper


def test_native_library_builds():
    assert qh._load_native() is not None, "g++ build of native/ldl.cpp failed"


def test_ldl_solves_random_btd_system():
    n, s = 6, 5
    lower, diag, upper = _random_btd_spd(n, s)
    rng = np.random.default_rng(1)
    b = rng.normal(size=(n, s)).astype(np.float32)
    x = qh.LDLSolver(n, s).solve(lower, diag, upper, b)
    dense = np.asarray(
        btridiag.to_dense(btridiag.BlockTri(*map(jnp.asarray, (lower, diag, upper))))
    )
    x_ref = np.linalg.solve(dense.astype(np.float64), b.reshape(-1))
    np.testing.assert_allclose(x.reshape(-1), x_ref, rtol=2e-4, atol=2e-4)


def test_qdldl_backend_matches_pcg_on_schur_system():
    kkt = random_kkt(seed=7)
    sd = form_schur(kkt, RHO)
    solver = qh.LDLSolver(N, NX)
    x = solver.solve(sd.S.lower, sd.S.diag, sd.S.upper, np.asarray(sd.gamma))
    dense = np.asarray(btridiag.to_dense(sd.S), np.float64)
    x_ref = np.linalg.solve(dense, np.asarray(sd.gamma, np.float64).reshape(-1))
    np.testing.assert_allclose(x.reshape(-1), x_ref, rtol=3e-3, atol=3e-3)


def test_qdldl_as_sqp_backend(iiwa, traj_0_0):
    """End-to-end: sqpSolveQdldl equivalent through pure_callback."""
    from mpcgpu_tpu.config import SolverConfig
    from mpcgpu_tpu.sqp import sqp_solve

    xu, ee = traj_0_0
    n = 12
    cfg = SolverConfig.for_knots(n, sqp_max_iter=3)
    X = jnp.asarray(xu[:n, :14]); U = jnp.asarray(xu[:n - 1, 14:])
    goals = jnp.asarray(ee[:n]); xs = X[0]
    lam = jnp.zeros((n, 14), jnp.float32)

    r_q = sqp_solve(iiwa, cfg, X, U, lam, goals, xs, 1e-3, 1e-11, linsys="qdldl")
    r_d = sqp_solve(iiwa, cfg, X, U, lam, goals, xs, 1e-3, 1e-11, linsys="dense")
    np.testing.assert_allclose(
        float(r_q.stats.final_merit), float(r_d.stats.final_merit), rtol=5e-3
    )
    np.testing.assert_allclose(
        np.asarray(r_q.X), np.asarray(r_d.X), rtol=1e-2, atol=1e-3
    )


def test_solve_csc_matches_solve():
    """solve_csc (pre-assembled pattern; what the linsys-time comparison
    brackets, reference TIME_LINSYS semantics) must equal the assembling
    solve()."""
    n, s = 6, 5
    lower, diag, upper = _random_btd_spd(n, s, seed=3)
    b = np.random.default_rng(4).normal(size=(n, s)).astype(np.float32)
    solver = qh.LDLSolver(n, s)
    want = solver.solve(lower, diag, upper, b)
    Ap, Ai, Ax = qh._btd_upper_csc(lower, diag, upper)
    got = qh.LDLSolver(n, s).solve_csc(Ap, Ai, Ax, b)
    np.testing.assert_array_equal(got, want)
