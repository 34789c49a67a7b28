"""Round-2 parity knobs: angle_wrap, joint-space tracking, f64, and the
lazy linsys-backend registry (VERDICT round 1, items 2 and 8)."""
import subprocess
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpcgpu_tpu.config import CostConfig, PCGConfig, SolverConfig
from mpcgpu_tpu.ops import integrator as integ
from mpcgpu_tpu.sqp import get_linsys_backend, sqp_solve
from mpcgpu_tpu.utils.trajfiles import horizon_slices, load_fixture_pair

REPO = Path(__file__).resolve().parent.parent


def _problem(iiwa, fixtures_dir, n):
    xu, ee = load_fixture_pair(fixtures_dir, 0, 0)
    X, U, goals, xs = horizon_slices(xu, ee, n)
    return (jnp.asarray(X), jnp.asarray(U), jnp.zeros((n, 14), jnp.float32),
            jnp.asarray(goals), jnp.asarray(xs))


def test_angle_wrap_semantics():
    # exact reference angleWrap (integrator.cuh:13-19): reflection at +-3.14159
    q = jnp.asarray([0.5, 3.2, -3.2, 3.14, -3.14], jnp.float32)
    w = integ.angle_wrap(q)
    pi = 3.14159
    np.testing.assert_allclose(
        np.asarray(w),
        [0.5, -(3.2 - pi), -(-3.2 + pi), 3.14, -3.14],
        rtol=1e-5,
    )


def test_angle_wrap_only_affects_defect(iiwa):
    x = jnp.asarray(np.linspace(3.0, 3.3, 14), jnp.float32)  # q near pi
    u = jnp.ones(7, jnp.float32)
    xn = jnp.zeros(14, jnp.float32)
    A0, B0, e0 = integ.integrator_and_gradient(iiwa, x, u, xn, 0.015625,
                                               wrap=False)
    A1, B1, e1 = integ.integrator_and_gradient(iiwa, x, u, xn, 0.015625,
                                               wrap=True)
    np.testing.assert_array_equal(np.asarray(A0), np.asarray(A1))
    np.testing.assert_array_equal(np.asarray(B0), np.asarray(B1))
    assert not np.allclose(np.asarray(e0), np.asarray(e1))


def test_sqp_solve_with_angle_wrap(iiwa, fixtures_dir):
    n = 8
    cfg = SolverConfig(knot_points=n, sqp_max_iter=2, angle_wrap=True,
                       pcg=PCGConfig(max_iter=20))
    X, U, lam, goals, xs = _problem(iiwa, fixtures_dir, n)
    res = sqp_solve(iiwa, cfg, X, U, lam, goals, xs,
                    jnp.asarray(1e-3, jnp.float32),
                    jnp.asarray(1e-4, jnp.float32))
    assert np.isfinite(float(res.stats.final_merit))


def test_joint_space_tracking_solves(iiwa, fixtures_dir):
    """C15b wired end-to-end: joint-space cost tracks the recorded states."""
    n = 8
    cfg = SolverConfig(
        knot_points=n, sqp_max_iter=4, pcg=PCGConfig(max_iter=40),
        cost=CostConfig(tracking="joint", q_cost=1.0, r_cost=1e-4),
    )
    xu, ee = load_fixture_pair(Path(__file__).parent / "fixtures", 0, 0)
    X_ref = jnp.asarray(xu[:n, :14])
    # start displaced from the reference trajectory
    X = X_ref + 0.05
    U = jnp.asarray(xu[: n - 1, 14:])
    lam = jnp.zeros((n, 14), jnp.float32)
    xs = X[0]
    res = sqp_solve(iiwa, cfg, X, U, lam, X_ref, xs,
                    jnp.asarray(1e-3, jnp.float32),
                    jnp.asarray(1e-6, jnp.float32))
    assert np.isfinite(float(res.stats.final_merit))
    # the solve should pull the positions toward the reference states
    d0 = float(jnp.abs(X[1:, :7] - X_ref[1:, :7]).mean())
    d1 = float(jnp.abs(res.X[1:, :7] - X_ref[1:, :7]).mean())
    assert d1 < d0


def test_joint_tracking_timeboxed(iiwa, fixtures_dir):
    """Regression (round-2 VERDICT weak #1): sqp_iteration dropped
    cfg.cost.tracking/q_cost when forming the KKT system, so the
    time-boxed path linearized the eepos cost while line-searching the
    joint-space merit -- inconsistent gradients, systematically rejected
    steps.  With the fix, the time-boxed solve must make progress toward
    the reference states, like the fused solve does."""
    from mpcgpu_tpu.sqp import sqp_solve_timeboxed

    n = 8
    cfg = SolverConfig(
        knot_points=n, sqp_max_iter=4, pcg=PCGConfig(max_iter=40),
        cost=CostConfig(tracking="joint", q_cost=1.0, r_cost=1e-4),
    )
    xu, ee = load_fixture_pair(Path(__file__).parent / "fixtures", 0, 0)
    X_ref = jnp.asarray(xu[:n, :14])
    X = X_ref + 0.05
    U = jnp.asarray(xu[: n - 1, 14:])
    lam = jnp.zeros((n, 14), jnp.float32)
    xs = X[0]
    res = sqp_solve_timeboxed(
        iiwa, cfg, X, U, lam, X_ref, xs,
        jnp.asarray(1e-3, jnp.float32), jnp.asarray(1e-6, jnp.float32),
        max_time_us=60e6,
    )
    assert int(res.stats.sqp_iters) >= 1
    assert bool(np.asarray(res.stats.accepted).any()), (
        "all steps rejected: KKT linearization inconsistent with the "
        "joint-space merit"
    )
    d0 = float(jnp.abs(X[1:, :7] - X_ref[1:, :7]).mean())
    d1 = float(jnp.abs(res.X[1:, :7] - X_ref[1:, :7]).mean())
    assert d1 < d0, (d1, d0)


def test_float64_solve(fixtures_dir):
    """USE_DOUBLES parity (settings.cuh:49-57): f64 end-to-end solve."""
    from mpcgpu_tpu.models.robot import iiwa14

    with jax.enable_x64(True):
        model = iiwa14(dtype=jnp.float64)
        n = 8
        cfg = SolverConfig(knot_points=n, sqp_max_iter=2, dtype="float64",
                           pcg=PCGConfig(max_iter=20))
        xu, ee = load_fixture_pair(fixtures_dir, 0, 0)
        X, U, goals, xs = horizon_slices(xu, ee, n)
        res = sqp_solve(
            model, cfg, jnp.asarray(X, jnp.float64),
            jnp.asarray(U, jnp.float64), jnp.zeros((n, 14), jnp.float64),
            jnp.asarray(goals, jnp.float64), jnp.asarray(xs, jnp.float64),
            jnp.asarray(1e-3, jnp.float64), jnp.asarray(1e-6, jnp.float64),
        )
        assert res.X.dtype == jnp.float64
        assert np.isfinite(float(res.stats.final_merit))


def test_lazy_backend_registry():
    fn = get_linsys_backend("pcg_pallas")
    assert callable(fn)
    fn = get_linsys_backend("qdldl")
    assert callable(fn)
    with pytest.raises(KeyError, match="unknown linsys backend"):
        get_linsys_backend("nope")


def test_backends_resolve_from_fresh_interpreter():
    """Regression for round 1's KeyError: 'pcg_pallas' (ADVICE high) --
    every advertised backend name must resolve without any prior imports."""
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "from mpcgpu_tpu.sqp import get_linsys_backend\n"
        "for n in ('pcg', 'dense', 'pcg_pallas', 'qdldl'):\n"
        "    assert callable(get_linsys_backend(n)), n\n"
        "print('ok')\n"
    )
    out = subprocess.run([sys.executable, "-c", code], cwd=REPO,
                         capture_output=True, text=True, timeout=300)
    assert out.returncode == 0, out.stderr
    assert "ok" in out.stdout
