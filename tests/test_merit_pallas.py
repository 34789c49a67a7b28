"""Fused Pallas merit kernel vs the vmapped XLA implementation."""
import jax.numpy as jnp
import numpy as np

from mpcgpu_tpu.ops import merit as merit_ops
from mpcgpu_tpu.ops.pallas.merit_kernel import line_search_merits_pallas


def test_pallas_merits_match_xla(iiwa, traj_0_0):
    xu, ee = traj_0_0
    n = 16
    rng = np.random.default_rng(0)
    X = jnp.asarray(xu[:n, :14])
    U = jnp.asarray(xu[:n - 1, 14:])
    dX = jnp.asarray(rng.normal(size=(n, 14)) * 0.05, jnp.float32)
    dU = jnp.asarray(rng.normal(size=(n - 1, 7)) * 0.05, jnp.float32)
    goals = jnp.asarray(ee[:n])
    xs = X[0] + 0.01

    alphas = (1.0 / 2 ** jnp.arange(8)).astype(jnp.float32)
    ref = merit_ops.line_search_merits(
        iiwa, X, U, dX, dU, alphas, goals, xs, 0.015625, 10.0, 1e-4, 1e-3
    )
    ref0 = merit_ops.merit(iiwa, X, U, goals, xs, 0.015625, 10.0, 1e-4, 1e-3)

    got = line_search_merits_pallas(
        iiwa, X, U, dX, dU, 8, goals, xs, 0.015625, 10.0, 1e-4, 1e-3,
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got[:8]), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(float(got[8]), float(ref0), rtol=2e-4)


def test_sqp_with_pallas_stages_matches(iiwa, traj_0_0):
    """sqp_solve(pallas_stages=True) must take the same steps as the
    portable implementation."""
    import dataclasses

    from mpcgpu_tpu.config import SolverConfig
    from mpcgpu_tpu.sqp import sqp_solve

    xu, ee = traj_0_0
    n = 16
    # single iteration: beyond one step, f32 arithmetic-order differences
    # between the fused kernels and the portable path can flip line-search
    # picks and the iterate paths legitimately diverge.
    base = SolverConfig.for_knots(n, sqp_max_iter=1)
    pal = dataclasses.replace(base, pallas_stages=True)
    X = jnp.asarray(xu[:n, :14]); U = jnp.asarray(xu[:n - 1, 14:])
    goals = jnp.asarray(ee[:n]); xs = X[0]
    lam = jnp.zeros((n, 14), jnp.float32)
    rng = np.random.default_rng(1)
    Xp = (X + 0.02 * jnp.asarray(rng.normal(size=X.shape), jnp.float32)).at[0].set(xs)

    r0 = sqp_solve(iiwa, base, Xp, U, lam, goals, xs, 1e-3, 1e-8)
    r1 = sqp_solve(iiwa, pal, Xp, U, lam, goals, xs, 1e-3, 1e-8)
    np.testing.assert_array_equal(np.asarray(r1.stats.accepted),
                                  np.asarray(r0.stats.accepted))
    np.testing.assert_allclose(np.asarray(r1.X), np.asarray(r0.X),
                               rtol=5e-3, atol=5e-3)
    # merit values track their own (slightly different in f32) iterates;
    # the rank-1-Hessian step has 1/rho-scale amplification, so only a
    # coarse agreement is meaningful here.
    np.testing.assert_allclose(float(r1.stats.final_merit),
                               float(r0.stats.final_merit), rtol=5e-2)

    # multi-iteration quality check: f32 path divergence is legitimate, so
    # only require that both descend well below the starting merit
    from mpcgpu_tpu.ops import merit as merit_ops

    m_init = float(merit_ops.merit(iiwa, Xp, U, goals, xs, base.timestep,
                                   base.merit_mu, base.cost.qd_cost,
                                   base.cost.r_cost))
    base3 = SolverConfig.for_knots(n, sqp_max_iter=3)
    pal3 = dataclasses.replace(base3, pallas_stages=True)
    m0 = float(sqp_solve(iiwa, base3, Xp, U, lam, goals, xs, 1e-3, 1e-8
                         ).stats.final_merit)
    m1 = float(sqp_solve(iiwa, pal3, Xp, U, lam, goals, xs, 1e-3, 1e-8
                         ).stats.final_merit)
    assert m0 < 0.2 * m_init and m1 < 0.2 * m_init, (m_init, m0, m1)
