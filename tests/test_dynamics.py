"""Dynamics unit tests: the per-kernel oracle strategy the reference lacks
(SURVEY.md section 4): FK vs recorded fixtures, RNEA/CRBA cross-checks,
analytic gradients vs finite differences / autodiff.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpcgpu_tpu.models import dynamics as dyn

jax.config.update("jax_enable_x64", False)


def _rand_q(rng, n=7, scale=2.0):
    return jnp.asarray(rng.uniform(-scale, scale, n), dtype=jnp.float32)


def test_fk_matches_recorded_eepos_fixture(iiwa, traj_0_0):
    """End-effector FK must reproduce the reference-recorded eepos trajectory
    (fixture 0_0: reference examples/trajfiles/0_0_eepos.traj)."""
    xu, ee_ref = traj_0_0
    qs = jnp.asarray(xu[:, :7])
    ee = jax.vmap(lambda q: dyn.ee_pos(iiwa, q))(qs)
    np.testing.assert_allclose(np.asarray(ee), ee_ref, atol=2e-4)


def test_ee_jacobian_vs_autodiff(iiwa):
    rng = np.random.default_rng(0)
    for _ in range(5):
        q = _rand_q(rng)
        _, J = dyn.ee_pos_and_jac(iiwa, q)
        J_ad = jax.jacfwd(lambda qq: dyn.ee_pos(iiwa, qq)[:3])(q)
        np.testing.assert_allclose(np.asarray(J), np.asarray(J_ad), atol=1e-5)


def test_mass_matrix_symmetric_pd(iiwa):
    rng = np.random.default_rng(1)
    for _ in range(5):
        M = np.asarray(dyn.mass_matrix(iiwa, _rand_q(rng)))
        np.testing.assert_allclose(M, M.T, atol=1e-5)
        assert np.linalg.eigvalsh(M).min() > 0


def test_rnea_consistent_with_mass_matrix(iiwa):
    """tau = M qdd + c  must hold between the two independent recursions
    (RNEA vs CRBA)."""
    rng = np.random.default_rng(2)
    for _ in range(5):
        q, qd, qdd = _rand_q(rng), _rand_q(rng, scale=1.0), _rand_q(rng, scale=3.0)
        tau = dyn.rnea(iiwa, q, qd, qdd)
        M = dyn.mass_matrix(iiwa, q)
        c = dyn.bias_force(iiwa, q, qd)
        np.testing.assert_allclose(
            np.asarray(tau), np.asarray(M @ qdd + c), rtol=2e-4, atol=2e-4
        )


def test_rnea_vs_lagrangian_coriolis(iiwa):
    """Independent physics check: with g=0 the bias force must equal
    Mdot qd - 0.5 d/dq (qd' M qd), derived purely from M(q) by autodiff."""
    rng = np.random.default_rng(3)
    q, qd = _rand_q(rng), _rand_q(rng, scale=1.0)

    dM = jax.jacfwd(lambda qq: dyn.mass_matrix(iiwa, qq))(q)  # (7,7,7)
    Mdot = jnp.einsum("ijk,k->ij", dM, qd)
    dT_dq = 0.5 * jnp.einsum("i,ijk,j->k", qd, dM, qd)
    c_lagrange = Mdot @ qd - dT_dq
    c_rnea = dyn.bias_force(iiwa, q, qd)
    np.testing.assert_allclose(
        np.asarray(c_rnea), np.asarray(c_lagrange), rtol=2e-4, atol=2e-4
    )


def test_forward_inverse_roundtrip(iiwa):
    rng = np.random.default_rng(4)
    q, qd, u = _rand_q(rng), _rand_q(rng, scale=1.0), _rand_q(rng, scale=5.0)
    qdd = dyn.forward_dynamics(iiwa, q, qd, u)
    tau = dyn.rnea(iiwa, q, qd, qdd)
    np.testing.assert_allclose(np.asarray(tau), np.asarray(u), rtol=2e-4, atol=2e-4)


def test_fd_gradient_vs_autodiff(iiwa):
    rng = np.random.default_rng(5)
    q, qd, u = _rand_q(rng), _rand_q(rng, scale=1.0), _rand_q(rng, scale=5.0)
    qdd, dq, dqd, Mi = dyn.fd_and_gradient(iiwa, q, qd, u)

    fd = lambda qq, qqd, uu: dyn.forward_dynamics(iiwa, qq, qqd, uu)
    np.testing.assert_allclose(
        np.asarray(qdd), np.asarray(fd(q, qd, u)), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(dq), np.asarray(jax.jacfwd(fd, 0)(q, qd, u)), rtol=3e-3, atol=3e-3
    )
    np.testing.assert_allclose(
        np.asarray(dqd), np.asarray(jax.jacfwd(fd, 1)(q, qd, u)), rtol=3e-3, atol=3e-3
    )
    np.testing.assert_allclose(
        np.asarray(Mi), np.asarray(jax.jacfwd(fd, 2)(q, qd, u)), rtol=1e-3, atol=1e-4
    )


def test_vmap_over_knots(iiwa):
    rng = np.random.default_rng(6)
    Q = jnp.asarray(rng.uniform(-2, 2, (16, 7)), jnp.float32)
    ee = jax.vmap(lambda q: dyn.ee_pos(iiwa, q))(Q)
    assert ee.shape == (16, 6)
    M = jax.vmap(lambda q: dyn.mass_matrix(iiwa, q))(Q)
    assert M.shape == (16, 7, 7)


def test_aba_matches_crba_forward_dynamics(iiwa):
    """The articulated-body algorithm must equal M^{-1}(u - c)."""
    rng = np.random.default_rng(7)
    for _ in range(5):
        q, qd, u = _rand_q(rng), _rand_q(rng, scale=1.0), _rand_q(rng, scale=10.0)
        qdd_aba = dyn.forward_dynamics(iiwa, q, qd, u)
        qdd_crba = dyn.forward_dynamics_crba(iiwa, q, qd, u)
        np.testing.assert_allclose(
            np.asarray(qdd_aba), np.asarray(qdd_crba), rtol=2e-3, atol=2e-3
        )
