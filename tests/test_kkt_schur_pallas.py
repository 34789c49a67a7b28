"""Fused KKT+Schur Pallas kernel vs the portable XLA pipeline."""
import jax.numpy as jnp
import numpy as np

from mpcgpu_tpu.ops.dz import compute_dz
from mpcgpu_tpu.ops.kkt import form_kkt
from mpcgpu_tpu.ops.pallas.kkt_schur_kernel import (
    compute_dz_lanes, form_kkt_schur_pallas)
from mpcgpu_tpu.ops.schur import form_schur

N = 8  # interpreter-mode cost scales with the lane batch
RHO = 1e-3


def _problem(iiwa, traj_0_0):
    xu, ee = traj_0_0
    rng = np.random.default_rng(0)
    X = jnp.asarray(xu[:N, :14]) + 0.02 * jnp.asarray(
        rng.normal(size=(N, 14)), jnp.float32)
    U = jnp.asarray(xu[:N - 1, 14:])
    goals = jnp.asarray(ee[:N])
    xs = jnp.asarray(xu[0, :14])
    return X, U, goals, xs


def test_kernel_matches_xla_pipeline(iiwa, traj_0_0):
    X, U, goals, xs = _problem(iiwa, traj_0_0)
    kkt = form_kkt(iiwa, X, U, goals, xs, 0.015625, 1e-4, 1e-3)
    sd = form_schur(kkt, RHO)
    ls = form_kkt_schur_pallas(
        iiwa, X, U, goals, xs, RHO, 0.015625, 1e-4, 1e-3, interpret=True)

    tol = dict(rtol=3e-3, atol=3e-3)
    lane = lambda b: np.asarray(jnp.transpose(b, (2, 0, 1)))
    np.testing.assert_allclose(lane(ls.SD), np.asarray(sd.S.diag), **tol)
    np.testing.assert_allclose(lane(ls.SL), np.asarray(sd.S.lower), **tol)
    np.testing.assert_allclose(lane(ls.SU), np.asarray(sd.S.upper), **tol)
    np.testing.assert_allclose(lane(ls.PD), np.asarray(sd.Pinv.diag), **tol)
    np.testing.assert_allclose(lane(ls.PL), np.asarray(sd.Pinv.lower), **tol)
    np.testing.assert_allclose(lane(ls.PU), np.asarray(sd.Pinv.upper), **tol)
    np.testing.assert_allclose(np.asarray(ls.gamma.T), np.asarray(sd.gamma),
                               **tol)
    np.testing.assert_allclose(lane(ls.Qinv), np.asarray(sd.Qinv), **tol)
    np.testing.assert_allclose(
        lane(ls.A)[:-1], np.asarray(kkt.A), **tol)

    # dz path
    rng = np.random.default_rng(1)
    lam = jnp.asarray(rng.normal(size=(N, 14)) * 0.1, jnp.float32)
    dX_ref, dU_ref = compute_dz(kkt, sd, lam)
    dX, dU = compute_dz_lanes(ls, lam.T)
    np.testing.assert_allclose(np.asarray(dX), np.asarray(dX_ref), **tol)
    np.testing.assert_allclose(np.asarray(dU), np.asarray(dU_ref), **tol)


def test_kernel_angle_wrap_matches_xla(iiwa, traj_0_0):
    """ANGLE_WRAP in the fused kernel (round-3 envelope closure): affects
    only the defect/gamma, exact reference semantics."""
    X, U, goals, xs = _problem(iiwa, traj_0_0)
    X = X + jnp.concatenate(  # push q near +-pi so the wrap triggers
        [jnp.full((N, 7), 3.0, jnp.float32), jnp.zeros((N, 7), jnp.float32)],
        axis=1)
    kkt = form_kkt(iiwa, X, U, goals, xs, 0.015625, 1e-4, 1e-3,
                   angle_wrap=True)
    sd = form_schur(kkt, RHO)
    ls = form_kkt_schur_pallas(
        iiwa, X, U, goals, xs, RHO, 0.015625, 1e-4, 1e-3, wrap=True,
        interpret=True)
    ls_nowrap = form_kkt_schur_pallas(
        iiwa, X, U, goals, xs, RHO, 0.015625, 1e-4, 1e-3, wrap=False,
        interpret=True)

    lane = lambda b: np.asarray(jnp.transpose(b, (2, 0, 1)))
    # The shifted-q configuration makes SD entries O(800); compare
    # norm-relative (like the hardware gate's _relerr) so f32
    # cancellation noise in near-zero entries doesn't fail the check.
    sd_ref = np.asarray(sd.S.diag)
    assert np.abs(lane(ls.SD) - sd_ref).max() < 1e-3 * np.abs(sd_ref).max()
    np.testing.assert_allclose(np.asarray(ls.gamma.T), np.asarray(sd.gamma),
                               rtol=3e-3, atol=3e-3)
    # the wrap must have actually fired (gamma differs from unwrapped)
    assert not np.allclose(np.asarray(ls.gamma), np.asarray(ls_nowrap.gamma))
    # and only the defect: the Schur blocks are untouched
    np.testing.assert_array_equal(np.asarray(ls.SD), np.asarray(ls_nowrap.SD))


def test_kernel_joint_tracking_matches_xla(iiwa, traj_0_0):
    """Joint-space tracking in the fused kernel (round-3 envelope
    closure): diagonal cost Hessian, state-reference gradient."""
    xu, ee = traj_0_0
    X, U, _, xs = _problem(iiwa, traj_0_0)
    X_ref = jnp.asarray(xu[:N, :14])  # goals = recorded states
    q_cost = 2.0
    kkt = form_kkt(iiwa, X, U, X_ref, xs, 0.015625, 1e-4, 1e-3,
                   tracking="joint", q_cost=q_cost)
    sd = form_schur(kkt, RHO)
    ls = form_kkt_schur_pallas(
        iiwa, X, U, X_ref, xs, RHO, 0.015625, 1e-4, 1e-3,
        tracking="joint", q_cost=q_cost, interpret=True)

    tol = dict(rtol=3e-3, atol=3e-3)
    lane = lambda b: np.asarray(jnp.transpose(b, (2, 0, 1)))
    np.testing.assert_allclose(lane(ls.SD), np.asarray(sd.S.diag), **tol)
    np.testing.assert_allclose(lane(ls.SL), np.asarray(sd.S.lower), **tol)
    np.testing.assert_allclose(lane(ls.PD), np.asarray(sd.Pinv.diag), **tol)
    np.testing.assert_allclose(np.asarray(ls.gamma.T), np.asarray(sd.gamma),
                               **tol)
    np.testing.assert_allclose(lane(ls.Qinv), np.asarray(sd.Qinv), **tol)


def test_kernel_gauss_newton_and_noprecond(iiwa, traj_0_0):
    X, U, goals, xs = _problem(iiwa, traj_0_0)
    kkt = form_kkt(iiwa, X, U, goals, xs, 0.015625, 1e-4, 1e-3,
                   hessian="gauss_newton")
    sd = form_schur(kkt, RHO, preconditioned=False)
    ls = form_kkt_schur_pallas(
        iiwa, X, U, goals, xs, RHO, 0.015625, 1e-4, 1e-3,
        hessian="gauss_newton", precond=False, interpret=True)
    lane = lambda b: np.asarray(jnp.transpose(b, (2, 0, 1)))
    # GN position block + rho=1e-3 makes Q near-singular: inverses carry
    # entries ~1/rho, so compare with correspondingly looser tolerance.
    np.testing.assert_allclose(lane(ls.SD), np.asarray(sd.S.diag),
                               rtol=1e-2, atol=2e-1)
    np.testing.assert_allclose(lane(ls.PD), np.asarray(sd.Pinv.diag),
                               rtol=1e-5, atol=1e-5)


def test_stair_tile_kernel_matches_einsum():
    """The tiled path's stair off-diagonal products (PL/PU) as a gridded
    Pallas kernel must match the batched-einsum formulation it replaced
    (reference stair setup: include/pcg/linsys_setup.cuh:11-49)."""
    import jax
    from jax.experimental import pallas as pl

    from mpcgpu_tpu.ops.pallas.kkt_schur_kernel import _stair_tile_kernel

    rng = np.random.default_rng(3)
    nx, n = 14, 256
    f32 = jnp.float32
    ti = jnp.asarray(rng.standard_normal((nx, nx, n)), f32)
    phi = jnp.asarray(rng.standard_normal((nx, nx, n)), f32)
    su = jnp.asarray(rng.standard_normal((nx, nx, n)), f32)
    tip = jnp.roll(ti, 1, axis=2)
    tin = jnp.roll(ti, -1, axis=2)

    sds = jax.ShapeDtypeStruct
    mat = pl.BlockSpec((nx, nx, 128), lambda t: (0, 0, t))
    PL, PU = pl.pallas_call(
        _stair_tile_kernel, grid=(2,),
        out_shape=(sds((nx, nx, n), f32), sds((nx, nx, n), f32)),
        in_specs=[mat] * 5, out_specs=(mat, mat), interpret=True,
    )(ti, tip, tin, phi, su)

    hi = jax.lax.Precision.HIGHEST
    PLr = -jnp.einsum("ijn,jkn,kln->iln", ti, phi, tip, precision=hi)
    PUr = -jnp.einsum("ijn,jkn,kln->iln", ti, su, tin, precision=hi)
    np.testing.assert_allclose(np.asarray(PL), np.asarray(PLr),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(PU), np.asarray(PUr),
                               rtol=1e-5, atol=1e-5)
