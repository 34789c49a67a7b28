"""Block-cyclic-reduction exact solver: portable + fused lane kernel.

Oracle chain: dense numpy solve -> portable bcr_solve (ops/btsolve.py)
-> lane-layout kernel (ops/pallas/bcr_kernel.py, interpreter mode on CPU)
-> end-to-end sqp_solve(linsys="bcr") on both stage paths.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpcgpu_tpu.ops import btridiag
from mpcgpu_tpu.ops.btsolve import bcr_solve
from mpcgpu_tpu.ops.schur import form_schur
from tests.test_schur_pcg import NX, RHO, random_kkt


@pytest.mark.parametrize("n", [2, 8, 16])
def test_bcr_matches_dense(n):
    kkt = random_kkt(seed=7, n=n)
    sd = form_schur(kkt, RHO)
    lam = bcr_solve(sd.S, sd.gamma)
    dense = np.asarray(btridiag.to_dense(sd.S), np.float64)
    ref = np.linalg.solve(dense, np.asarray(sd.gamma, np.float64).reshape(-1))
    got = np.asarray(lam).reshape(-1)
    scale = np.abs(ref).max()
    np.testing.assert_allclose(got / scale, ref / scale, atol=1e-5)


def test_bcr_rejects_non_power_of_two():
    kkt = random_kkt(seed=7, n=6)
    sd = form_schur(kkt, RHO)
    with pytest.raises(AssertionError, match="power-of-2"):
        bcr_solve(sd.S, sd.gamma)


def test_bcr_lane_kernel_matches_portable():
    from mpcgpu_tpu.ops.pallas.bcr_kernel import bcr_dz_pallas_lanes
    from mpcgpu_tpu.ops.pallas.kkt_schur_kernel import LaneSchur

    n = 16
    kkt = random_kkt(seed=11, n=n)
    sd = form_schur(kkt, RHO)
    want = bcr_solve(sd.S, sd.gamma)

    to_lane = lambda b: jnp.transpose(b, (1, 2, 0))
    nu = kkt.R.shape[-1]
    zeros_u = jnp.zeros((nu, nu, n), jnp.float32)
    Rinv_pad = jnp.concatenate(
        [to_lane(sd.Rinv), jnp.zeros((nu, nu, 1), jnp.float32)], axis=2)
    A_pad = jnp.concatenate(
        [to_lane(kkt.A), jnp.zeros((NX, NX, 1), jnp.float32)], axis=2)
    B_pad = jnp.concatenate(
        [to_lane(kkt.B), jnp.zeros((NX, nu, 1), jnp.float32)], axis=2)
    r_pad = jnp.concatenate(
        [kkt.r.T, jnp.zeros((nu, 1), jnp.float32)], axis=1)
    ls = LaneSchur(
        SL=to_lane(sd.S.lower), SD=to_lane(sd.S.diag), SU=to_lane(sd.S.upper),
        PL=zeros_u * 0, PD=to_lane(sd.Pinv.diag), PU=zeros_u * 0,
        gamma=sd.gamma.T, Qinv=to_lane(sd.Qinv), Rinv=Rinv_pad,
        A=A_pad, B=B_pad, q=kkt.q.T, r=r_pad,
    )
    lam_l, dX, dU, iters, hit = bcr_dz_pallas_lanes(ls, interpret=True)
    scale = float(jnp.abs(want).max())
    np.testing.assert_allclose(np.asarray(lam_l).T / scale,
                               np.asarray(want) / scale, atol=2e-5)
    assert int(iters) == 0 and not bool(hit)

    # dz must match the portable recovery at the exact solution
    from mpcgpu_tpu.ops.dz import compute_dz

    dX_ref, dU_ref = compute_dz(kkt, sd, want)
    np.testing.assert_allclose(dX, dX_ref, atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(dU, dU_ref, atol=2e-4, rtol=1e-3)


def test_bcr_pcg_split_matches_single_kernel():
    """The long-horizon split path (CG as XLA glue + solve-only BCR
    kernel per M-apply, used at N > 256 where the single kernel exceeds
    scoped VMEM) must match the single-kernel hybrid."""
    from mpcgpu_tpu.ops.pallas.bcr_kernel import bcr_pcg_dz_pallas_lanes
    from mpcgpu_tpu.ops.pallas.kkt_schur_kernel import LaneSchur

    n = 16
    kkt = random_kkt(seed=5, n=n)
    sd = form_schur(kkt, RHO)
    to_lane = lambda b: jnp.transpose(b, (1, 2, 0))
    nu = kkt.R.shape[-1]
    zeros_u = jnp.zeros((NX, NX, n), jnp.float32)
    Rinv_pad = jnp.concatenate(
        [to_lane(sd.Rinv), jnp.zeros((nu, nu, 1), jnp.float32)], axis=2)
    A_pad = jnp.concatenate(
        [to_lane(kkt.A), jnp.zeros((NX, NX, 1), jnp.float32)], axis=2)
    B_pad = jnp.concatenate(
        [to_lane(kkt.B), jnp.zeros((NX, nu, 1), jnp.float32)], axis=2)
    r_pad = jnp.concatenate(
        [kkt.r.T, jnp.zeros((nu, 1), jnp.float32)], axis=1)
    ls = LaneSchur(
        SL=to_lane(sd.S.lower), SD=to_lane(sd.S.diag), SU=to_lane(sd.S.upper),
        PL=zeros_u * 0, PD=to_lane(sd.Qinv) * 0, PU=zeros_u * 0,
        gamma=sd.gamma.T, Qinv=to_lane(sd.Qinv), Rinv=Rinv_pad,
        A=A_pad, B=B_pad, q=kkt.q.T, r=r_pad,
    )
    lam0 = jnp.zeros((NX, n), jnp.float32)
    one = bcr_pcg_dz_pallas_lanes(ls, lam0, 20, 1e-10, interpret=True,
                                  split=False)
    two = bcr_pcg_dz_pallas_lanes(ls, lam0, 20, 1e-10, interpret=True,
                                  split=True)
    scale = float(jnp.abs(one[0]).max())
    np.testing.assert_allclose(np.asarray(two[0]) / scale,
                               np.asarray(one[0]) / scale, atol=2e-5)
    np.testing.assert_allclose(two[1], one[1], atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(two[2], one[2], atol=2e-4, rtol=1e-3)
    assert int(two[3]) == int(one[3])  # identical CG iteration counts


def test_sqp_solve_bcr_backend(iiwa, traj_0_0):
    """End-to-end: bcr backend tracks the dense-oracle solve."""
    from mpcgpu_tpu.config import SolverConfig
    from mpcgpu_tpu.sqp import sqp_solve

    xu, ee = traj_0_0
    n = 16
    cfg = SolverConfig.for_knots(n, sqp_max_iter=3)
    X = jnp.asarray(xu[:n, :14]); U = jnp.asarray(xu[:n - 1, 14:])
    goals = jnp.asarray(ee[:n]); xs = X[0]
    lam = jnp.zeros((n, 14), jnp.float32)
    rho = jnp.asarray(1e-3, jnp.float32)
    tol = jnp.asarray(1e-8, jnp.float32)

    res_bcr = sqp_solve(iiwa, cfg, X, U, lam, goals, xs, rho, tol,
                        linsys="bcr")
    res_dense = sqp_solve(iiwa, cfg, X, U, lam, goals, xs, rho, tol,
                          linsys="dense")
    np.testing.assert_allclose(np.asarray(res_bcr.X),
                               np.asarray(res_dense.X), rtol=1e-4, atol=1e-5)


def test_sqp_solve_bcr_fused_stages(iiwa, traj_0_0):
    """pallas_stages + linsys='bcr' uses the fused BCR kernel and matches
    the portable bcr path."""
    import dataclasses

    from mpcgpu_tpu.config import SolverConfig
    from mpcgpu_tpu.sqp import sqp_solve

    xu, ee = traj_0_0
    n = 16
    cfg = SolverConfig.for_knots(n, sqp_max_iter=2)
    X = jnp.asarray(xu[:n, :14]); U = jnp.asarray(xu[:n - 1, 14:])
    goals = jnp.asarray(ee[:n]); xs = X[0]
    lam = jnp.zeros((n, 14), jnp.float32)
    rho = jnp.asarray(1e-3, jnp.float32)
    tol = jnp.asarray(1e-8, jnp.float32)

    res_f = sqp_solve(iiwa, dataclasses.replace(cfg, pallas_stages=True),
                      X, U, lam, goals, xs, rho, tol, linsys="bcr")
    res_p = sqp_solve(iiwa, cfg, X, U, lam, goals, xs, rho, tol,
                      linsys="bcr")
    np.testing.assert_allclose(np.asarray(res_f.X), np.asarray(res_p.X),
                               rtol=2e-4, atol=2e-5)
