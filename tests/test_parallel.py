"""Horizon sharding over the virtual 8-device mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpcgpu_tpu.ops import btridiag
from mpcgpu_tpu.ops.pcg import pcg
from mpcgpu_tpu.ops.schur import form_schur
from tests.test_schur_pcg import NX, RHO, random_kkt

N_SHARD = 16  # divisible by 8 devices


@pytest.fixture(scope="module")
def mesh():
    from mpcgpu_tpu.parallel.sharded import horizon_mesh

    assert len(jax.devices()) == 8
    return horizon_mesh()


def test_pcg_sharded_matches_single_device(mesh):
    from mpcgpu_tpu.parallel.pcg_sharded import pcg_sharded

    kkt = random_kkt(seed=21, n=N_SHARD)
    sd = form_schur(kkt, RHO)
    lam0 = jnp.zeros((N_SHARD, NX), jnp.float32)

    ref = pcg(sd.S, sd.Pinv, sd.gamma, lam0, max_iter=400, exit_tol=1e-10)
    lam, iters, hit = pcg_sharded(mesh, sd.S, sd.Pinv, sd.gamma, lam0,
                                  400, 1e-10)
    dense = np.asarray(btridiag.to_dense(sd.S), np.float64)
    x_ref = np.linalg.solve(dense, np.asarray(sd.gamma, np.float64).reshape(-1))
    np.testing.assert_allclose(
        np.asarray(lam).reshape(-1), x_ref, rtol=5e-3, atol=5e-3
    )
    assert not bool(hit)
    assert abs(int(iters) - int(ref.iters)) <= 3


def test_collectives_in_compiled_hlo(mesh):
    """The sharded paths must actually COMMUNICATE, not all-gather to one
    device: the compiled programs must contain ICI collectives (all-reduce
    for the PCG dot products, collective-permute for the k+-1 halos) --
    the multi-chip analogue of the reference's cooperative-groups grid
    syncs and reduction slots (reference include/pcg/sqp.cuh:137-166)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from mpcgpu_tpu.parallel.pcg_sharded import pcg_sharded

    kkt = random_kkt(seed=3, n=N_SHARD)
    sd = form_schur(kkt, RHO)
    lam0 = jnp.zeros((N_SHARD, NX), jnp.float32)

    # explicit shard_map path: psum + ppermute by construction
    lowered = jax.jit(
        lambda S, Pinv, g, l0: pcg_sharded(mesh, S, Pinv, g, l0, 50, 1e-8)
    ).lower(sd.S, sd.Pinv, sd.gamma, lam0)
    txt = lowered.compile().as_text()
    assert "all-reduce" in txt, "explicit path lost its psum all-reduces"
    assert "collective-permute" in txt, "explicit path lost its ppermute halos"

    # GSPMD path: sharded inputs into the plain solver; the partitioner
    # must insert the same collectives rather than gathering to one device
    sh_b = NamedSharding(mesh, P("knots", None, None))
    sh_v = NamedSharding(mesh, P("knots", None))
    S_sh = jax.tree.map(lambda a: jax.device_put(a, sh_b), sd.S)
    Pinv_sh = jax.tree.map(lambda a: jax.device_put(a, sh_b), sd.Pinv)
    g_sh = jax.device_put(sd.gamma, sh_v)
    l0_sh = jax.device_put(lam0, sh_v)
    lowered = jax.jit(
        lambda S, Pinv, g, l0: pcg(S, Pinv, g, l0, max_iter=50,
                                   exit_tol=1e-8).lam
    ).lower(S_sh, Pinv_sh, g_sh, l0_sh)
    txt = lowered.compile().as_text()
    assert "all-reduce" in txt, "GSPMD partitioning lost the dot all-reduces"
    assert ("collective-permute" in txt or "all-to-all" in txt), \
        "GSPMD partitioning lost the halo exchange"


N_BIG = 512  # the reference's largest tuned horizon (settings.cuh:135-156)


def test_fused_sharded_pcg_matches_single_device_at_n512(mesh):
    """At-scale check (BASELINE config 5): the shard_map fused-Pallas PCG
    (per-shard band kernels + ppermute halos + psum dots) must match the
    single-device solver at N=512 -- same iteration count, same residual
    quality."""
    from mpcgpu_tpu.parallel.pcg_sharded_pallas import pcg_sharded_pallas

    kkt = random_kkt(seed=7, n=N_BIG)
    sd = form_schur(kkt, RHO)
    lam0 = jnp.zeros((N_BIG, NX), jnp.float32)

    ref = pcg(sd.S, sd.Pinv, sd.gamma, lam0, max_iter=400, exit_tol=1e-10)
    lam, iters, hit = pcg_sharded_pallas(mesh, sd.S, sd.Pinv, sd.gamma,
                                         lam0, 400, 1e-10)
    assert not bool(hit)
    assert abs(int(iters) - int(ref.iters)) <= 3
    gnorm = float(jnp.linalg.norm(sd.gamma))
    res_sh = float(jnp.linalg.norm(sd.gamma - btridiag.spmv(sd.S, lam)))
    res_ref = float(jnp.linalg.norm(sd.gamma - btridiag.spmv(sd.S, ref.lam)))
    assert res_sh / gnorm < 1e-4
    assert res_sh < 3.0 * res_ref + 1e-6 * gnorm
    np.testing.assert_allclose(np.asarray(lam), np.asarray(ref.lam),
                               rtol=5e-2, atol=1e-4)


def test_collectives_in_fused_sharded_hlo_at_n512(mesh):
    """The at-scale fused-sharded program must contain the ICI
    collectives (all-reduce dots, collective-permute halos) at N=512 --
    the reference's per-block reduction slots + grid syncs at its largest
    horizon (include/pcg/sqp.cuh:137-166,275)."""
    from mpcgpu_tpu.parallel.pcg_sharded_pallas import pcg_sharded_pallas

    kkt = random_kkt(seed=9, n=N_BIG)
    sd = form_schur(kkt, RHO)
    lam0 = jnp.zeros((N_BIG, NX), jnp.float32)

    lowered = jax.jit(
        lambda S, Pinv, g, l0: pcg_sharded_pallas(mesh, S, Pinv, g, l0,
                                                  50, 1e-8)
    ).lower(sd.S, sd.Pinv, sd.gamma, lam0)
    txt = lowered.compile().as_text()
    assert "all-reduce" in txt, "fused sharded path lost its psum all-reduces"
    assert "collective-permute" in txt, \
        "fused sharded path lost its ppermute halos"


def test_sharded_sqp_solve_fused_pcg(mesh, iiwa, traj_0_0):
    """fused_pcg=True routes the production solve through the per-shard
    Pallas CG and must agree with the GSPMD-partitioned solve."""
    from mpcgpu_tpu.config import SolverConfig
    from mpcgpu_tpu.parallel.sharded import sharded_sqp_solve

    xu, ee = traj_0_0
    n = 16
    cfg = SolverConfig.for_knots(n, sqp_max_iter=2)
    X = jnp.asarray(xu[:n, :14]); U = jnp.asarray(xu[:n - 1, 14:])
    goals = jnp.asarray(ee[:n]); xs = X[0]
    lam = jnp.zeros((n, 14), jnp.float32)
    rho = jnp.asarray(1e-3, jnp.float32)
    tol = jnp.asarray(1e-6, jnp.float32)

    res_f = sharded_sqp_solve(iiwa, cfg, mesh, X, U, lam, goals, xs,
                              rho, tol, fused_pcg=True)
    res_gspmd = sharded_sqp_solve(iiwa, cfg, mesh, X, U, lam, goals, xs,
                                  rho, tol)
    assert np.isfinite(np.asarray(res_f.X)).all()
    np.testing.assert_allclose(np.asarray(res_f.X),
                               np.asarray(res_gspmd.X), rtol=2e-4, atol=2e-5)


def test_sharded_sqp_solve_runs(mesh, iiwa, traj_0_0):
    from mpcgpu_tpu.config import SolverConfig
    from mpcgpu_tpu.parallel.sharded import sharded_sqp_solve

    xu, ee = traj_0_0
    n = 16
    cfg = SolverConfig.for_knots(n, sqp_max_iter=2)
    X = jnp.asarray(xu[:n, :14]); U = jnp.asarray(xu[:n - 1, 14:])
    goals = jnp.asarray(ee[:n]); xs = X[0]
    lam = jnp.zeros((n, 14), jnp.float32)

    res = sharded_sqp_solve(iiwa, cfg, mesh, X, U, lam, goals, xs,
                            jnp.asarray(1e-3, jnp.float32),
                            jnp.asarray(1e-6, jnp.float32))
    assert np.isfinite(np.asarray(res.X)).all()
    assert np.isfinite(float(res.stats.final_merit))


def test_sharded_sqp_solve_explicit_pcg(mesh, iiwa, traj_0_0):
    """explicit_pcg=True routes the solve through the hand-collective
    shard_map PCG (psum dots + ppermute halos) and must agree with the
    GSPMD-partitioned solve."""
    from mpcgpu_tpu.config import SolverConfig
    from mpcgpu_tpu.parallel.sharded import sharded_sqp_solve

    xu, ee = traj_0_0
    n = 16
    cfg = SolverConfig.for_knots(n, sqp_max_iter=2)
    X = jnp.asarray(xu[:n, :14]); U = jnp.asarray(xu[:n - 1, 14:])
    goals = jnp.asarray(ee[:n]); xs = X[0]
    lam = jnp.zeros((n, 14), jnp.float32)
    rho = jnp.asarray(1e-3, jnp.float32)
    tol = jnp.asarray(1e-6, jnp.float32)

    res_exp = sharded_sqp_solve(iiwa, cfg, mesh, X, U, lam, goals, xs,
                                rho, tol, explicit_pcg=True)
    res_gspmd = sharded_sqp_solve(iiwa, cfg, mesh, X, U, lam, goals, xs,
                                  rho, tol)
    assert np.isfinite(np.asarray(res_exp.X)).all()
    np.testing.assert_allclose(np.asarray(res_exp.X),
                               np.asarray(res_gspmd.X), rtol=2e-4, atol=2e-5)


def test_arms_sharded_matches_vmapped_single_device(iiwa, traj_0_0):
    """One arm per device (shard_map over the batch axis) must reproduce
    the single-device batched loop arm for arm -- zero collectives, pure
    data parallelism (results/round3/batched_throughput.json analysis)."""
    import dataclasses

    from mpcgpu_tpu.config import PCGConfig, SolverConfig
    from mpcgpu_tpu.parallel.sharded import (arms_mesh,
                                             simulate_mpc_scan_arms_sharded)
    from mpcgpu_tpu.sim import simulate_mpc_scan, simulate_mpc_scan_batched

    xu, ee = traj_0_0
    n, B, n_updates = 8, 8, 2
    cfg = dataclasses.replace(SolverConfig.for_knots(n, sqp_max_iter=2),
                              pcg=PCGConfig(max_iter=10))
    xu_j = jnp.asarray(xu); ee_j = jnp.asarray(ee)
    X = jnp.asarray(xu[:n, :14]); U = jnp.asarray(xu[:n - 1, 14:])
    lam = jnp.zeros((n, 14), jnp.float32)
    rho = jnp.float32(1e-3)

    ref = simulate_mpc_scan_batched(iiwa, cfg, xu_j, ee_j, X, U, lam, rho,
                                    1e-5, n_updates, "pcg", batch=B)
    # same per-arm perturbation construction as the batched entry
    key = jax.random.PRNGKey(0)
    dq = 0.02 * jax.random.normal(key, (B, cfg.nq), X.dtype)
    Xb = jnp.broadcast_to(X, (B,) + X.shape).at[:, 0, :cfg.nq].add(dq)
    Ub = jnp.broadcast_to(U, (B,) + U.shape)
    lamb = jnp.broadcast_to(lam, (B,) + lam.shape)

    out = simulate_mpc_scan_arms_sharded(iiwa, cfg, arms_mesh(), xu_j, ee_j,
                                         Xb, Ub, lamb, rho, 1e-5,
                                         n_updates, "pcg")
    np.testing.assert_allclose(np.asarray(out["tracking_errors"]),
                               np.asarray(ref["tracking_errors"]),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out["final_xs"]),
                               np.asarray(ref["final_xs"]),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_packed_arms_sharded_matches_unsharded_groups(iiwa, traj_0_0):
    """Fleet mode: each device runs one ARM-PACKED closed loop
    (simulate_mpc_scan_packed_arms_sharded).  A 2-device mesh with
    batch_per_device=2 must reproduce the two unsharded packed runs
    (seeds 0 and 1) group for group -- zero collectives."""
    import dataclasses

    from mpcgpu_tpu.config import PCGConfig, SolverConfig
    from mpcgpu_tpu.parallel.sharded import (
        ARM_AXIS, simulate_mpc_scan_packed_arms_sharded)
    from mpcgpu_tpu.sim import simulate_mpc_scan_packed
    from jax.sharding import Mesh

    xu, ee = traj_0_0
    n, B, n_updates, ndev = 4, 2, 2, 2
    cfg = dataclasses.replace(
        SolverConfig.for_knots(n, sqp_max_iter=1),
        pallas_stages=True, megakernel=True, megakernel_solve=True,
        pcg=PCGConfig(max_iter=4))
    xu_j = jnp.asarray(xu); ee_j = jnp.asarray(ee)
    X = jnp.asarray(xu[:n, :14]); U = jnp.asarray(xu[:n - 1, 14:])
    lam = jnp.zeros((n, 14), jnp.float32)
    rho = jnp.float32(1e-3)
    mesh2 = Mesh(np.asarray(jax.devices()[:ndev]), (ARM_AXIS,))

    out = simulate_mpc_scan_packed_arms_sharded(
        iiwa, cfg, mesh2, xu_j, ee_j, X, U, lam, rho, 1e-9, n_updates,
        batch_per_device=B)
    assert out["tracking_errors"].shape == (ndev * B, n_updates)

    for d in range(ndev):
        ref = simulate_mpc_scan_packed(
            iiwa, cfg, xu_j, ee_j, X, U, lam, rho, 1e-9, n_updates,
            batch=B, seed=d)
        sl = slice(d * B, (d + 1) * B)
        np.testing.assert_allclose(
            np.asarray(out["tracking_errors"][sl]),
            np.asarray(ref["tracking_errors"]), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(out["final_xs"][sl]),
            np.asarray(ref["final_xs"]), rtol=1e-5, atol=1e-6)
        np.testing.assert_array_equal(
            np.asarray(out["sqp_iters"][sl]), np.asarray(ref["sqp_iters"]))


def test_knot_sharded_closed_loop_matches_single_device(mesh, iiwa,
                                                        traj_0_0):
    """The device-resident CLOSED LOOP (solve -> rollout -> shift ->
    re-injection, sim.simulate_mpc_scan) with the knot axis sharded must
    match the single-device loop -- shift/refill/re-injection run under
    GSPMD sharding (round-4 VERDICT item 6; the MPC loop the reference
    scales, reference include/mpcsim.cuh:286-451).  The at-scale (N=512)
    version of this check is the dryrun_multichip sharded-loop leg."""
    import dataclasses

    from mpcgpu_tpu.config import PCGConfig, SolverConfig
    from mpcgpu_tpu.parallel.sharded import simulate_mpc_scan_sharded
    from mpcgpu_tpu.sim import simulate_mpc_scan

    xu, ee = traj_0_0
    n, n_updates = N_SHARD, 3
    cfg = dataclasses.replace(SolverConfig.for_knots(n, sqp_max_iter=2),
                              pcg=PCGConfig(max_iter=10))
    xu_j = jnp.asarray(xu); ee_j = jnp.asarray(ee)
    X = jnp.asarray(xu[:n, :14]); U = jnp.asarray(xu[:n - 1, 14:])
    lam = jnp.zeros((n, 14), jnp.float32)
    rho = jnp.float32(1e-3)

    out_sh = simulate_mpc_scan_sharded(iiwa, cfg, mesh, xu_j, ee_j, X, U,
                                       lam, rho, 1e-5, n_updates)
    ref = simulate_mpc_scan(iiwa, cfg, xu_j, ee_j, X, U, lam, rho, 1e-5,
                            n_updates)
    np.testing.assert_allclose(np.asarray(out_sh["final_xs"]),
                               np.asarray(ref["final_xs"]),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out_sh["tracking_errors"]),
                               np.asarray(ref["tracking_errors"]),
                               rtol=2e-3, atol=2e-4)
