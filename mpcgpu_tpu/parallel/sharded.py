"""Horizon (knot-axis) sharding over a TPU mesh.

The reference's only parallel axis is the horizon: one CUDA thread-block
per knot point inside a single GPU, synchronized with cooperative-groups
grid barriers (SURVEY.md section 2.3).  The multi-chip TPU analogue shards
the knot axis across a 1-D device mesh: every per-knot stage (dynamics,
KKT, Schur-row formation, line-search merit) is embarrassingly parallel,
the block-tridiagonal SpMV needs a one-knot halo (a collective-permute),
and the PCG dot products and merit sums are all-reduces over ICI.

Design: annotate shardings and let XLA GSPMD insert the collectives
(psum for reductions, collective-permute for the jnp.roll halos) -- the
scaling-book recipe -- rather than hand-writing them.  The solver code in
mpcgpu_tpu.sqp is unchanged; this module only places the data.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

KNOT_AXIS = "knots"


def horizon_mesh(devices=None) -> Mesh:
    """1-D mesh over all (or the given) devices, axis name "knots"."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    return Mesh(devices, (KNOT_AXIS,))


def shard_horizon(mesh: Mesh, *arrays):
    """Place arrays with their leading (knot) axis sharded over the mesh."""
    sh = NamedSharding(mesh, P(KNOT_AXIS))
    return tuple(jax.device_put(a, sh) for a in arrays)


def replicate(mesh: Mesh, *arrays):
    sh = NamedSharding(mesh, P())
    return tuple(jax.device_put(a, sh) for a in arrays)


def _mesh_key(mesh: Mesh):
    """Stable identity of a mesh for backend-name purposes.

    Backend closures capture the mesh at trace time, and sqp_solve is
    jit-cached on (cfg, linsys, avals) -- so a registered name must
    identify THE mesh, or a later call with a different mesh but
    identical shapes would hit the stale trace and run the first mesh's
    collectives.  Encoding the device set + axis layout in the name makes
    the mesh part of the cache key."""
    return (tuple(d.id for d in mesh.devices.flat),
            tuple(mesh.shape.items()))


def sharded_sqp_solve(model, cfg, mesh: Mesh, X, U, lam, goals, xs, rho,
                      pcg_exit_tol, linsys: str = "pcg",
                      explicit_pcg: bool = False, fused_pcg: bool = False):
    """One SQP solve with the horizon sharded across the mesh.

    X, lam, goals shard evenly over the knot axis; U has N-1 rows and is
    padded-sharded by GSPMD.  Collectives (ICI all-reduce for PCG dots and
    merit sums, collective-permute for block-tridiagonal halos) are
    inserted by the partitioner.

    explicit_pcg=True swaps the GSPMD-partitioned PCG for the
    hand-collective shard_map kernel (pcg_sharded: psum dots + ppermute
    halos) behind the standard linsys-backend seam, so the explicit
    communication pattern is reachable from the production solve, not
    just from tests.

    fused_pcg=True goes one further: the per-shard CG compute (banded
    SpMV + stair-preconditioner apply) runs as the production fused
    Pallas kernels with explicit ppermute halos + psum dots between
    kernel steps (parallel/pcg_sharded_pallas) -- the at-scale
    composition of the sharded and fused designs (BASELINE config 5).
    """
    from mpcgpu_tpu.sqp import register_linsys_backend, sqp_solve

    if explicit_pcg and fused_pcg:
        raise ValueError("choose one of explicit_pcg / fused_pcg")
    if explicit_pcg:
        from mpcgpu_tpu.parallel.pcg_sharded import pcg_sharded

        def solve(cfg_, schur, lam_, tol):
            return pcg_sharded(mesh, schur.S, schur.Pinv, schur.gamma, lam_,
                               max_iter=cfg_.pcg.max_iter, exit_tol=tol)

        linsys = f"pcg_sharded{_mesh_key(mesh)!r}"
        register_linsys_backend(linsys, solve)
    elif fused_pcg:
        from mpcgpu_tpu.parallel.pcg_sharded_pallas import pcg_sharded_pallas

        def solve(cfg_, schur, lam_, tol):
            return pcg_sharded_pallas(
                mesh, schur.S, schur.Pinv, schur.gamma, lam_,
                max_iter=cfg_.pcg.max_iter, exit_tol=tol)

        linsys = f"pcg_sharded_pallas{_mesh_key(mesh)!r}"
        register_linsys_backend(linsys, solve)

    X, lam, goals = shard_horizon(mesh, X, lam, goals)
    # U (and the other N-1-row arrays derived from it) have a ragged knot
    # axis; leave placement to GSPMD, which reshards them to follow the
    # sharded operands they combine with.
    U, xs = replicate(mesh, U, xs)
    return sqp_solve(model, cfg, X, U, lam, goals, xs, rho, pcg_exit_tol, linsys)


def simulate_mpc_scan_sharded(model, cfg, mesh: Mesh, xu_traj, ee_traj,
                              X, U, lam, rho, pcg_exit_tol, n_updates: int,
                              linsys: str = "pcg"):
    """The device-resident CLOSED LOOP with the horizon sharded (GSPMD).

    Round-4 completion of the sharded story: sharded_sqp_solve covers a
    single solve, but the production artifact is the loop -- solve ->
    plant rollout -> horizon shift -> measured-state re-injection
    (sim.simulate_mpc_scan, the TPU shape of reference
    include/mpcsim.cuh:286-451).  Here the loop's full carry (X, lam,
    goals) stays knot-sharded across updates: the shift is a one-knot
    jnp.roll (a collective-permute over ICI), the tail refill and
    re-injection touch one shard each, and the trajectories are
    replicated.  XLA GSPMD places all collectives from the input
    shardings; the solver code is unchanged.

    Uses the portable stage path (GSPMD cannot partition a monolithic
    Pallas kernel; the fused-per-shard composition lives in
    parallel/pcg_sharded_pallas via sharded_sqp_solve(fused_pcg=True)).
    """
    import dataclasses

    from mpcgpu_tpu.sim import simulate_mpc_scan

    if cfg.pallas_stages:
        cfg = dataclasses.replace(cfg, pallas_stages=False,
                                  megakernel=False, megakernel_solve=False)
    X, lam = shard_horizon(mesh, X, lam)
    xu_traj, ee_traj, U = replicate(mesh, xu_traj, ee_traj, U)
    return simulate_mpc_scan(model, cfg, xu_traj, ee_traj, X, U, lam, rho,
                             pcg_exit_tol, n_updates, linsys)


# ---------------------------------------------------------------------------
# Arm-parallel scale-out: one (or more) independent arms per chip.
# ---------------------------------------------------------------------------

ARM_AXIS = "arms"


def arms_mesh(devices=None) -> Mesh:
    """1-D mesh over all (or the given) devices, axis name "arms"."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    return Mesh(devices, (ARM_AXIS,))


def simulate_mpc_scan_arms_sharded(model, cfg, mesh: Mesh, xu_traj, ee_traj,
                                   Xb, Ub, lamb, rho, pcg_exit_tol,
                                   n_updates: int, linsys: str = "pcg"):
    """B independent arms, one closed loop per device (shard_map over the
    batch axis) -- the multi-chip throughput configuration.

    One v5e chip is a single TensorCore, so on-chip batching cannot beat
    running the fused single-arm loop back-to-back (measured:
    results/round3/batched_throughput.json); multi-arm scale-out is a
    mesh-level data parallelism with ZERO collectives (each device runs
    the full fused pipeline on its own arms).  B must be a multiple of
    the mesh size; local batches > 1 run sequentially per device via
    lax.map, preserving each arm's full control rate only at local
    batch 1.

    Returns per-arm stats stacked on the leading batch axis, identical
    to vmapped simulate_mpc_scan on one device.
    """
    from mpcgpu_tpu.parallel._compat import shard_map_compat
    from mpcgpu_tpu.sim import simulate_mpc_scan

    ndev = int(np.prod([v for _, v in mesh.shape.items()]))
    B = Xb.shape[0]
    assert B % ndev == 0, (B, ndev)

    def run_local(Xl, Ul, ll):
        def one(args):
            X1, U1, l1 = args
            return simulate_mpc_scan(model, cfg, xu_traj, ee_traj, X1, U1,
                                     l1, rho, pcg_exit_tol, n_updates,
                                     linsys)
        return jax.lax.map(one, (Xl, Ul, ll))

    fn = shard_map_compat(
        run_local, mesh=mesh,
        in_specs=(P(ARM_AXIS), P(ARM_AXIS), P(ARM_AXIS)),
        out_specs=P(ARM_AXIS), check=False)
    return fn(Xb, Ub, lamb)


def simulate_mpc_scan_packed_arms_sharded(model, cfg, mesh: Mesh, xu_traj,
                                          ee_traj, X, U, lam, rho,
                                          pcg_exit_tol, n_updates: int,
                                          batch_per_device: int = 2,
                                          seeds=None):
    """Fleet mode: every device runs one ARM-PACKED closed loop
    (batch_per_device arms sharing its 128-lane width via the packed
    whole-solve megakernel, sim.simulate_mpc_scan_packed), giving
    ndev * batch_per_device arms per mesh with ZERO collectives.  This
    composes the two round-3 multi-arm results: lane-fill packing
    (B*N <= 128 arms per chip for ~the price of one update,
    results/round3/bench_packed_b2/b4n32/b8n16.json) times arm-parallel
    data sharding (one loop per device).

    All groups start from the same nominal (X, U, lam) with per-arm
    start perturbations drawn from a per-device seed (`seeds`: int32
    (ndev,), default arange) -- seed i reproduces an unsharded
    simulate_mpc_scan_packed(..., seed=i) run exactly.

    Returns the packed loop's per-update stats with every leaf carrying
    a leading global arm axis of size ndev * batch_per_device (leaves
    that are per-group in the local loop -- the shift schedule, total
    PCG iterations -- are broadcast over that group's arms).
    """
    from mpcgpu_tpu.parallel._compat import shard_map_compat
    from mpcgpu_tpu.sim import simulate_mpc_scan_packed

    ndev = int(np.prod([v for _, v in mesh.shape.items()]))
    if seeds is None:
        seeds = jnp.arange(ndev, dtype=jnp.int32)
    seeds = jnp.asarray(seeds, jnp.int32).reshape(ndev)
    B = int(batch_per_device)

    def run_local(seed_l):
        out = simulate_mpc_scan_packed(
            model, cfg, xu_traj, ee_traj, X, U, lam, rho, pcg_exit_tol,
            n_updates, batch=B, seed=seed_l[0])
        # normalize: every leaf gets the leading local-arm axis so one
        # P(ARM_AXIS) out_spec concatenates groups into the global axis
        def with_arm_axis(v):
            v = jnp.asarray(v)
            return (v if v.ndim >= 1 and v.shape[0] == B
                    else jnp.broadcast_to(v[None], (B,) + v.shape))
        return jax.tree_util.tree_map(with_arm_axis, out)

    fn = shard_map_compat(
        run_local, mesh=mesh, in_specs=(P(ARM_AXIS),),
        out_specs=P(ARM_AXIS), check=False)
    return fn(seeds)
