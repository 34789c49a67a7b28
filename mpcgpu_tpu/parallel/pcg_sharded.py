"""Horizon-sharded PCG with explicit ICI collectives.

The long-horizon scaling configuration (BASELINE.json config 5): the knot
axis of the block-tridiagonal system is sharded across a 1-D TPU mesh and
the PCG loop runs under ``shard_map`` with hand-placed collectives --

  * the banded SpMV's k+-1 halo is a one-knot ``ppermute`` exchange with
    each neighbor (the multi-chip analogue of the reference's
    cooperative-groups grid sync between block rows, SURVEY.md section 2.3);
  * the two dot products per CG iteration are ``psum`` all-reduces over
    the ICI ring (the reference's per-block reduction slots d_v_temp /
    d_eta_new_temp, include/pcg/sqp.cuh:137-138).

This is the explicit-collective twin of parallel/sharded.py (which lets
GSPMD place the same collectives automatically); having both makes the
communication pattern auditable and tunable.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mpcgpu_tpu.ops.btridiag import BlockTri

AXIS = "knots"


def _halo_shifted(x):
    """Per-shard (nl, s) -> (x_{k-1}, x_{k+1}) rows using neighbor exchange.

    Each device sends its edge rows to its neighbors with ppermute; the
    global edges receive zeros (matching the zero edge blocks of S).
    """
    n_dev = jax.lax.axis_size(AXIS)
    idx = jax.lax.axis_index(AXIS)
    # receive my left neighbor's LAST row into my halo_front
    fwd = [(i, (i + 1) % n_dev) for i in range(n_dev)]
    bwd = [(i, (i - 1) % n_dev) for i in range(n_dev)]
    from_left = jax.lax.ppermute(x[-1], AXIS, fwd)     # row x_{k-1} for k = first
    from_right = jax.lax.ppermute(x[0], AXIS, bwd)     # row x_{k+1} for k = last
    from_left = jnp.where(idx == 0, 0.0, from_left)
    from_right = jnp.where(idx == n_dev - 1, 0.0, from_right)

    x_prev = jnp.concatenate([from_left[None], x[:-1]], axis=0)
    x_next = jnp.concatenate([x[1:], from_right[None]], axis=0)
    return x_prev, x_next


def _spmv_local(lower, diag, upper, x):
    x_prev, x_next = _halo_shifted(x)
    return (
        jnp.einsum("kij,kj->ki", diag, x)
        + jnp.einsum("kij,kj->ki", lower, x_prev)
        + jnp.einsum("kij,kj->ki", upper, x_next)
    )


def _pdot(a, b):
    return jax.lax.psum(jnp.vdot(a, b), AXIS)


def _pcg_shard(max_iter: int, exit_tol, sl, sd, su, pl_, pd_, pu_, gamma, lam0):
    r0 = gamma - _spmv_local(sl, sd, su, lam0)
    rt0 = _spmv_local(pl_, pd_, pu_, r0)
    eta0 = _pdot(r0, rt0)

    def cond(c):
        _, _, _, eta, i = c
        return jnp.logical_and(i < max_iter, jnp.abs(eta) > exit_tol)

    def body(c):
        lam, r, p, eta, i = c
        ups = _spmv_local(sl, sd, su, p)
        alpha = eta / _pdot(p, ups)
        lam = lam + alpha * p
        r = r - alpha * ups
        rt = _spmv_local(pl_, pd_, pu_, r)
        eta_new = _pdot(r, rt)
        p = rt + (eta_new / eta) * p
        return lam, r, p, eta_new, i + 1

    lam, _, _, eta, iters = jax.lax.while_loop(
        cond, body, (lam0, r0, rt0, eta0, jnp.int32(0))
    )
    return lam, iters, jnp.abs(eta) > exit_tol


@partial(jax.jit, static_argnames=("mesh", "max_iter"))
def pcg_sharded(mesh: Mesh, S: BlockTri, Pinv: BlockTri, gamma, lam0,
                max_iter: int, exit_tol):
    """Solve S lam = gamma with the knot axis sharded over mesh axis "knots".

    Returns (lam, iters, hit_max) like ops.pcg.pcg.
    """
    from mpcgpu_tpu.parallel._compat import shard_map_compat

    spec_b = P(AXIS, None, None)
    spec_v = P(AXIS, None)

    fn = shard_map_compat(
        partial(_pcg_shard, max_iter),
        mesh=mesh,
        in_specs=(P(),) + (spec_b,) * 6 + (spec_v,) * 2,
        out_specs=(spec_v, P(), P()),
    )
    lam, iters, hit = fn(
        jnp.asarray(exit_tol, gamma.dtype),
        S.lower, S.diag, S.upper, Pinv.lower, Pinv.diag, Pinv.upper,
        gamma, lam0,
    )
    return lam, iters, hit
