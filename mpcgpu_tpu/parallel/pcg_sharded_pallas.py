"""Horizon-sharded PCG with per-shard fused Pallas kernels.

The at-scale composition of the two production designs (BASELINE config
5, SURVEY.md section 2.3): the block-tridiagonal Schur system's knot axis
is sharded over a 1-D TPU mesh, and each CG iteration runs

  * the banded SpMV and the stair-preconditioner apply as the SAME
    lane-layout Pallas kernel the single-chip fused solver uses
    (ops/pallas/pcg_kernel._band_spmv math), one kernel per shard, with
    the shard's blocks VMEM-resident -- this is the per-device compute;
  * a one-row ``ppermute`` halo exchange with each neighbor before the
    SpMV (the multi-chip analogue of the reference's cooperative-groups
    grid sync between block rows, reference include/pcg/sqp.cuh:275);
  * ``psum`` all-reduces over ICI for the two CG dot products (the
    reference's per-block reduction slots d_v_temp / d_eta_new_temp,
    include/pcg/sqp.cuh:137-166).

Registered as a linsys backend by parallel/sharded.py (fused_pcg=True),
so the production SQP loop reaches it through the standard pluggable
seam.  At N=512 over 8 devices each shard holds 64 lanes -- a single
(8, 128) Mosaic tile, inside the hardware-verified envelope of the
single-chip kernel.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import Mesh, PartitionSpec as P

from mpcgpu_tpu.ops.btridiag import BlockTri

AXIS = "knots"


def _spmv_halo_kernel(sl_ref, sd_ref, su_ref, x_ref, xl_ref, xr_ref, y_ref):
    """Lane-layout banded SpMV over one shard with external halo columns.

    y[:, k] = L_k x_{k-1} + D_k x_k + U_k x_{k+1}, where x_{-1} comes
    from the left neighbor's last column (xl) and x_{nl} from the right
    neighbor's first column (xr); the global edges pass zeros.  Same FMA
    structure as the single-chip kernel (pcg_kernel._band_spmv_lead):
    bands arrive pre-transposed to (j, i, nl) so each band element is a
    leading-dim slab pick (middle-dim extracts pay a Mosaic relayout per
    use -- results/round3/cg_probe_n512.json), with the wrapped roll
    columns replaced by the halos.
    """
    L, D, U = sl_ref[:], sd_ref[:], su_ref[:],
    x = x_ref[:]
    s, n = x.shape
    dtype = x.dtype
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    first = (lane == 0).astype(dtype)
    last = (lane == n - 1).astype(dtype)

    xm = pltpu.roll(x, 1, axis=1) * (1.0 - first) + xl_ref[:] * first
    xp = pltpu.roll(x, n - 1, axis=1) * (1.0 - last) + xr_ref[:] * last

    acc = D[0] * x[0:1, :]
    for j in range(1, s):
        acc = acc + D[j] * x[j:j + 1, :]
    for j in range(s):
        acc = acc + L[j] * xm[j:j + 1, :]
        acc = acc + U[j] * xp[j:j + 1, :]
    y_ref[:] = acc


def _spmv_halo_pallas(L, D, U, x, xl, xr, interpret: bool):
    s, n = x.shape
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _spmv_halo_kernel,
        out_shape=jax.ShapeDtypeStruct((s, n), x.dtype),
        in_specs=[vmem] * 6,
        out_specs=vmem,
        interpret=interpret,
    )(L, D, U, x, xl, xr)


def _halo_cols(x):
    """Per-shard (s, nl) -> (x_left (s,1), x_right (s,1)) via ppermute.

    Each device sends its edge columns to its neighbors; the global edges
    receive zeros (matching the zero edge blocks of S and Pinv)."""
    n_dev = jax.lax.axis_size(AXIS)
    idx = jax.lax.axis_index(AXIS)
    fwd = [(i, (i + 1) % n_dev) for i in range(n_dev)]
    bwd = [(i, (i - 1) % n_dev) for i in range(n_dev)]
    from_left = jax.lax.ppermute(x[:, -1:], AXIS, fwd)
    from_right = jax.lax.ppermute(x[:, :1], AXIS, bwd)
    from_left = jnp.where(idx == 0, 0.0, from_left)
    from_right = jnp.where(idx == n_dev - 1, 0.0, from_right)
    return from_left, from_right


def _pdot(a, b):
    return jax.lax.psum(jnp.sum(a * b), AXIS)


def _pcg_shard_fused(max_iter: int, interpret: bool, exit_tol,
                     sl, sd, su, pl_, pd_, pu_, gamma, lam0):
    """Per-device body: inputs in knot-major shard layout (nl, s, s) /
    (nl, s); transposed locally to the lead lane layout (j, i, nl) the
    kernels use."""
    to_lane = lambda b: jnp.transpose(b, (2, 1, 0))
    vec = lambda v: jnp.transpose(v, (1, 0))
    SL, SD, SU = to_lane(sl), to_lane(sd), to_lane(su)
    PL, PD, PU = to_lane(pl_), to_lane(pd_), to_lane(pu_)
    g, l0 = vec(gamma), vec(lam0)

    def spmv_S(x):
        xl, xr = _halo_cols(x)
        return _spmv_halo_pallas(SL, SD, SU, x, xl, xr, interpret)

    def spmv_P(x):
        xl, xr = _halo_cols(x)
        return _spmv_halo_pallas(PL, PD, PU, x, xl, xr, interpret)

    r0 = g - spmv_S(l0)
    rt0 = spmv_P(r0)
    eta0 = _pdot(r0, rt0)

    def cond(c):
        _, _, _, eta, i = c
        return jnp.logical_and(i < max_iter, jnp.abs(eta) > exit_tol)

    def body(c):
        lam, r, p, eta, i = c
        ups = spmv_S(p)
        alpha = eta / _pdot(p, ups)
        lam = lam + alpha * p
        r = r - alpha * ups
        rt = spmv_P(r)
        eta_new = _pdot(r, rt)
        p = rt + (eta_new / eta) * p
        return lam, r, p, eta_new, i + 1

    lam, _, _, eta, iters = jax.lax.while_loop(
        cond, body, (l0, r0, rt0, eta0, jnp.int32(0))
    )
    return vec(lam), iters, jnp.abs(eta) > exit_tol


@functools.partial(jax.jit, static_argnames=("mesh", "max_iter", "interpret"))
def pcg_sharded_pallas(mesh: Mesh, S: BlockTri, Pinv: BlockTri, gamma, lam0,
                       max_iter: int, exit_tol, interpret: bool = None):
    """Solve S lam = gamma with the knot axis sharded over mesh axis
    "knots", the per-shard compute in fused Pallas kernels, and explicit
    ICI collectives between CG stages.

    Returns (lam (N, s), iters, hit_max) like ops.pcg.pcg.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    from mpcgpu_tpu.parallel._compat import shard_map_compat

    spec_b = P(AXIS, None, None)
    spec_v = P(AXIS, None)

    fn = shard_map_compat(
        functools.partial(_pcg_shard_fused, max_iter, bool(interpret)),
        mesh=mesh,
        in_specs=(P(),) + (spec_b,) * 6 + (spec_v,) * 2,
        out_specs=(spec_v, P(), P()),
        # pallas_call outputs carry no varying-mesh-axes annotation;
        # skip the replication check (the specs state the sharding).
        check=False,
    )
    lam, iters, hit = fn(
        jnp.asarray(exit_tol, gamma.dtype),
        S.lower, S.diag, S.upper, Pinv.lower, Pinv.diag, Pinv.upper,
        gamma, lam0,
    )
    return lam, iters, hit
