"""Fused single-kernel PCG: the entire solve VMEM-resident.

TPU counterpart of the reference's flagship design point -- GBD-PCG runs
the whole preconditioned CG loop in ONE persistent cooperative CUDA kernel
with grid syncs between stages (reference include/pcg/sqp.cuh:275,
SURVEY.md C20).  Here the whole loop runs in one Pallas kernel: the banded
system S, the stair preconditioner Pinv, and all CG vectors live in VMEM
for the entire solve (N=512 horizon: 2 * 3 * 512 * 14 * 14 * 4 B ~= 2.4 MB,
comfortably inside the ~16 MB VMEM), so each iteration touches no HBM at
all.

Layout: the knot axis lives in the 128-wide lane dimension and the
14-wide state axis in sublanes -- band blocks are (s, s, N), vectors
(s, N).  The block-tridiagonal SpMV is then s fused multiply-adds of
(s, N) tiles per band, with the k+-1 halo realized as a lane roll; the
zero edge blocks (lower[0], upper[N-1]) make circular wrap-around
contributions vanish, so no masking is needed.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mpcgpu_tpu.ops.btridiag import BlockTri


def _band_spmv(L, D, U, x):
    """y[:, k] = L_k x_{k-1} + D_k x_k + U_k x_{k+1} in (s, N) lane layout.

    Per band: one fused (s, s, N) elementwise product + a sublane-direction
    reduction over the contraction axis (Mosaic rejects concatenating the
    rolled operands, so the three bands reduce separately).  Halos are lane
    rolls; the zero edge blocks absorb the circular wrap-around.
    """
    n = x.shape[1]
    s = x.shape[0]
    xm = pltpu.roll(x, 1, axis=1)      # x_{k-1} into lane k (wraps; L[0] = 0)
    xp = pltpu.roll(x, n - 1, axis=1)  # x_{k+1} into lane k (wraps; U[N-1] = 0)
    # 3s fused multiply-adds of (s, N) tiles; the broadcast/sublane-reduce
    # formulation trips Mosaic relayout bugs on hardware, so stay explicit.
    acc = D[:, 0, :] * x[0:1, :]
    for j in range(1, s):
        acc = acc + D[:, j, :] * x[j:j + 1, :]
    for j in range(s):
        acc = acc + L[:, j, :] * xm[j:j + 1, :]
        acc = acc + U[:, j, :] * xp[j:j + 1, :]
    return acc


def _band_spmv_lead(Lt, Dt, Ut, x):
    """_band_spmv with bands pre-transposed to (j, i, N).

    Each band element is then a LEADING-dim slab pick ``Dt[j]`` instead
    of the middle(sublane)-dim extract ``D[:, j, :]`` -- those extracts
    each pay a Mosaic relayout inside the loop, which dominated CG cost
    at multi-tile lane widths (results/round3/cg_probe_n512.json: 5.37
    -> 0.71 us/CG-iteration at N=512; 1.39 -> 0.98 at N=64).  The
    accumulation order matches _band_spmv exactly, so results are
    bit-identical; only the band memory layout differs.
    """
    n = x.shape[1]
    s = x.shape[0]
    xm = pltpu.roll(x, 1, axis=1)      # x_{k-1} into lane k (wraps; L[0] = 0)
    xp = pltpu.roll(x, n - 1, axis=1)  # x_{k+1} into lane k (wraps; U[N-1] = 0)
    acc = Dt[0] * x[0:1, :]
    for j in range(1, s):
        acc = acc + Dt[j] * x[j:j + 1, :]
    for j in range(s):
        acc = acc + Lt[j] * xm[j:j + 1, :]
        acc = acc + Ut[j] * xp[j:j + 1, :]
    return acc


def _dot(a, b):
    """<a, b> over (s, N) tiles as sublane-reduce -> lane row-sum.

    Staging the reduction (sum over the 14-row sublane axis with
    keepdims, then a full sum of the single remaining row) measures
    ~2x faster in-kernel than the one-shot jnp.sum(a * b)
    (results/round3/cg_probe_n64.json: full_lead 0.98 -> full_lead2
    0.57 us/CG-iteration; n512: 0.71 -> 0.53).  Reduction order
    differs from jnp.sum(a * b) only in float associativity.
    """
    return jnp.sum(jnp.sum(a * b, axis=0, keepdims=True))


def _pcg_loop(SL, SD, SU, PL, PD, PU, gamma, lam0, max_iter, tol,
              check_every: int = 1, spmv=None):
    """The CG loop itself, callable from any kernel that has the banded
    system + preconditioner in registers/VMEM (the PCG kernel below and
    the whole-iteration megakernel's polish stage).

    check_every > 1 evaluates the exit tolerance only every that many
    iterations (inner fori_loop, outer while_loop): the flagship runs at
    iteration caps it hits almost every solve, so the per-iteration
    dynamic exit check is nearly pure loop overhead.  Chunked exit may
    run up to check_every - 1 extra CG iterations past the tolerance
    crossing (extra iterations only reduce the residual further); the
    effective cap rounds down to a multiple of check_every.

    spmv selects the band-SpMV layout: _band_spmv for (i, j, N) bands
    (default), _band_spmv_lead for (j, i, N) bands.

    Returns (lam, iters, eta)."""
    spmv = spmv or _band_spmv
    r0 = gamma - spmv(SL, SD, SU, lam0)
    rt0 = spmv(PL, PD, PU, r0)
    eta0 = _dot(r0, rt0)

    def step(carry):
        lam, r, p, eta, i = carry
        ups = spmv(SL, SD, SU, p)
        alpha = eta / _dot(p, ups)
        lam = lam + alpha * p
        r = r - alpha * ups
        rt = spmv(PL, PD, PU, r)
        eta_new = _dot(r, rt)
        p = rt + (eta_new / eta) * p
        return lam, r, p, eta_new, i + 1

    if check_every <= 1:
        def cond(carry):
            _, _, _, eta, i = carry
            return jnp.logical_and(i < max_iter, jnp.abs(eta) > tol)

        body = step
    else:
        def cond(carry):
            _, _, _, eta, i = carry
            return jnp.logical_and(i + check_every <= max_iter,
                                   jnp.abs(eta) > tol)

        def body(carry):
            return jax.lax.fori_loop(0, check_every, lambda _, c: step(c),
                                     carry)

    lam, r, p, eta, iters = jax.lax.while_loop(
        cond, body, (lam0, r0, rt0, eta0, jnp.int32(0))
    )
    return lam, iters, eta


def _pcg_kernel(s: int, check_every: int, lead: bool, max_iter_ref, tol_ref,
                sl_ref, sd_ref, su_ref, pl_ref, pd_ref, pu_ref,
                gamma_ref, lam0_ref,
                lam_out_ref, iters_ref, hit_ref):
    lam, iters, eta = _pcg_loop(
        sl_ref[:], sd_ref[:], su_ref[:], pl_ref[:], pd_ref[:], pu_ref[:],
        gamma_ref[:], lam0_ref[:], max_iter_ref[0], tol_ref[0],
        check_every, spmv=_band_spmv_lead if lead else _band_spmv)
    lam_out_ref[:] = lam
    iters_ref[0] = iters
    hit_ref[0] = (jnp.abs(eta) > tol_ref[0]).astype(jnp.int32)


def _lead_bands(*bands):
    """(i, j, N) -> (j, i, N), done by XLA between kernel dispatches.

    A leading-dims swap of ~2.4 MB (N=512) costs a few us of HBM
    bandwidth once per solve; the lead layout then saves that per CG
    ITERATION (see _band_spmv_lead)."""
    return tuple(jnp.swapaxes(b, 0, 1) for b in bands)


@functools.partial(jax.jit,
                   static_argnames=("interpret", "check_every", "lead"))
def pcg_pallas_lanes(SL, SD, SU, PL, PD, PU, gamma_l, lam0_l, max_iter,
                     exit_tol, interpret: bool = None,
                     check_every: int = 1, lead: bool = True):
    """Lane-layout entry: bands (s,s,N), vectors (s,N) -- no transposes.

    Feeds directly from the fused KKT+Schur kernel's outputs.
    Returns (lam (s,N), iters, hit_max).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    s, n = gamma_l.shape
    f32 = gamma_l.dtype
    if lead:
        SL, SD, SU, PL, PD, PU = _lead_bands(SL, SD, SU, PL, PD, PU)
    smem_scalar = pl.BlockSpec(memory_space=pltpu.SMEM)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    lam_t, iters, hit = pl.pallas_call(
        functools.partial(_pcg_kernel, s, check_every, lead),
        out_shape=(
            jax.ShapeDtypeStruct((s, n), f32),
            jax.ShapeDtypeStruct((1,), jnp.int32),
            jax.ShapeDtypeStruct((1,), jnp.int32),
        ),
        in_specs=[smem_scalar, smem_scalar] + [vmem] * 8,
        out_specs=(vmem, smem_scalar, smem_scalar),
        interpret=interpret,
    )(
        jnp.asarray(max_iter, jnp.int32).reshape(1),
        jnp.asarray(exit_tol, f32).reshape(1),
        SL, SD, SU, PL, PD, PU, gamma_l, lam0_l,
    )
    return lam_t, iters[0], iters_hit_bool(hit)


@functools.partial(jax.jit, static_argnames=("max_iter_cap", "interpret"))
def pcg_pallas(S: BlockTri, Pinv: BlockTri, gamma, lam0, max_iter, exit_tol,
               max_iter_cap: int = 0, interpret: bool = False):
    """Solve S lam = gamma fully inside one Pallas kernel.

    Returns (lam (N, s), iters int32, hit_max bool) like ops.pcg.pcg.
    """
    to_lane = lambda b: jnp.transpose(b, (1, 2, 0))  # (N,s,s) -> (s,s,N)
    vec = lambda v: jnp.transpose(v, (1, 0))         # (N,s)   -> (s,N)
    lam_t, iters, hit = pcg_pallas_lanes(
        to_lane(S.lower), to_lane(S.diag), to_lane(S.upper),
        to_lane(Pinv.lower), to_lane(Pinv.diag), to_lane(Pinv.upper),
        vec(gamma), vec(lam0), max_iter, exit_tol, interpret=interpret,
    )
    return jnp.transpose(lam_t, (1, 0)), iters, hit


def iters_hit_bool(hit):
    return hit[0].astype(bool)


def register_backend(interpret: bool = None):
    """Register the fused kernel as the 'pcg_pallas' linsys backend."""
    from mpcgpu_tpu.sqp import register_linsys_backend

    def solve(cfg, schur, lam, pcg_exit_tol):
        itp = (jax.default_backend() != "tpu") if interpret is None else interpret
        lam_new, iters, hit = pcg_pallas(
            schur.S, schur.Pinv, schur.gamma, lam,
            cfg.pcg.max_iter, pcg_exit_tol, interpret=itp,
        )
        return lam_new, iters, hit

    register_linsys_backend("pcg_pallas", solve)


register_backend()


def check_pcg_vmem_fit(knot_points: int, state_size: int,
                       vmem_budget_bytes: int = 12 * 2**20,
                       dtype_bytes: int = 4) -> int:
    """VMEM-residency check for the fused PCG kernel.

    Analogue of the reference's cooperative-launch occupancy precheck
    (``checkPcgOccupancy``, called at reference examples/track_iiwa_pcg.cu:24):
    the fused kernel needs the six band tensors plus ~6 CG vectors live in
    VMEM; raise before launching a configuration that cannot fit.
    Returns the estimated byte footprint.
    """
    bands = 6 * knot_points * state_size * state_size * dtype_bytes
    vectors = 6 * knot_points * state_size * dtype_bytes
    need = bands + vectors
    if need > vmem_budget_bytes:
        raise ValueError(
            f"fused PCG working set {need/2**20:.1f} MiB exceeds the "
            f"{vmem_budget_bytes/2**20:.1f} MiB VMEM budget at "
            f"N={knot_points}, s={state_size}; shard the horizon "
            f"(parallel/pcg_sharded) or use the while_loop backend"
        )
    return need


def _pcg_dz_kernel(s: int, nu: int, check_every: int, lead: bool,
                   max_iter_ref, tol_ref,
                   sl_ref, sd_ref, su_ref, pl_ref, pd_ref, pu_ref,
                   gamma_ref, lam0_ref,
                   a_ref, b_ref, qg_ref, rg_ref, qinv_ref, rinv_ref,
                   lam_out_ref, dx_out_ref, du_out_ref, iters_ref, hit_ref):
    """PCG solve + primal recovery fused: saves the separate dz stage.

    dz math identical to ops/dz.py (lane layout; see
    kkt_schur_kernel.compute_dz_lanes)."""
    from mpcgpu_tpu.ops.pallas import lanedyn as ld

    _pcg_kernel(s, check_every, lead, max_iter_ref, tol_ref, sl_ref, sd_ref,
                su_ref, pl_ref, pd_ref, pu_ref, gamma_ref, lam0_ref,
                lam_out_ref, iters_ref, hit_ref)
    lam = lam_out_ref[:]
    n = lam.shape[1]
    k = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    m_last = (k < n - 1).astype(lam.dtype)
    lam_next = pltpu.roll(lam, n - 1, axis=1) * m_last

    A = a_ref[:]
    B = b_ref[:]
    At_lam = ld.lane_matvec_T(A, lam_next) * m_last
    rhs_x = qg_ref[:] - lam + At_lam
    dx_out_ref[:] = -ld.lane_matvec(qinv_ref[:], rhs_x)
    Bt_lam = ld.lane_matvec_T(B, lam_next)
    du_out_ref[:] = -ld.lane_matvec(rinv_ref[:], rg_ref[:] + Bt_lam)


@functools.partial(jax.jit,
                   static_argnames=("interpret", "check_every", "lead"))
def pcg_dz_pallas_lanes(ls, lam0_l, max_iter, exit_tol,
                        interpret: bool = None, check_every: int = 1,
                        lead: bool = True):
    """Fused PCG + primal recovery from a LaneSchur system.

    Returns (lam (s,N), dX (N,s), dU (N-1,nu), iters, hit_max).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    s, n = ls.gamma.shape
    nu = ls.Rinv.shape[0]
    f32 = ls.gamma.dtype
    SL, SD, SU = ls.SL, ls.SD, ls.SU
    PL, PD, PU = ls.PL, ls.PD, ls.PU
    if lead:
        SL, SD, SU, PL, PD, PU = _lead_bands(SL, SD, SU, PL, PD, PU)
    smem_scalar = pl.BlockSpec(memory_space=pltpu.SMEM)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    lam_t, dx_t, du_t, iters, hit = pl.pallas_call(
        functools.partial(_pcg_dz_kernel, s, nu, check_every, lead),
        out_shape=(
            jax.ShapeDtypeStruct((s, n), f32),
            jax.ShapeDtypeStruct((s, n), f32),
            jax.ShapeDtypeStruct((nu, n), f32),
            jax.ShapeDtypeStruct((1,), jnp.int32),
            jax.ShapeDtypeStruct((1,), jnp.int32),
        ),
        in_specs=[smem_scalar, smem_scalar] + [vmem] * 14,
        out_specs=(vmem, vmem, vmem, smem_scalar, smem_scalar),
        interpret=interpret,
    )(
        jnp.asarray(max_iter, jnp.int32).reshape(1),
        jnp.asarray(exit_tol, f32).reshape(1),
        SL, SD, SU, PL, PD, PU, ls.gamma, lam0_l,
        ls.A, ls.B, ls.q, ls.r, ls.Qinv, ls.Rinv,
    )
    return lam_t, dx_t.T, du_t.T[:-1], iters[0], iters_hit_bool(hit)
