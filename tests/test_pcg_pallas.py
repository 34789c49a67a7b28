"""Fused Pallas PCG kernel vs the portable while_loop implementation
(interpret mode on CPU; real-hardware timing lives in bench/experiments)."""
import jax.numpy as jnp
import numpy as np

from mpcgpu_tpu.ops import btridiag
from mpcgpu_tpu.ops.pallas.pcg_kernel import pcg_pallas
from mpcgpu_tpu.ops.pcg import pcg
from mpcgpu_tpu.ops.schur import form_schur
from tests.test_schur_pcg import N, NX, RHO, random_kkt


def test_pallas_pcg_matches_reference_impl():
    kkt = random_kkt(seed=11)
    sd = form_schur(kkt, RHO)
    lam0 = jnp.zeros((N, NX), jnp.float32)

    ref = pcg(sd.S, sd.Pinv, sd.gamma, lam0, max_iter=300, exit_tol=1e-9)
    lam, iters, hit = pcg_pallas(
        sd.S, sd.Pinv, sd.gamma, lam0, 300, 1e-9, interpret=True
    )
    dense = np.asarray(btridiag.to_dense(sd.S), np.float64)
    x_ref = np.linalg.solve(dense, np.asarray(sd.gamma, np.float64).reshape(-1))
    np.testing.assert_allclose(
        np.asarray(lam).reshape(-1), x_ref, rtol=5e-3, atol=5e-3
    )
    assert not bool(hit)
    # same algorithm, same arithmetic order up to layout: iteration counts
    # should be in the same ballpark
    assert abs(int(iters) - int(ref.iters)) <= 3, (int(iters), int(ref.iters))


def test_pallas_pcg_warm_start():
    kkt = random_kkt(seed=12)
    sd = form_schur(kkt, RHO)
    lam0 = jnp.zeros((N, NX), jnp.float32)
    lam1, _, _ = pcg_pallas(sd.S, sd.Pinv, sd.gamma, lam0, 300, 1e-9,
                            interpret=True)
    # warm restart from the solution must exit almost immediately
    _, iters2, hit2 = pcg_pallas(sd.S, sd.Pinv, sd.gamma, lam1, 300, 1e-9,
                                 interpret=True)
    assert int(iters2) <= 3
    assert not bool(hit2)


def _lanes(sd):
    to_lane = lambda b: jnp.transpose(b, (1, 2, 0))
    return (to_lane(sd.S.lower), to_lane(sd.S.diag), to_lane(sd.S.upper),
            to_lane(sd.Pinv.lower), to_lane(sd.Pinv.diag),
            to_lane(sd.Pinv.upper))


def test_chunked_exit_matches_when_cap_bound():
    """check_every > 1 must be bit-identical to per-iteration exit when
    the solve is cap-bound (tol never reached) -- the flagship's regime."""
    from mpcgpu_tpu.ops.pallas.pcg_kernel import pcg_pallas_lanes

    kkt = random_kkt(seed=13)
    sd = form_schur(kkt, RHO)
    bands = _lanes(sd)
    g = sd.gamma.T
    lam0 = jnp.zeros_like(g)
    lam1, it1, hit1 = pcg_pallas_lanes(*bands, g, lam0, 40, 0.0,
                                       interpret=True)
    lam8, it8, hit8 = pcg_pallas_lanes(*bands, g, lam0, 40, 0.0,
                                       interpret=True, check_every=8)
    np.testing.assert_array_equal(np.asarray(lam1), np.asarray(lam8))
    assert int(it1) == int(it8) == 40
    assert bool(hit1) and bool(hit8)


def test_chunked_exit_converges_no_worse():
    """With a reachable tolerance, chunked exit stops at a multiple of the
    chunk and its extra iterations only reduce the residual."""
    from mpcgpu_tpu.ops.btridiag import spmv
    from mpcgpu_tpu.ops.pallas.pcg_kernel import pcg_pallas_lanes

    kkt = random_kkt(seed=14)
    sd = form_schur(kkt, RHO)
    bands = _lanes(sd)
    g = sd.gamma.T
    lam0 = jnp.zeros_like(g)
    lam1, it1, _ = pcg_pallas_lanes(*bands, g, lam0, 304, 1e-7,
                                    interpret=True)
    lam8, it8, _ = pcg_pallas_lanes(*bands, g, lam0, 304, 1e-7,
                                    interpret=True, check_every=8)
    assert int(it8) % 8 == 0
    assert int(it8) >= int(it1) - 7

    def resid(lam_l):
        r = sd.gamma - spmv(sd.S, jnp.transpose(lam_l, (1, 0)))
        return float(jnp.linalg.norm(r))

    assert resid(lam8) <= resid(lam1) * 1.05 + 1e-6


def test_lead_layout_bit_identical():
    """The (j, i, N) lead band layout (the TPU fast path, default) must
    be bit-identical to the original (i, j, N) layout: _band_spmv_lead
    keeps _band_spmv's accumulation order, only the band memory layout
    differs (results/round3/cg_probe_n512.json for the why)."""
    from mpcgpu_tpu.ops.pallas.pcg_kernel import pcg_pallas_lanes

    kkt = random_kkt(seed=15)
    sd = form_schur(kkt, RHO)
    bands = _lanes(sd)
    g = sd.gamma.T
    lam0 = jnp.zeros_like(g)
    lam_lead, it_lead, _ = pcg_pallas_lanes(*bands, g, lam0, 40, 0.0,
                                            interpret=True, lead=True)
    lam_base, it_base, _ = pcg_pallas_lanes(*bands, g, lam0, 40, 0.0,
                                            interpret=True, lead=False)
    np.testing.assert_array_equal(np.asarray(lam_lead), np.asarray(lam_base))
    assert int(it_lead) == int(it_base) == 40
