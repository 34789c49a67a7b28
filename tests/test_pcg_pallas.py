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
