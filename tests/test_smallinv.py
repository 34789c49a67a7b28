"""Block-recursive SPD inverse vs numpy."""
import jax.numpy as jnp
import numpy as np

from mpcgpu_tpu.ops.smallinv import spd_inverse


def test_spd_inverse_sizes():
    rng = np.random.default_rng(0)
    for n in [1, 2, 3, 4, 5, 7, 8, 14]:
        M = rng.normal(size=(32, n, n)).astype(np.float32)
        A = np.einsum("kij,klj->kil", M, M) + 0.5 * np.eye(n, dtype=np.float32)
        Ai = np.asarray(spd_inverse(jnp.asarray(A)))
        err = np.abs(Ai @ A - np.eye(n)).max()
        assert err < 5e-3, (n, err)


def test_joint_space_cost_derivatives():
    import jax
    from mpcgpu_tpu.ops.cost import (joint_space_gradient_and_hessian,
                                     joint_space_knot_cost)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=14), jnp.float32)
    u = jnp.asarray(rng.normal(size=7), jnp.float32)
    xr = jnp.asarray(rng.normal(size=14), jnp.float32)
    f = lambda xx, uu: joint_space_knot_cost(0.1, 1e-4, 1e-4, xx, uu, xr, 1.0)
    Q, g, R, r = joint_space_gradient_and_hessian(0.1, 1e-4, 1e-4, x, u, xr)
    np.testing.assert_allclose(np.asarray(g), np.asarray(jax.grad(f, 0)(x, u)),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(r), np.asarray(jax.grad(f, 1)(x, u)),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(Q),
                               np.asarray(jax.hessian(f, 0)(x, u)), atol=1e-5)


def test_pcg_vmem_fit_check():
    import pytest
    from mpcgpu_tpu.ops.pallas.pcg_kernel import check_pcg_vmem_fit

    assert check_pcg_vmem_fit(512, 14) < 12 * 2**20
    with pytest.raises(ValueError):
        check_pcg_vmem_fit(8192, 14)
