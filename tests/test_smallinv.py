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
