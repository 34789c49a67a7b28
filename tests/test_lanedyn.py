"""Lane-batched dynamics vs the reference implementations."""
import jax
import jax.numpy as jnp
import numpy as np

from mpcgpu_tpu.models import dynamics as dyn
from mpcgpu_tpu.ops.pallas import lanedyn


def test_lane_aba_and_fk_match(iiwa):
    rng = np.random.default_rng(0)
    B = 33
    q = rng.uniform(-2, 2, (7, B)).astype(np.float32)
    qd = rng.uniform(-1, 1, (7, B)).astype(np.float32)
    u = rng.uniform(-10, 10, (7, B)).astype(np.float32)

    qdd = lanedyn.aba_qdd(
        (iiwa.Xc, iiwa.Xs, iiwa.Xk), iiwa.I,
        jnp.asarray(q), jnp.asarray(qd), jnp.asarray(u),
    )
    ref = jax.vmap(
        lambda a, b, c: dyn.forward_dynamics(iiwa, a, b, c),
        in_axes=-1, out_axes=-1,
    )(jnp.asarray(q), jnp.asarray(qd), jnp.asarray(u))
    np.testing.assert_allclose(np.asarray(qdd), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)

    ee = lanedyn.fk_ee_xyz((iiwa.Hc, iiwa.Hs, iiwa.Hk), jnp.asarray(q))
    ee_ref = jax.vmap(lambda a: dyn.ee_pos(iiwa, a)[:3],
                      in_axes=-1, out_axes=-1)(jnp.asarray(q))
    np.testing.assert_allclose(np.asarray(ee), np.asarray(ee_ref),
                               rtol=1e-4, atol=1e-5)


def test_rnea_lane_jvp_matches_autodiff(iiwa):
    import jax

    from mpcgpu_tpu.ops.pallas import lanedyn as ld

    rng = np.random.default_rng(3)
    B = 9
    q = jnp.asarray(rng.uniform(-1, 1, (7, B)), jnp.float32)
    qd = jnp.asarray(rng.uniform(-1, 1, (7, B)), jnp.float32)
    qdd = jnp.asarray(rng.uniform(-2, 2, (7, B)), jnp.float32)
    tq = jnp.asarray(rng.normal(size=(7, B)), jnp.float32)
    tqd = jnp.asarray(rng.normal(size=(7, B)), jnp.float32)
    xt = (iiwa.Xc, iiwa.Xs, iiwa.Xk)

    tau, dtau = ld.rnea_lane_jvp(xt, iiwa.I, q, qd, qdd, tq, tqd)
    tau_ref, dtau_ref = jax.jvp(
        lambda a, b: ld.rnea_lane(xt, iiwa.I, a, b, qdd), (q, qd), (tq, tqd)
    )
    np.testing.assert_allclose(np.asarray(tau), np.asarray(tau_ref),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dtau), np.asarray(dtau_ref),
                               rtol=2e-3, atol=2e-3)
