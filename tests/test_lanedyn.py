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


def test_rnea_lane_dtau_units_matches_jvp(iiwa):
    """The shared-primal unit-direction tangent routine (round 5, the
    KKT stage's dominant-cost cut) must reproduce per-direction
    rnea_lane_jvp calls exactly (same math, zero-term skipping only)."""
    import jax

    from mpcgpu_tpu.ops.pallas import lanedyn as ld

    rng = np.random.default_rng(7)
    B = 9
    nj = 7
    q = jnp.asarray(rng.uniform(-1, 1, (nj, B)), jnp.float32)
    qd = jnp.asarray(rng.uniform(-1, 1, (nj, B)), jnp.float32)
    qdd = jnp.asarray(rng.uniform(-2, 2, (nj, B)), jnp.float32)
    xt = (iiwa.Xc, iiwa.Xs, iiwa.Xk)

    cols = ld.rnea_lane_dtau_units(xt, iiwa.I, q, qd, qdd)
    assert len(cols) == 2 * nj
    for d in range(2 * nj):
        e = np.zeros((nj, 1), np.float32)
        e[d % nj] = 1.0
        ej = jnp.asarray(np.broadcast_to(e, (nj, B)))
        tq = ej * (1.0 if d < nj else 0.0)
        tqd = ej * (0.0 if d < nj else 1.0)
        _, dtau_ref = ld.rnea_lane_jvp(xt, iiwa.I, q, qd, qdd, tq, tqd)
        np.testing.assert_allclose(
            np.asarray(cols[d]), np.asarray(dtau_ref), rtol=1e-5,
            atol=1e-5, err_msg=f"direction {d}")


def test_rnea_lane_dtau_units_gravity_planar2r():
    """Non-default joint count (nj=2) + gravity path."""
    import jax

    from mpcgpu_tpu.models.planar2r import planar2r
    from mpcgpu_tpu.ops.pallas import lanedyn as ld

    m = planar2r()
    rng = np.random.default_rng(11)
    B = 5
    q = jnp.asarray(rng.uniform(-1, 1, (2, B)), jnp.float32)
    qd = jnp.asarray(rng.uniform(-1, 1, (2, B)), jnp.float32)
    qdd = jnp.asarray(rng.uniform(-2, 2, (2, B)), jnp.float32)
    xt = (m.Xc, m.Xs, m.Xk)

    cols = ld.rnea_lane_dtau_units(xt, m.I, q, qd, qdd, gravity=-9.81)
    for d in range(4):
        e = np.zeros((2, 1), np.float32)
        e[d % 2] = 1.0
        ej = jnp.asarray(np.broadcast_to(e, (2, B)))
        tq = ej * (1.0 if d < 2 else 0.0)
        tqd = ej * (0.0 if d < 2 else 1.0)
        _, dtau_ref = ld.rnea_lane_jvp(xt, m.I, q, qd, qdd, tq, tqd,
                                       gravity=-9.81)
        np.testing.assert_allclose(
            np.asarray(cols[d]), np.asarray(dtau_ref), rtol=1e-5,
            atol=1e-5, err_msg=f"direction {d}")
