"""Fused rollout kernel vs the XLA substep loop."""
import jax.numpy as jnp
import numpy as np

from mpcgpu_tpu.config import SolverConfig
from mpcgpu_tpu.ops.pallas.rollout_kernel import plant_rollout_pallas
from mpcgpu_tpu.sim import _plant_rollout, _tracking_error


def test_rollout_kernel_matches_xla(iiwa, traj_0_0):
    xu, ee = traj_0_0
    cfg = SolverConfig.for_knots(16)
    xs = jnp.asarray(xu[0, :14])
    U_prev = jnp.asarray(xu[:15, 14:])
    goal0 = jnp.asarray(ee[0])

    for offset, simt in [(0.0, 2000.0), (2000.0, 2000.0), (1500.0, 700.0)]:
        x_ref = _plant_rollout(iiwa, cfg, xs, U_prev,
                               jnp.asarray(offset, jnp.float32),
                               jnp.asarray(simt, jnp.float32), 11)
        e_ref = _tracking_error(iiwa, x_ref, goal0)
        x_got, e_got = plant_rollout_pallas(
            iiwa, xs, U_prev, goal0, offset, simt,
            cfg.timestep, cfg.sim_step_time, 11, interpret=True,
        )
        np.testing.assert_allclose(np.asarray(x_got), np.asarray(x_ref),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(float(e_got), float(e_ref),
                                   rtol=1e-4, atol=1e-5)
