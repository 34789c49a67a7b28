"""Robot model container: the pluggable "plant" seam.

The reference makes the robot pluggable behind ``gato_plant::`` /
``grid::robotModel`` (reference include/dynamics/rbd_plant.cuh:1-5,
README.md:26): a machine-generated header bakes in the kinematic and
inertial parameters.  Here the same data lives in a pytree of arrays, so a
new robot is a new parameter file (see tools/extract_grid_model.py, which
converts any GRiD-generated header into one) -- no code changes.

Model assumptions (assert-checked at load): serial kinematic chain, all
joints revolute about the local z axis (motion subspace S = e_z in the
angular slot), spatial vectors ordered [angular; linear].
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class RobotModel(NamedTuple):
    """Exact affine-in-(sin q, cos q) decomposition of the joint transforms.

    X_i(q_i)  = Xc[i] + sin(q_i) Xs[i] + cos(q_i) Xk[i]   (6x6 spatial motion,
                child <- parent, Featherstone convention)
    H_i(q_i)  = Hc[i] + sin(q_i) Hs[i] + cos(q_i) Hk[i]   (4x4 homogeneous,
                child pose in parent frame)
    dH_i      = d H_i / d q_i, same decomposition.
    I[i]      : 6x6 spatial inertia of link i in its own frame.
    """

    Xc: jnp.ndarray   # (nj, 6, 6)
    Xs: jnp.ndarray
    Xk: jnp.ndarray
    I: jnp.ndarray    # (nj, 6, 6)
    Hc: jnp.ndarray   # (nj, 4, 4)
    Hs: jnp.ndarray
    Hk: jnp.ndarray
    dHc: jnp.ndarray  # (nj, 4, 4)
    dHs: jnp.ndarray
    dHk: jnp.ndarray

    @property
    def num_joints(self) -> int:
        return self.Xc.shape[0]


def _from_params(p, dtype) -> RobotModel:
    f = lambda a: jnp.asarray(np.asarray(a), dtype=dtype)
    return RobotModel(
        Xc=f(p.Xc), Xs=f(p.Xs), Xk=f(p.Xk), I=f(p.I),
        Hc=f(p.Hc), Hs=f(p.Hs), Hk=f(p.Hk),
        dHc=f(p.dHc), dHs=f(p.dHs), dHk=f(p.dHk),
    )


def iiwa14(dtype=jnp.float32) -> RobotModel:
    """The Kuka IIWA-14 7-DOF arm (the reference's model zoo entry,
    reference include/dynamics/iiwa/iiwa_eepos_grid.cuh)."""
    from mpcgpu_tpu.models import iiwa14_params

    return _from_params(iiwa14_params, dtype)
