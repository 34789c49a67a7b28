"""Trajectory fixture IO.

Loads the reference's recorded IIWA trajectories
(reference examples/trajfiles/: ``{start}_{goal}_traj.csv`` with rows of
14 state + 7 control values, ``{start}_{goal}_eepos.traj`` with rows of 6
end-effector pose values; loader semantics of ``readCSVToVecVec``,
reference include/utils/experiment.cuh:145-170).
"""
from __future__ import annotations

from pathlib import Path

import numpy as np

NX, NU = 14, 7


def load_traj(path) -> np.ndarray:
    return np.loadtxt(path, delimiter=",", dtype=np.float32)


def load_fixture_pair(directory, start: int, goal: int, model=None):
    """Returns (xu (T, 21), eepos (T, 6)) float32 arrays.

    The reference ships a recorded end-effector trace only for the (0, 0)
    pair (which is why its drivers break after the first combination,
    reference examples/track_iiwa_pcg.cu:177).  For other pairs, pass a
    RobotModel and the trace is synthesized by running the recorded states
    through forward kinematics -- exactly how the recorded trace was made
    (validated to f32 precision in tests/test_dynamics.py).
    """
    d = Path(directory)
    xu = load_traj(d / f"{start}_{goal}_traj.csv")
    assert xu.shape[1] == NX + NU
    ee_path = d / f"{start}_{goal}_eepos.traj"
    if ee_path.exists():
        ee = load_traj(ee_path)
        assert ee.shape[1] == 6
        return xu, ee
    if model is None:
        raise FileNotFoundError(
            f"{ee_path} missing; pass a RobotModel to synthesize it via FK"
        )
    import jax
    import jax.numpy as jnp

    from mpcgpu_tpu.models import dynamics as dyn

    ee = jax.jit(jax.vmap(lambda q: dyn.ee_pos(model, q)))(
        jnp.asarray(xu[:, : NX // 2])
    )
    return xu, np.asarray(ee, np.float32)


def horizon_slices(xu: np.ndarray, ee: np.ndarray, knot_points: int,
                   nx: int = NX):
    """Initial (X, U, goals, xs) for an N-knot horizon at the traj start.

    nx: state width of the xu rows (default the IIWA's 14; pass 2*nq for
    other robots -- the rows are [q, qd, u])."""
    X = xu[:knot_points, :nx].copy()
    U = xu[:knot_points - 1, nx:].copy()
    goals = ee[:knot_points].copy()
    return X, U, goals, X[0].copy()
