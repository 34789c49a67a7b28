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


def load_fixture_pair(directory, start: int, goal: int):
    """Returns (xu (T, 21), eepos (T, 6)) float32 arrays."""
    d = Path(directory)
    xu = load_traj(d / f"{start}_{goal}_traj.csv")
    ee = load_traj(d / f"{start}_{goal}_eepos.traj")
    assert xu.shape[1] == NX + NU and ee.shape[1] == 6
    return xu, ee


def horizon_slices(xu: np.ndarray, ee: np.ndarray, knot_points: int):
    """Initial (X, U, goals, xs) for an N-knot horizon at the traj start."""
    X = xu[:knot_points, :NX].copy()
    U = xu[:knot_points - 1, NX:].copy()
    goals = ee[:knot_points].copy()
    return X, U, goals, X[0].copy()
