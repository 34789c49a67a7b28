"""URDF-converter tests: a new robot through the pluggable model seam
(BASELINE config 4), validated against textbook dynamics."""
import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from urdf_to_params import build_tables, parse_urdf  # noqa: E402

from mpcgpu_tpu.models import dynamics as dyn  # noqa: E402
from mpcgpu_tpu.models.robot import RobotModel  # noqa: E402

PLANAR_2R = """<?xml version="1.0"?>
<robot name="planar2r">
  <link name="base"/>
  <link name="l1">
    <inertial>
      <origin xyz="0.5 0 0"/>
      <mass value="2.0"/>
      <inertia ixx="0.01" iyy="0.2" izz="0.2" ixy="0" ixz="0" iyz="0"/>
    </inertial>
  </link>
  <link name="l2">
    <inertial>
      <origin xyz="0.4 0 0"/>
      <mass value="1.0"/>
      <inertia ixx="0.01" iyy="0.1" izz="0.1" ixy="0" ixz="0" iyz="0"/>
    </inertial>
  </link>
  <joint name="j1" type="revolute">
    <parent link="base"/><child link="l1"/>
    <origin xyz="0 0 0"/><axis xyz="0 0 1"/>
  </joint>
  <joint name="j2" type="revolute">
    <parent link="l1"/><child link="l2"/>
    <origin xyz="1.0 0 0"/><axis xyz="0 0 1"/>
  </joint>
  <link name="ee"/>
  <joint name="ee_fixed" type="fixed">
    <parent link="l2"/><child link="ee"/>
    <origin xyz="1.0 0 0"/>
  </joint>
</robot>
"""

TILTED = PLANAR_2R.replace('<axis xyz="0 0 1"/>', '<axis xyz="0 1 0"/>', 1)


def _model_from_urdf(text, tmp_path, name):
    p = tmp_path / f"{name}.urdf"
    p.write_text(text)
    chain, ee = parse_urdf(str(p))
    t = build_tables(chain, ee)
    f = lambda k: jnp.asarray(np.asarray(t[k]), jnp.float32)
    return RobotModel(
        Xc=f("Xc"), Xs=f("Xs"), Xk=f("Xk"), I=f("I"),
        Hc=f("Hc"), Hs=f("Hs"), Hk=f("Hk"),
        dHc=f("dHc"), dHs=f("dHs"), dHk=f("dHk"),
    )


def test_planar_2r_mass_matrix_textbook(tmp_path):
    m = _model_from_urdf(PLANAR_2R, tmp_path, "planar")
    m1, m2 = 2.0, 1.0
    c1, c2, a1 = 0.5, 0.4, 1.0
    I1, I2 = 0.2, 0.1
    rng = np.random.default_rng(0)
    for _ in range(4):
        q = rng.uniform(-2, 2, 2).astype(np.float32)
        M = np.asarray(dyn.mass_matrix(m, jnp.asarray(q)))
        c = np.cos(q[1])
        M11 = I1 + I2 + m1 * c1**2 + m2 * (a1**2 + c2**2 + 2 * a1 * c2 * c)
        M12 = I2 + m2 * (c2**2 + a1 * c2 * c)
        M22 = I2 + m2 * c2**2
        np.testing.assert_allclose(
            M, [[M11, M12], [M12, M22]], rtol=1e-4, atol=1e-4
        )


def test_planar_2r_fk(tmp_path):
    m = _model_from_urdf(PLANAR_2R, tmp_path, "planar")
    q = jnp.asarray([0.3, -0.7], jnp.float32)
    ee = np.asarray(dyn.ee_pos(m, q))
    x = np.cos(0.3) + np.cos(0.3 - 0.7)
    y = np.sin(0.3) + np.sin(0.3 - 0.7)
    np.testing.assert_allclose(ee[:2], [x, y], atol=1e-5)


def test_tilted_axis_consistency(tmp_path):
    """Non-z joint axis: frame rotation must preserve all the dynamics
    invariants (ABA == CRBA, RNEA roundtrip, Lagrangian bias)."""
    m = _model_from_urdf(TILTED, tmp_path, "tilted")
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.uniform(-1, 1, 2), jnp.float32)
    qd = jnp.asarray(rng.uniform(-1, 1, 2), jnp.float32)
    u = jnp.asarray(rng.uniform(-5, 5, 2), jnp.float32)
    qdd = dyn.forward_dynamics(m, q, qd, u)
    np.testing.assert_allclose(
        np.asarray(qdd), np.asarray(dyn.forward_dynamics_crba(m, q, qd, u)),
        rtol=1e-3, atol=1e-3,
    )
    tau = dyn.rnea(m, q, qd, qdd)
    np.testing.assert_allclose(np.asarray(tau), np.asarray(u), rtol=1e-3,
                               atol=1e-3)
    # FK: joint 1 rotates about world y
    ee0 = np.asarray(dyn.ee_pos(m, jnp.zeros(2)))
    ee1 = np.asarray(dyn.ee_pos(m, jnp.asarray([np.pi / 2, 0.0], jnp.float32)))
    np.testing.assert_allclose(ee0[:3], [2.0, 0, 0], atol=1e-5)
    np.testing.assert_allclose(ee1[:3], [0, 0, -2.0], atol=1e-5)


def test_sqp_solver_on_urdf_robot(tmp_path):
    """BASELINE config 4 end-to-end: a URDF-loaded robot drives the same
    SQP solver; from rest, the solve must pull the EE toward a reachable
    goal."""
    import jax

    from mpcgpu_tpu.config import CostConfig, PCGConfig, SolverConfig
    from mpcgpu_tpu.sqp import sqp_solve

    m = _model_from_urdf(PLANAR_2R, tmp_path, "planar_sqp")
    n, nx, nu = 16, 4, 2
    cfg = SolverConfig(
        knot_points=n, state_size=nx, control_size=nu, timestep=0.05,
        sqp_max_iter=10, pcg=PCGConfig(max_iter=200),
        cost=CostConfig(qd_cost=1e-3, r_cost=1e-4),
    )
    X = jnp.zeros((n, nx), jnp.float32)          # at rest, arm along +x
    U = jnp.zeros((n - 1, nu), jnp.float32)
    lam = jnp.zeros((n, nx), jnp.float32)
    goal = jnp.asarray([1.2, 1.2, 0.0, 0, 0, 0], jnp.float32)
    goals = jnp.tile(goal[None], (n, 1))
    xs = X[0]

    res = sqp_solve(m, cfg, X, U, lam, goals, xs, 1e-3, 1e-8)
    from mpcgpu_tpu.models import dynamics as dyn

    ee0 = np.asarray(dyn.ee_pos(m, X[-1, :2]))[:2]
    ee1 = np.asarray(dyn.ee_pos(m, res.X[-1, :2]))[:2]
    d0 = np.linalg.norm(ee0 - np.asarray(goal[:2]))
    d1 = np.linalg.norm(ee1 - np.asarray(goal[:2]))
    assert d1 < 0.6 * d0, (d0, d1)
    assert bool(res.stats.accepted.any())
