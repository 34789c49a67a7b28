"""Planar 2R demo robot: the second-robot pluggability witness.

A two-revolute-joint planar arm (unit links, textbook inertias) loaded
through the URDF seam (models/urdf.py).  Exists so the FULL framework --
portable solver, fused lane kernels, whole-solve megakernel, the closed
MPC loop, and the hardware kernel regression -- can be exercised with
nq != 7, demonstrating the pluggable-plant promise end-to-end
(reference include/dynamics/rbd_plant.cuh:1-5 stops at the plant adapter
seam; its only instantiation is the generated IIWA).  The dynamics of
this model are validated against textbook closed forms in
tests/test_urdf.py.
"""
from __future__ import annotations

PLANAR_2R_URDF = """<?xml version="1.0"?>
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


def planar2r(dtype=None):
    """RobotModel for the planar 2R arm (nq=2, nx=4, nu=2)."""
    from mpcgpu_tpu.models.urdf import model_from_urdf

    return model_from_urdf(PLANAR_2R_URDF, dtype)
