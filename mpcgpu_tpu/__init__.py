"""mpcgpu_tpu: TPU-native real-time nonlinear MPC via SQP + preconditioned CG.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of MPCGPU
(ICRA 2024, "MPCGPU: Real-Time Nonlinear MPC through Preconditioned
Conjugate Gradient on the GPU"; reference tree at Mo0dy/MPCGPU):

  * SQP trajectory optimizer over a horizon of N knot points
    (reference include/pcg/sqp.cuh) -- here a single jitted function.
  * Block-tridiagonal Schur-complement KKT condensation with a
    symmetric-stair preconditioner (reference include/pcg/linsys_setup.cuh).
  * GBD-PCG solver: entire preconditioned CG loop on-device
    (reference GBD-PCG submodule) -- here a lax.while_loop and a fused
    Pallas kernel that keeps the banded system VMEM-resident.
  * Rigid-body dynamics with analytical gradients for the Kuka IIWA-14
    (reference GRiD-generated include/dynamics/iiwa/*) -- here vectorized
    Featherstone algorithms over extracted model parameters.
  * A host-side LDL' oracle backend behind the same linsys interface
    (reference qdldl submodule).
  * The closed-loop MPC simulation harness (reference include/mpcsim.cuh).
"""

from mpcgpu_tpu.config import SolverConfig, CostConfig, PCGConfig
from mpcgpu_tpu.models.robot import RobotModel, iiwa14

__version__ = "0.1.0"
