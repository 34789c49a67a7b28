from mpcgpu_tpu.models.robot import RobotModel, iiwa14
