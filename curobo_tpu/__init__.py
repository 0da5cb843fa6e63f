"""curobo-tpu: TPU-native motion generation, IK, trajectory optimization,
MPC and perception — a from-scratch JAX/XLA/Pallas framework with the
capabilities of NVlabs/curobo (see SURVEY.md for the parity map).

Public API mirrors the reference's facade modules
(`curobo/__init__.py:1-64`): kinematics, inverse_kinematics,
trajectory_optimizer, motion_planner, model_predictive_control, scene,
collision_checking, perception, types, runtime.
"""

__version__ = "0.1.0"

import jax as _jax

# Full-f32 matmuls everywhere: TPU's default matmul precision rounds f32
# operands to bfloat16 on the MXU. This framework's matmuls are tiny
# (3x3 rotation composition, spline basis application, pair-difference
# one-hots) and accuracy-critical — measured: bf16 basis einsums inflate
# the B-spline jerk readout 2.4x (large third-derivative basis entries,
# heavy cancellation), and mm-scale pose/self-collision accuracy loses
# ~0.4 % of operand magnitude. The hot kernels are VPU-bound, so the
# 3-pass f32 MXU cost is noise here.
_jax.config.update("jax_default_matmul_precision", "highest")

# Types
from curobo_tpu.types.pose import Pose
from curobo_tpu.types.state import JointState, RobotState

# Robot model
from curobo_tpu.robot.kinematics import Kinematics, KinematicsState, compute_kinematics
from curobo_tpu.robot.model import RobotModelConfig, build_kinematics_params
from curobo_tpu.robot.params import KinematicsParams, JointLimits
from curobo_tpu.robot.dynamics import Dynamics, compute_inverse_dynamics
from curobo_tpu.robot.debugger import RobotDebugger, RobotReport

# Geometry / world
from curobo_tpu.geom.types import (
    Scene,
    Cuboid,
    SphereObstacle,
    Capsule,
    Cylinder,
    MeshObstacle,
    VoxelGridObstacle,
)
from curobo_tpu.geom.world import WorldData, compile_scene, empty_world

# Solvers
from curobo_tpu.solver.ik import IKConfig, IKResult, IKSolver
from curobo_tpu.solver.trajopt import TrajOptConfig, TrajOptResult, TrajOptSolver
from curobo_tpu.solver.mpc import MPCConfig, MPCResult, MPCSolver, MPCState

# Planning
from curobo_tpu.motion.batch_planner import BatchMotionPlanner
from curobo_tpu.motion.planner import MotionPlanConfig, MotionPlanner, MotionPlanResult
from curobo_tpu.graph.prm import PRMConfig, PRMGraphPlanner

# Collision convenience
from curobo_tpu.collision.robot_scene import AttachmentManager, RobotSceneCollision

# Rollout / goal
from curobo_tpu.rollout.robot_rollout import Goal, RobotRollout, RobotRolloutConfig
from curobo_tpu.rollout.rosenbrock import RosenbrockConfig, RosenbrockRollout

# Optimizer escape hatch + profiling facade (reference `curobo/optim.py`,
# `curobo/profiling.py`)
from curobo_tpu.opt.external import (
    ScipyOptConfig,
    TorchOptConfig,
    scipy_optimize,
    torch_optimize,
)
from curobo_tpu import profiling

# Perception
from curobo_tpu.perception.mapper import Mapper, MapperConfig
from curobo_tpu.perception.block_sparse import BlockSparseConfig, BlockSparseMapper
from curobo_tpu.perception.segmenter import FilterDepth, RobotSegmenter
from curobo_tpu.perception.types import CameraObservation, LidarObservation

import os as _os


def content_path(*parts: str) -> str:
    """Path helper into the bundled content package (robot/task configs).

    Parity: reference `get_robot_configs_path` etc. (`content/__init__.py`).
    """
    return _os.path.join(_os.path.dirname(__file__), "content", *parts)


def robot_config_path(name: str) -> str:
    if not name.endswith(".yml"):
        name = name + ".yml"
    return content_path("robots", name)
