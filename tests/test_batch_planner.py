"""Batch planner bucketing + grasp planning tests."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from curobo_tpu.geom import types as gt
from curobo_tpu.geom import world as wm
from curobo_tpu.motion.batch_planner import BatchMotionPlanner
from curobo_tpu.motion.planner import MotionPlanConfig, MotionPlanner
from curobo_tpu.opt.lbfgs import LBFGSConfig
from curobo_tpu.robot.kinematics import Kinematics, compute_kinematics
from curobo_tpu.solver.ik import IKConfig
from curobo_tpu.solver.trajopt import TrajOptConfig
from curobo_tpu.types.pose import Pose
from curobo_tpu.types.state import JointState

CONTENT = os.path.join(os.path.dirname(__file__), "..", "curobo_tpu", "content", "robots")


@pytest.fixture(scope="module")
def kin():
    return Kinematics.from_robot_yaml(os.path.join(CONTENT, "franka.yml"))


@pytest.fixture(scope="module")
def world():
    return wm.compile_scene(
        gt.Scene().add(
            gt.Cuboid(name="table", pose=[0.4, 0.0, -0.1, 1, 0, 0, 0], dims=[1.2, 1.2, 0.2])
        )
    )


FAST = MotionPlanConfig(
    ik=IKConfig(n_seeds=8),
    trajopt=TrajOptConfig(
        n_seeds=2, lbfgs=LBFGSConfig(history=10, n_iters=30, max_step=0.5),
        finetune_attempts=0,
    ),
    n_trajopt_seeds=2,
    max_attempts=1,
)


def make_goals(kin, n, seed=0):
    rng = np.random.RandomState(seed)
    lo = np.asarray(kin.params.joint_limits.lower)
    hi = np.asarray(kin.params.joint_limits.upper)
    span = hi - lo
    q = jnp.asarray(rng.uniform(lo + 0.25 * span, hi - 0.25 * span, (n, 7)), dtype=jnp.float32)
    st = compute_kinematics(kin.params, q)
    return Pose(st.tool_pose.position[:, 0], st.tool_pose.quaternion[:, 0])


class TestBatchPlanner:
    def test_bucketing(self, kin, world):
        planner = BatchMotionPlanner(kin.params, FAST, max_batch_size=2)
        B = 5  # 3 buckets of 2 (last padded)
        goals = make_goals(kin, B)
        start = JointState.from_position(
            jnp.broadcast_to(kin.params.retract_config, (B, 7)), kin.params.joint_names
        )
        res = planner.plan_pose(world, goals, start)
        assert res.success.shape == (B,)
        assert res.trajectory.position.shape[0] == B
        assert res.solver_trajectory.position.shape[0] == B


class TestGraspPlanner:
    def test_plan_grasp(self, kin, world):
        planner = MotionPlanner(kin.params, FAST)
        goals = make_goals(kin, 2, seed=3)
        start = JointState.from_position(
            jnp.broadcast_to(kin.params.retract_config, (2, 7)), kin.params.joint_names
        )
        approach, grasp_traj, success = planner.plan_grasp(world, goals, start)
        assert grasp_traj.position.shape == (2, 12, 7)
        # the grasp segment ends at the grasp pose (for successful problems)
        ok = np.asarray(success)
        if ok.any():
            st = compute_kinematics(kin.params, grasp_traj.position[:, -1])
            err = np.linalg.norm(
                np.asarray(st.tool_pose.position[:, 0] - goals.position), axis=-1
            )
            assert np.all(err[ok] < 0.01)
