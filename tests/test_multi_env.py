"""Multi-environment world routing tests (SolveMode.MULTI_ENV analog)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from curobo_tpu.geom import types as gt
from curobo_tpu.geom import world as wm
from curobo_tpu.robot.kinematics import Kinematics, compute_kinematics
from curobo_tpu.rollout.robot_rollout import Goal, RobotRollout, RobotRolloutConfig
from curobo_tpu.types.pose import Pose

CONTENT = os.path.join(os.path.dirname(__file__), "..", "curobo_tpu", "content", "robots")


@pytest.fixture(scope="module")
def kin():
    return Kinematics.from_robot_yaml(os.path.join(CONTENT, "franka.yml"))


def test_env_routing(kin):
    caps = {"cuboid": 2}
    # env 0: table only; env 1: table + wall through the workspace
    w0 = wm.compile_scene(
        gt.Scene().add(
            gt.Cuboid(name="table", pose=[0.4, 0, -0.1, 1, 0, 0, 0], dims=[1.2, 1.2, 0.2])
        ),
        capacities=caps,
    )
    w1 = wm.compile_scene(
        gt.Scene().add(
            gt.Cuboid(name="table", pose=[0.4, 0, -0.1, 1, 0, 0, 0], dims=[1.2, 1.2, 0.2]),
            gt.Cuboid(name="wall", pose=[0.1, 0.0, 0.5, 1, 0, 0, 0], dims=[0.12, 1.0, 1.0]),
        ),
        capacities=caps,
    )
    worlds = wm.stack_worlds([w0, w1])

    rollout = RobotRollout(kin.params, RobotRolloutConfig())
    q0 = kin.params.retract_config
    st = compute_kinematics(kin.params, q0)
    B = 4
    goal = Goal.from_pose(
        Pose(
            jnp.broadcast_to(st.tool_pose.position[0], (B, 3)),
            jnp.broadcast_to(st.tool_pose.quaternion[0], (B, 4)),
        )
    )
    q = jnp.broadcast_to(q0, (B, 7))
    env_idx = jnp.asarray([0, 1, 0, 1], dtype=jnp.int32)

    res = rollout.evaluate_config_env(worlds, env_idx, goal, q)
    # same config: env-0 problems clear, env-1 problems collide with the wall
    r = np.asarray(res.in_collision)
    assert not r[0] and not r[2]
    assert r[1] and r[3]

    # jit-compatible
    f = jax.jit(lambda ei: rollout.evaluate_config_env(worlds, ei, goal, q).cost)
    c = f(env_idx)
    assert float(c[1]) > float(c[0])


def test_stack_mismatched_capacities_raises(kin):
    w0 = wm.compile_scene(gt.Scene().add(
        gt.Cuboid(name="a", pose=[0, 0, 0, 1, 0, 0, 0], dims=[0.1, 0.1, 0.1])))
    w1 = wm.compile_scene(gt.Scene())
    with pytest.raises(ValueError):
        wm.stack_worlds([w0, w1])
