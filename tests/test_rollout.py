"""Cost-term and rollout tests on Franka."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from curobo_tpu.cost import terms
from curobo_tpu.geom import types as gt
from curobo_tpu.geom import world as wm
from curobo_tpu.robot.kinematics import Kinematics, compute_kinematics
from curobo_tpu.rollout.robot_rollout import Goal, RobotRollout, RobotRolloutConfig
from curobo_tpu.types.pose import Pose
from curobo_tpu.types.state import JointState

CONTENT = os.path.join(os.path.dirname(__file__), "..", "curobo_tpu", "content", "robots")


@pytest.fixture(scope="module")
def kin():
    return Kinematics.from_robot_yaml(os.path.join(CONTENT, "franka.yml"))


@pytest.fixture(scope="module")
def world():
    scene = gt.Scene().add(
        gt.Cuboid(name="table", pose=[0.5, 0.0, -0.05, 1, 0, 0, 0], dims=[1.0, 1.0, 0.1])
    )
    return wm.compile_scene(scene)


class TestPoseError:
    def test_zero_at_goal(self):
        pos = jnp.asarray([[0.5, 0.0, 0.5]])[:, None, :]  # (B=1, T=1, 3)
        quat = jnp.asarray([[1.0, 0, 0, 0]])[:, None, :]
        c, pe, re = terms.pose_error(pos, quat, pos[:, None], quat[:, None])
        assert float(c[0]) < 1e-10
        assert float(pe[0]) < 1e-6
        assert float(re[0]) < 1e-3

    def test_goalset_argmin(self):
        pos = jnp.asarray([[[0.5, 0.0, 0.5]]])  # (1, 1, 3)
        quat = jnp.asarray([[[1.0, 0, 0, 0]]])
        goals = jnp.asarray([[[[2.0, 0, 0]], [[0.5, 0.0, 0.52]]]])  # (1, G=2, 1, 3)
        gq = jnp.broadcast_to(quat[:, None], (1, 2, 1, 4))
        c, pe, re = terms.pose_error(pos, quat, goals, gq)
        np.testing.assert_allclose(float(pe[0]), 0.02, atol=1e-5)

    def test_position_errors_metric(self):
        pos = jnp.asarray([[[0.5, 0.0, 0.5]]])
        quat = jnp.asarray([[[1.0, 0, 0, 0]]])
        gp = jnp.asarray([[[[0.5, 0.0, 0.53]]]])
        c, pe, re = terms.pose_error(pos, quat, gp, quat[:, None])
        np.testing.assert_allclose(float(pe[0]), 0.03, atol=1e-6)


class TestBoundCost:
    def test_zero_inside(self, kin):
        lim = kin.params.joint_limits
        cfg = terms.BoundCostConfig(weight=100.0)
        q = kin.params.retract_config
        assert float(terms.bound_cost(q, lim, cfg)) == 0.0
        assert not bool(terms.bound_violation(q, lim))

    def test_penalty_outside(self, kin):
        lim = kin.params.joint_limits
        cfg = terms.BoundCostConfig(weight=100.0)
        q = lim.upper + 0.1
        c = float(terms.bound_cost(q, lim, cfg))
        np.testing.assert_allclose(c, 100.0 * 7 * 0.01, rtol=1e-4)
        assert bool(terms.bound_violation(q, lim))


class TestSweptCollision:
    def test_catches_tunneling(self, world):
        # A sphere jumping across the thin table between steps: discrete cost
        # at the endpoints misses it, swept cost must catch it.
        cfg = terms.CollisionCostConfig(weight=1.0, activation_distance=0.0, sweep_steps=8)
        traj = jnp.asarray(
            [[[0.5, 0.0, 0.4, 0.05]], [[0.5, 0.0, -0.5, 0.05]]]
        )  # (H=2, S=1, 4)
        disc = terms.scene_collision_cost(world, traj, cfg)
        swept = terms.swept_scene_collision_cost(world, traj, cfg)
        assert float(jnp.sum(disc)) == 0.0  # endpoints clear (0.4 above, -0.5 below)
        assert float(jnp.sum(swept)) > 0.0  # interpolation passes through the slab


class TestRobotRollout:
    def test_ik_objective_zero_at_solution(self, kin, world):
        # FK of a feasible config is by construction the optimum of its own
        # pose objective.
        q0 = kin.params.retract_config
        state = compute_kinematics(kin.params, q0)
        goal = Goal.from_pose(
            Pose(state.tool_pose.position[0][None], state.tool_pose.quaternion[0][None])
        )
        rollout = RobotRollout(kin.params, RobotRolloutConfig())
        res = rollout.evaluate_config(world, goal, q0[None])
        assert float(res.pos_err[0]) < 1e-5
        assert bool(res.feasible[0])
        assert bool(res.converged(0.005, 0.05)[0])

    def test_ik_objective_gradient(self, kin, world):
        q0 = kin.params.retract_config
        state = compute_kinematics(kin.params, q0)
        goal = Goal.from_pose(
            Pose(state.tool_pose.position[0][None], state.tool_pose.quaternion[0][None])
        )
        rollout = RobotRollout(kin.params, RobotRolloutConfig())

        def f(q):
            return jnp.sum(rollout.evaluate_config(world, goal, q).cost)

        q = q0[None] + 0.1
        g = jax.grad(f)(q)
        assert np.isfinite(np.asarray(g)).all()
        # Gradient step should reduce cost.
        c0 = float(f(q))
        c1 = float(f(q - 1e-4 * g))
        assert c1 < c0

    def test_trajectory_objective(self, kin, world):
        B, H, D = 3, 8, 7
        q0 = kin.params.retract_config
        state = compute_kinematics(kin.params, q0)
        goal = Goal.from_pose(
            Pose(
                jnp.broadcast_to(state.tool_pose.position[0], (B, 3)),
                jnp.broadcast_to(state.tool_pose.quaternion[0], (B, 4)),
            )
        )
        traj = JointState.from_position(
            jnp.broadcast_to(q0, (B, H, D)) + 0.0
        )
        rollout = RobotRollout(kin.params, RobotRolloutConfig(velocity_weight=1.0))
        res = rollout.evaluate_trajectory(world, goal, traj)
        assert res.cost.shape == (B,)
        assert bool(jnp.all(res.feasible))
        assert float(jnp.max(res.pos_err)) < 1e-5

    def test_collision_flagged(self, kin, world):
        # Drive the arm into the table: feasibility must flip.
        q_down = jnp.asarray([0.0, 1.4, 0.0, -1.2, 0.0, 2.0, 0.0])
        state = compute_kinematics(kin.params, q_down)
        goal = Goal.from_pose(
            Pose(state.tool_pose.position[0][None], state.tool_pose.quaternion[0][None])
        )
        rollout = RobotRollout(kin.params, RobotRolloutConfig())
        res = rollout.evaluate_config(world, goal, q_down[None])
        # tool z at this config:
        z = float(state.tool_pose.position[0, 2])
        if z < 0.05:  # expected to dip near/below the table surface
            assert bool(res.in_collision[0])

    def test_seed_axis_broadcast(self, kin, world):
        B, S = 4, 8
        q = jnp.broadcast_to(kin.params.retract_config, (B, S, 7))
        state = compute_kinematics(kin.params, kin.params.retract_config)
        goal = Goal.from_pose(
            Pose(
                jnp.broadcast_to(state.tool_pose.position[0], (B, 3)),
                jnp.broadcast_to(state.tool_pose.quaternion[0], (B, 4)),
            )
        ).tile_seeds(S)
        rollout = RobotRollout(kin.params, RobotRolloutConfig())
        res = rollout.evaluate_config(world, goal, q)
        assert res.cost.shape == (B, S)
