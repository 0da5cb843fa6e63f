"""End-to-end motion planner tests (reference pattern:
`curobo/tests/_src/motion/test_motion_planner*.py`)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from curobo_tpu.geom import types as gt
from curobo_tpu.geom import world as wm
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
            gt.Cuboid(name="table", pose=[0.4, 0.0, -0.1, 1, 0, 0, 0], dims=[1.2, 1.2, 0.2]),
            gt.Cuboid(name="pillar", pose=[0.45, 0.35, 0.4, 1, 0, 0, 0], dims=[0.1, 0.1, 0.8]),
        )
    )


@pytest.fixture(scope="module")
def planner(kin):
    cfg = MotionPlanConfig(
        ik=IKConfig(n_seeds=12),
        trajopt=TrajOptConfig(
            n_seeds=2,
            lbfgs=LBFGSConfig(history=12, n_iters=50, max_step=0.5),
            finetune_attempts=1,
        ),
        n_trajopt_seeds=2,
        max_attempts=1,
    )
    return MotionPlanner(kin.params, cfg)


class TestMotionPlanner:
    def test_plan_pose(self, kin, world, planner):
        B = 2
        rng = np.random.RandomState(0)
        lo = np.asarray(kin.params.joint_limits.lower)
        hi = np.asarray(kin.params.joint_limits.upper)
        span = hi - lo
        q_goal = jnp.asarray(
            rng.uniform(lo + 0.25 * span, hi - 0.25 * span, (B, 7)), dtype=jnp.float32
        )
        st = compute_kinematics(kin.params, q_goal)
        goals = Pose(st.tool_pose.position[:, 0], st.tool_pose.quaternion[:, 0])
        start = JointState.from_position(
            jnp.broadcast_to(kin.params.retract_config, (B, 7)), kin.params.joint_names
        )
        res = planner.plan_pose(world, goals, start)
        assert res.trajectory.position.shape[0] == B
        # at least one problem should plan successfully end-to-end
        assert int(jnp.sum(res.ik_success)) >= 1
        ok = np.asarray(res.success)
        if ok.any():
            # successful plans: start pinned, goal reached
            np.testing.assert_allclose(
                np.asarray(res.solver_trajectory.position[ok][:, 0]),
                np.asarray(start.position)[ok],
                atol=1e-3,
            )
            assert np.all(np.asarray(res.position_error)[ok] < 0.01)
            assert np.all(np.asarray(res.motion_time)[ok] > 0.1)

    def test_graph_escalation_beats_linear_seeds(self, kin):
        """Narrow-passage planner-level escalation: a wall world where a
        straight-line-seeded trajopt fails, but the retry with PRM graph
        seeds succeeds (reference `motion_planner.py:233-296` +
        `_get_graph_seed_trajectories:386`)."""
        wall_world = wm.compile_scene(
            gt.Scene().add(
                # a fin that intersects the joint-0 sweep corridor (see
                # test_graph_planner.fin_world) — the straight sweep is
                # verifiably blocked
                gt.Cuboid(name="fin", pose=[0.24, 0.05, 0.75, 1, 0, 0, 0],
                          dims=[0.2, 0.04, 0.5]),
                gt.Cuboid(name="table", pose=[0.4, 0.0, -0.3, 1, 0, 0, 0],
                          dims=[1.4, 1.4, 0.2]),
            )
        )
        # side-to-side sweep around the fin (same geometry as the PRM test)
        q_start_cfg = jnp.asarray([[1.0, -0.9, 0.0, -2.0, 0.0, 1.5, 0.0]])
        q_goal = jnp.asarray([[-1.0, -0.9, 0.0, -2.0, 0.0, 1.5, 0.0]])
        st = compute_kinematics(kin.params, q_goal)
        goal = Pose(st.tool_pose.position[:, 0], st.tool_pose.quaternion[:, 0])
        start = JointState.from_position(q_start_cfg, kin.params.joint_names)
        lb = LBFGSConfig(history=12, n_iters=50, max_step=0.5)
        base = dict(
            ik=IKConfig(n_seeds=12),
            trajopt=TrajOptConfig(n_seeds=2, lbfgs=lb, finetune_attempts=1),
            n_trajopt_seeds=2,
        )
        # force the graph-seeded retry: attempt 0 disabled for graph, plan
        # must escalate and still succeed (linear seeds may or may not solve
        # this world on their own; the PRM growth test carries the strict
        # narrow-passage negative case)
        with_graph = MotionPlanner(
            kin.params,
            MotionPlanConfig(max_attempts=2, enable_graph_attempt=1, **base),
        ).plan_pose(wall_world, goal, start)
        assert bool(with_graph.success[0]), (
            f"graph-seeded plan failed: pos_err={np.asarray(with_graph.position_error)}"
        )
        # collision-free along the solved trajectory
        from curobo_tpu.collision.robot_scene import RobotSceneCollision

        rsc = RobotSceneCollision(kin.params)
        ok = np.asarray(
            rsc.validate(
                wall_world, with_graph.solver_trajectory.position[0]
            )
        )
        assert ok.all(), "graph-seeded trajectory collides"

    def test_plan_cspace(self, kin, world, planner):
        B = 2
        q_goal = jnp.broadcast_to(
            kin.params.retract_config + jnp.asarray([0.4, 0.2, -0.3, 0.3, 0.2, -0.2, 0.3]),
            (B, 7),
        )
        start = JointState.from_position(
            jnp.broadcast_to(kin.params.retract_config, (B, 7)), kin.params.joint_names
        )
        res = planner.plan_cspace(world, JointState.from_position(q_goal), start)
        assert res.trajectory.position.shape[0] == B
        # interpolated trajectory is at the control rate
        assert abs(float(res.trajectory.dt[0]) - planner.cfg.interpolation_dt) < 1e-6
