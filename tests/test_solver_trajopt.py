"""End-to-end trajectory optimization tests on Franka (reference pattern:
`curobo/tests/_src/solver/test_solver_trajopt.py:99-196`)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from curobo_tpu.geom import types as gt
from curobo_tpu.geom import world as wm
from curobo_tpu.robot.kinematics import Kinematics, compute_kinematics
from curobo_tpu.solver.trajopt import TrajOptConfig, TrajOptSolver
from curobo_tpu.types.pose import Pose

CONTENT = os.path.join(os.path.dirname(__file__), "..", "curobo_tpu", "content", "robots")


@pytest.fixture(scope="module")
def kin():
    return Kinematics.from_robot_yaml(os.path.join(CONTENT, "franka.yml"))


@pytest.fixture(scope="module")
def table_world():
    return wm.compile_scene(
        gt.Scene().add(
            gt.Cuboid(name="table", pose=[0.4, 0.0, -0.1, 1, 0, 0, 0], dims=[1.2, 1.2, 0.2])
        )
    )


@pytest.fixture(scope="module")
def solver(kin):
    from curobo_tpu.opt.lbfgs import LBFGSConfig

    return TrajOptSolver(
        kin.params,
        TrajOptConfig(lbfgs=LBFGSConfig(history=12, n_iters=50, max_step=0.5),
                      finetune_attempts=1),
    )


def goal_configs(kin, n, seed=0):
    rng = np.random.RandomState(seed)
    lo = np.asarray(kin.params.joint_limits.lower)
    hi = np.asarray(kin.params.joint_limits.upper)
    span = hi - lo
    return jnp.asarray(
        rng.uniform(lo + 0.2 * span, hi - 0.2 * span, (n, kin.n_dof)), dtype=jnp.float32
    )


class TestTrajOpt:
    def test_cspace_plan(self, kin, table_world, solver):
        B = 2
        q_goal = goal_configs(kin, B, seed=0)
        q_start = jnp.broadcast_to(kin.params.retract_config, (B, 7))
        res = solver.solve_cspace(table_world, q_goal, q_start)
        traj = res.trajectory
        # starts at start, ends near goal FK pose
        np.testing.assert_allclose(
            np.asarray(traj.position[:, 0]), np.asarray(q_start), atol=1e-4
        )
        assert float(jnp.max(res.position_error)) < 0.05
        # velocities within limits for successful plans
        ok = np.asarray(res.success)
        if ok.any():
            v = np.abs(np.asarray(traj.velocity))[ok]
            vl = np.asarray(kin.params.joint_limits.velocity)
            assert np.all(v <= vl * 1.05)

    def test_pose_plan_reaches_goal(self, kin, table_world, solver):
        B = 2
        q_goal = goal_configs(kin, B, seed=1)
        st = compute_kinematics(kin.params, q_goal)
        goals = Pose(st.tool_pose.position[:, 0], st.tool_pose.quaternion[:, 0])
        q_start = jnp.broadcast_to(kin.params.retract_config, (B, 7))
        seed_q = q_goal[:, None]  # IK solutions as seeds
        res = solver.solve_pose(table_world, goals, q_start, seed_q)
        assert float(jnp.min(res.position_error)) < 0.01
        assert res.trajectory.position.shape[1] == solver.cfg.bspline.horizon

    def test_start_state_pinned(self, kin, table_world, solver):
        B = 2
        q_goal = goal_configs(kin, B, seed=2)
        q_start = jnp.broadcast_to(kin.params.retract_config, (B, 7))
        res = solver.solve_cspace(table_world, q_goal, q_start)
        traj = res.trajectory
        np.testing.assert_allclose(
            np.asarray(traj.velocity[:, 0]), 0.0, atol=1e-3
        )

    def test_interpolation(self, kin, table_world, solver):
        B = 2
        q_goal = goal_configs(kin, B, seed=3)
        q_start = jnp.broadcast_to(kin.params.retract_config, (B, 7))
        res = solver.solve_cspace(table_world, q_goal, q_start)
        interp = solver.interpolate(res, q_start, dt_out=0.02)
        # starts at start; monotone time; final state = trajectory end
        np.testing.assert_allclose(
            np.asarray(interp.position[:, 0]), np.asarray(q_start), atol=1e-3
        )
        np.testing.assert_allclose(
            np.asarray(interp.position[:, -1]),
            np.asarray(res.trajectory.position[:, -1]),
            atol=1e-3,
        )

    def test_dt_estimate_sane(self, kin, solver):
        q0 = jnp.zeros((1, 7))
        q1 = q0.at[:, 0].set(2.0)
        dt = solver.estimate_dt(q0, q1)
        # 2 rad at ~2.17 rad/s limit with margin: motion time in [1, 5] s
        T = float(dt[0]) * (solver.cfg.bspline.horizon - 1)
        assert 0.5 < T < 6.0
