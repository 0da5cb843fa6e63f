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

    def test_retime_dt_scales_with_limit_violation(self, kin, solver):
        """_retime_dt must GROW dt exactly enough that a limit-violating
        trajectory fits (reference per-seed re-time, solver_trajopt.py:437)."""
        from curobo_tpu.types.state import JointState

        def traj_of(q, dt):
            v = jnp.gradient(q, axis=-2) / dt[:, None, None]
            a = jnp.gradient(v, axis=-2) / dt[:, None, None]
            j = jnp.gradient(a, axis=-2) / dt[:, None, None]
            return JointState(
                position=q, velocity=v, acceleration=a, jerk=j, dt=dt,
                joint_names=kin.params.joint_names,
            )

        H = 16
        t = jnp.linspace(0.0, 1.0, H)
        q = 0.3 * jnp.sin(2 * np.pi * t)[None, :, None] * jnp.ones((1, H, 7))
        dt0 = jnp.asarray([0.02])
        dt_fast = solver._retime_dt(traj_of(q, dt0), dt0)
        assert float(dt_fast[0]) > float(dt0[0])  # fast sine violates limits
        # re-rolled at the retimed dt, velocity fits the limits
        re = traj_of(q, dt_fast)
        assert float(
            jnp.max(jnp.abs(re.velocity) / kin.params.joint_limits.velocity)
        ) <= 1.05
        # retiming targets an ABSOLUTE feasible dt: starting 4x slower
        # converges to (at most) the same retimed dt
        dt_slow4 = solver._retime_dt(traj_of(q, dt0 * 4), dt0 * 4)
        assert float(dt_slow4[0]) <= float(dt_fast[0]) * 1.1

    def test_finetune_rounds_keep_best(self, kin, table_world):
        """More finetune rounds must not DEGRADE the per-problem best
        (keep-best merge, reference solver_trajopt.py:437-460): motion
        time with 2 rounds <= motion time with 0 rounds for successes."""
        from curobo_tpu.opt.lbfgs import LBFGSConfig
        from curobo_tpu.solver.trajopt import TrajOptConfig, TrajOptSolver

        B = 2
        q_goal = goal_configs(kin, B, seed=5)
        q_start = jnp.broadcast_to(kin.params.retract_config, (B, 7))
        lb = LBFGSConfig(history=10, n_iters=40, max_step=0.5)
        r0 = TrajOptSolver(
            kin.params, TrajOptConfig(lbfgs=lb, finetune_attempts=0)
        ).solve_cspace(table_world, q_goal, q_start)
        r2 = TrajOptSolver(
            kin.params, TrajOptConfig(lbfgs=lb, finetune_attempts=2)
        ).solve_cspace(table_world, q_goal, q_start)
        ok = np.asarray(r0.success) & np.asarray(r2.success)
        if ok.any():
            assert np.all(
                np.asarray(r2.motion_time)[ok]
                <= np.asarray(r0.motion_time)[ok] * 1.01
            )
        # finetune must not hurt terminal accuracy beyond threshold
        assert float(jnp.max(r2.position_error)) <= max(
            float(jnp.max(r0.position_error)), 0.006
        )

    def test_trajectory_respects_velocity_limits(self, kin, table_world, solver):
        B = 3
        q_goal = goal_configs(kin, B, seed=6)
        q_start = jnp.broadcast_to(kin.params.retract_config, (B, 7))
        res = solver.solve_cspace(table_world, q_goal, q_start)
        ok = np.asarray(res.success)
        if ok.any():
            v = np.abs(np.asarray(res.trajectory.velocity))[ok]
            a = np.abs(np.asarray(res.trajectory.acceleration))[ok]
            assert np.all(v <= np.asarray(kin.params.joint_limits.velocity) * 1.05)
            assert np.all(
                a <= np.asarray(kin.params.joint_limits.acceleration) * 1.2
            )
