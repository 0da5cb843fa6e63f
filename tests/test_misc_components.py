"""Tests: LM seed IK, ES optimizer, retargeter, sphere fit, metrics, torque cost."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from curobo_tpu.geom import types as gt
from curobo_tpu.geom import world as wm
from curobo_tpu.motion.retargeter import MotionRetargeter, RetargetConfig
from curobo_tpu.opt.es import ESConfig, es_optimize
from curobo_tpu.opt.lm import LMConfig, SeedIK
from curobo_tpu.robot.kinematics import Kinematics, compute_kinematics
from curobo_tpu.types.pose import Pose
from curobo_tpu.util.metrics import GroupMetrics, PlanMetrics

CONTENT = os.path.join(os.path.dirname(__file__), "..", "curobo_tpu", "content", "robots")


@pytest.fixture(scope="module")
def kin():
    return Kinematics.from_robot_yaml(os.path.join(CONTENT, "franka.yml"))


class TestSeedIK:
    def test_converges_to_pose(self, kin):
        rng = np.random.RandomState(0)
        B = 8
        lo = np.asarray(kin.params.joint_limits.lower)
        hi = np.asarray(kin.params.joint_limits.upper)
        span = hi - lo
        qg = jnp.asarray(rng.uniform(lo + 0.2 * span, hi - 0.2 * span, (B, 7)), dtype=jnp.float32)
        st = compute_kinematics(kin.params, qg)
        goal = Pose(st.tool_pose.position[:, 0], st.tool_pose.quaternion[:, 0])
        seed_ik = SeedIK(kin.params, LMConfig(n_iters=30))
        q0 = jnp.broadcast_to(kin.params.retract_config, (B, 7))
        q, c = seed_ik.solve(goal, q0)
        st2 = compute_kinematics(kin.params, q)
        err = jnp.linalg.norm(st2.tool_pose.position[:, 0] - goal.position, axis=-1)
        # LM from a single seed: most problems should get close
        assert float(jnp.median(err)) < 0.01

    def test_multi_tool_residual(self):
        """Multi-tool LM (reference multi-link seed IK): both dual-arm tool
        frames must converge from per-problem best-of-seeds."""
        dkin = Kinematics.from_robot_yaml(os.path.join(CONTENT, "dual_ur10e.yml"))
        p = dkin.params
        rng = np.random.RandomState(1)
        B, S = 4, 12
        qg = jnp.asarray(rng.uniform(-1.2, 1.2, (B, p.n_dof)), jnp.float32)
        st = compute_kinematics(p, qg)
        gp = jnp.broadcast_to(
            st.tool_pose.position[:, None], (B, S) + st.tool_pose.position.shape[1:]
        )
        gq = jnp.broadcast_to(
            st.tool_pose.quaternion[:, None], (B, S) + st.tool_pose.quaternion.shape[1:]
        )
        q0 = jnp.asarray(
            p.retract_config + rng.uniform(-1.5, 1.5, (B, S, p.n_dof)), jnp.float32
        )
        seed_ik = SeedIK(p, LMConfig(n_iters=25))
        q, c = seed_ik._solve_jit(q0, gp, gq)
        st2 = compute_kinematics(p, q)
        err = np.linalg.norm(np.asarray(st2.tool_pose.position - gp), axis=-1)
        best = err.max(-1).min(-1)  # worst tool, best seed per problem
        assert float(np.median(best)) < 1e-3, best

    def test_lm_seed_pool_downselect(self):
        """lm_seed_pool > n_seeds: the solver refines the pool and hands the
        best n_seeds to the optimizer stages; result must succeed."""
        import dataclasses

        from curobo_tpu.geom import world as wm
        from curobo_tpu.solver.ik import IKConfig, IKSolver

        kin = Kinematics.from_robot_yaml(os.path.join(CONTENT, "ur10e.yml"))
        p = kin.params
        rng = np.random.RandomState(2)
        B = 4
        qg = jnp.asarray(rng.uniform(-1.2, 1.2, (B, p.n_dof)), jnp.float32)
        st = compute_kinematics(p, qg)
        goal = Pose(st.tool_pose.position[:, 0], st.tool_pose.quaternion[:, 0])
        cfg = IKConfig(
            n_seeds=4, use_lm_seed=True, lm_seed_pool=16, use_pallas=False,
        )
        solver = IKSolver(p, cfg)
        res = solver.solve_pose(wm.empty_world(), goal)
        # seed axis must be the downselected n_seeds, not the pool
        assert res.seed_solutions.shape[1] == 4
        assert bool(jnp.all(res.success)), np.asarray(res.position_error)


class TestES:
    def test_quadratic(self):
        B, D = 4, 5
        center = jnp.asarray(np.random.RandomState(0).randn(B, D), dtype=jnp.float32)
        f = lambda x: jnp.sum((x - center) ** 2, axis=-1)
        x, c = es_optimize(
            f, jnp.zeros((B, D)), jax.random.PRNGKey(0),
            ESConfig(n_iters=100, learning_rate=1.0),
        )
        # ES is a coarse explorer (used as a stage before gradient
        # refinement); expect substantial but not exact convergence.
        c0 = f(jnp.zeros((B, D)))
        assert float(jnp.max(c / c0)) < 0.25


class TestRetargeter:
    def test_tracks_sequence(self, kin):
        rt = MotionRetargeter(kin.params)
        q0 = kin.params.retract_config
        st = compute_kinematics(kin.params, q0)
        base = Pose(st.tool_pose.position, st.tool_pose.quaternion)  # (T,)
        # small pose sequence drifting in z
        F = 5
        seq_pos = jnp.broadcast_to(base.position, (F, 1, 3)) + jnp.linspace(0, 0.05, F)[:, None, None] * jnp.asarray([0.0, 0, 1.0])
        seq_quat = jnp.broadcast_to(base.quaternion, (F, 1, 4))
        traj = rt.solve_sequence(Pose(seq_pos, seq_quat), q0)
        assert traj.position.shape == (F, 7)
        st2 = compute_kinematics(kin.params, traj.position[-1])
        err = float(jnp.linalg.norm(st2.tool_pose.position[0] - seq_pos[-1, 0]))
        assert err < 0.02

    def test_global_ik_first_frame(self, kin):
        """Without a warm start, frame 0 runs multi-seed global IK
        (reference `_solve_global_ik`)."""
        from curobo_tpu.motion.retargeter import RetargetConfig

        rt = MotionRetargeter(
            kin.params, RetargetConfig(global_seeds=8)
        )
        qg = kin.params.retract_config + 0.3
        st = compute_kinematics(kin.params, qg)
        goal = Pose(st.tool_pose.position[None], st.tool_pose.quaternion[None])
        res = rt.solve_frame(goal)  # no q_prev: global IK path
        assert res.success is not None
        st2 = compute_kinematics(kin.params, res.joint_state.position[0])
        err = float(jnp.linalg.norm(st2.tool_pose.position[0] - goal.position[0, 0]))
        assert err < 0.02
        # second frame uses the warm-started local path (no success field)
        res2 = rt.solve_frame(goal)
        assert res2.success is None
        # reset() returns to global IK
        rt.reset()
        res3 = rt.solve_frame(goal)
        assert res3.success is not None

    def test_mpc_mode_tracks(self, kin):
        """MPC mode: steps_per_target control ticks per frame (reference
        `_solve_mpc_frame:282`)."""
        from curobo_tpu.motion.retargeter import RetargetConfig

        rt = MotionRetargeter(
            kin.params,
            RetargetConfig(mode="mpc", steps_per_target=3, global_seeds=8),
        )
        q0 = kin.params.retract_config
        st = compute_kinematics(kin.params, q0)
        goal = Pose(
            st.tool_pose.position[None] + jnp.asarray([0.0, 0.0, 0.03]),
            st.tool_pose.quaternion[None],
        )
        res0 = rt.solve_frame(goal, q_prev=q0[None])  # warm state -> MPC path
        assert res0.trajectory is not None
        assert res0.trajectory.position.shape == (1, 3, kin.params.n_dof)
        # a few more frames move the tool toward the target
        for _ in range(4):
            res = rt.solve_frame(goal)
        st2 = compute_kinematics(kin.params, res.joint_state.position[0])
        err0 = float(jnp.linalg.norm(st.tool_pose.position[0] + jnp.asarray([0.0, 0.0, 0.03]) - st.tool_pose.position[0]))
        err = float(jnp.linalg.norm(st2.tool_pose.position[0] - goal.position[0, 0]))
        assert err < err0  # strictly closer than the start

    def test_bad_mode_rejected(self, kin):
        from curobo_tpu.motion.retargeter import RetargetConfig

        with pytest.raises(ValueError):
            RetargetConfig(mode="teleport")


class TestSphereFit:
    def test_fit_cube(self):
        from scipy.spatial import ConvexHull

        from curobo_tpu.geom.sphere_fit import SphereFitConfig, fit_spheres_to_mesh

        h = 0.1
        v = np.array(
            [[sx * h, sy * h, sz * h] for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)]
        )
        hull = ConvexHull(v)
        mesh = gt.MeshObstacle(name="cube", vertices=v, faces=hull.simplices, voxel_size=0.02)
        c, r = fit_spheres_to_mesh(mesh, SphereFitConfig(n_spheres=8, n_iters=100))
        assert c.shape == (8, 3)
        # spheres are (mostly) inside the cube
        assert np.all(np.abs(c) < h + 0.02)
        assert np.all(r > 0)


class TestTorqueCost:
    def test_torque_limit_penalty(self, kin):
        import dataclasses

        from curobo_tpu.rollout.robot_rollout import Goal, RobotRollout, RobotRolloutConfig
        from curobo_tpu.types.state import JointState

        world = wm.empty_world()
        q0 = kin.params.retract_config
        st = compute_kinematics(kin.params, q0)
        goal = Goal.from_pose(Pose(st.tool_pose.position[0][None], st.tool_pose.quaternion[0][None]))

        cfg = RobotRolloutConfig(torque_limit_weight=1.0, payload_mass=100.0)
        rollout = RobotRollout(kin.params, cfg)
        # aggressive trajectory: large accelerations with a 100 kg payload
        H = 8
        q = jnp.broadcast_to(q0, (1, H, 7))
        traj = JointState(
            position=q,
            velocity=jnp.zeros_like(q),
            acceleration=jnp.full_like(q, 50.0),
            jerk=jnp.zeros_like(q),
        )
        res = rollout.evaluate_trajectory(world, goal, traj)
        cfg0 = RobotRolloutConfig()
        res0 = RobotRollout(kin.params, cfg0).evaluate_trajectory(world, goal, traj)
        assert float(res.cost[0]) > float(res0.cost[0])  # torque penalty active


class TestMetrics:
    def test_aggregate(self):
        ms = [
            PlanMetrics(success=True, plan_time=0.03, motion_time=1.0, position_error=1e-4),
            PlanMetrics(success=True, plan_time=0.05, motion_time=1.2, position_error=2e-4),
            PlanMetrics(success=False),
        ]
        g = GroupMetrics.aggregate(ms)
        assert g.n == 3
        np.testing.assert_allclose(g.success_rate, 2 / 3)
        np.testing.assert_allclose(g.plan_time_mean, 0.04)
        d = g.to_dict()
        assert "plan_time_p98" in d
