"""B-last fast path must agree with the generic rollout (oracle test)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from curobo_tpu.geom import types as gt
from curobo_tpu.geom import world as wm
from curobo_tpu.ops.blast import BlastRollout, fk_blast
from curobo_tpu.robot.kinematics import Kinematics, compute_kinematics
from curobo_tpu.rollout.robot_rollout import Goal, RobotRollout, RobotRolloutConfig
from curobo_tpu.types.pose import Pose

CONTENT = os.path.join(os.path.dirname(__file__), "..", "curobo_tpu", "content", "robots")


@pytest.fixture(scope="module", params=["franka", "ur10e", "dual_ur10e"])
def kin(request):
    return Kinematics.from_robot_yaml(os.path.join(CONTENT, f"{request.param}.yml"))


@pytest.fixture(scope="module")
def world():
    n, cell = 16, 0.05
    xs = (np.arange(n) + 0.5) * cell - 0.4
    X, Y, Z = np.meshgrid(xs, xs, xs, indexing="ij")
    data = np.sqrt(X**2 + Y**2 + Z**2) - 0.15
    return wm.compile_scene(
        gt.Scene().add(
            gt.Cuboid(name="table", pose=[0.4, 0.0, -0.1, 1, 0, 0, 0], dims=[1.2, 1.2, 0.2]),
            gt.Cuboid(
                name="tilted",
                pose=[0.3, 0.4, 0.4, 0.92387953, 0.0, 0.0, 0.38268343],
                dims=[0.2, 0.3, 0.4],
            ),
            gt.SphereObstacle(name="ball", pose=[-0.4, 0.2, 0.6, 1, 0, 0, 0], radius=0.12),
            gt.Capsule(
                name="pole", pose=[0.0, -0.5, 0.0, 1, 0, 0, 0], radius=0.06,
                base=[0, 0, 0], tip=[0, 0, 1.2],
            ),
            gt.Cylinder(name="can", pose=[-0.3, -0.3, 0.3, 1, 0, 0, 0], radius=0.07, height=0.25),
            gt.VoxelGridObstacle(
                name="esdf", pose=[0.6, -0.4, 0.5, 1, 0, 0, 0], dims=[0.8, 0.8, 0.8],
                voxel_size=cell, data=data,
            ),
        )
    )


class TestFkBlast:
    def test_spheres_match_generic(self, kin):
        p = kin.params
        rng = np.random.RandomState(0)
        lo = np.asarray(p.joint_limits.lower)
        hi = np.asarray(p.joint_limits.upper)
        q = jnp.asarray(
            rng.uniform(np.maximum(lo, -3), np.minimum(hi, 3), (64, p.n_dof)),
            dtype=jnp.float32,
        )
        st = compute_kinematics(p, q)
        _, _, sx, sy, sz = fk_blast(p, jnp.moveaxis(q, -1, 0))
        np.testing.assert_allclose(np.asarray(sx.T), np.asarray(st.spheres[..., 0]), atol=2e-5)
        np.testing.assert_allclose(np.asarray(sy.T), np.asarray(st.spheres[..., 1]), atol=2e-5)
        np.testing.assert_allclose(np.asarray(sz.T), np.asarray(st.spheres[..., 2]), atol=2e-5)

    def test_tool_frame_matches(self, kin):
        p = kin.params
        rng = np.random.RandomState(1)
        q = jnp.asarray(rng.uniform(-1.5, 1.5, (8, p.n_dof)), dtype=jnp.float32)
        st = compute_kinematics(p, q)
        Rg, pg, *_ = fk_blast(p, jnp.moveaxis(q, -1, 0))
        ti = p.tool_frame_idx[0]
        tool_p = np.stack([np.asarray(x) for x in pg[ti]], axis=-1)
        np.testing.assert_allclose(tool_p, np.asarray(st.tool_pose.position[:, 0]), atol=2e-5)


class TestBlastRollout:
    def make(self, kin, world, with_cspace=False):
        p = kin.params
        cfg = RobotRolloutConfig(null_space_weight=0.01)
        rng = np.random.RandomState(2)
        B, S = 5, 3
        q = jnp.asarray(rng.uniform(-1.2, 1.2, (B, S, p.n_dof)), dtype=jnp.float32)
        qg = jnp.asarray(rng.uniform(-1.0, 1.0, (B, p.n_dof)), dtype=jnp.float32)
        st = compute_kinematics(p, qg)
        goal = Goal.from_pose(
            Pose(st.tool_pose.position[:, 0], st.tool_pose.quaternion[:, 0])
        ).tile_seeds(S)
        if with_cspace:
            import dataclasses

            goal = dataclasses.replace(goal, goal_cspace=jnp.broadcast_to(qg[:, None], (B, S, p.n_dof)))
        return RobotRollout(p, cfg), BlastRollout(p, cfg), goal, q

    def test_cost_and_metrics_match(self, kin, world):
        gen, blast, goal, q = self.make(kin, world)
        if not BlastRollout.supports(kin.params, goal):
            pytest.skip("multi-tool robot: blast covers single-tool")
        r1 = gen.evaluate_config(world, goal, q)
        r2 = blast.evaluate_config(world, goal, q)
        np.testing.assert_allclose(np.asarray(r2.cost), np.asarray(r1.cost), rtol=2e-4, atol=2e-3)
        np.testing.assert_allclose(np.asarray(r2.pos_err), np.asarray(r1.pos_err), atol=1e-5)
        np.testing.assert_allclose(np.asarray(r2.rot_err), np.asarray(r1.rot_err), atol=1e-4)
        np.testing.assert_array_equal(np.asarray(r2.feasible), np.asarray(r1.feasible))
        np.testing.assert_array_equal(np.asarray(r2.in_collision), np.asarray(r1.in_collision))

    def test_gradients_match(self, kin, world):
        gen, blast, goal, q = self.make(kin, world)
        if not BlastRollout.supports(kin.params, goal):
            pytest.skip("multi-tool robot")
        g1 = jax.grad(lambda q: jnp.sum(gen.evaluate_config(world, goal, q).cost))(q)
        g2 = jax.grad(lambda q: jnp.sum(blast.evaluate_config(world, goal, q).cost))(q)
        np.testing.assert_allclose(np.asarray(g2), np.asarray(g1), rtol=1e-3, atol=5e-3)

    def test_leading_axes_fold(self, kin, world):
        gen, blast, goal, q = self.make(kin, world)
        if not BlastRollout.supports(kin.params, goal):
            pytest.skip("multi-tool robot")
        q7 = jnp.broadcast_to(q, (7,) + q.shape)
        r = blast.evaluate_config(world, goal, q7)
        assert r.cost.shape == (7,) + q.shape[:-1]
        r0 = blast.evaluate_config(world, goal, q)
        np.testing.assert_allclose(np.asarray(r.cost[3]), np.asarray(r0.cost), atol=1e-5)

    def test_cspace_goal(self, kin, world):
        gen, blast, goal, q = self.make(kin, world, with_cspace=True)
        if not BlastRollout.supports(kin.params, goal):
            pytest.skip("multi-tool robot")
        r1 = gen.evaluate_config(world, goal, q)
        r2 = blast.evaluate_config(world, goal, q)
        np.testing.assert_allclose(np.asarray(r2.cost), np.asarray(r1.cost), rtol=2e-4, atol=2e-3)


class TestBlastTrajectory:
    def make(self, kin, world):
        import dataclasses

        from curobo_tpu.cost import terms
        from curobo_tpu.types.state import JointState

        p = kin.params
        cfg = RobotRolloutConfig(
            bound_cost=terms.BoundCostConfig(
                weight=5000.0, velocity_weight=50.0, acceleration_weight=5.0, jerk_weight=0.05
            ),
            collision_cost=terms.CollisionCostConfig(weight=500.0, sweep_steps=4),
            velocity_weight=0.5,
            acceleration_weight=0.05,
            jerk_weight=0.005,
            use_swept_collision=True,
            pose_run_weight=0.3,
        )
        rng = np.random.RandomState(5)
        B, S, H = 3, 2, 8
        base = jnp.asarray(rng.uniform(-1.0, 1.0, (B, S, 1, p.n_dof)), dtype=jnp.float32)
        drift = jnp.asarray(np.linspace(0, 0.4, H)[None, None, :, None], dtype=jnp.float32)
        q = base + drift * jnp.asarray(rng.uniform(-1, 1, (B, S, 1, p.n_dof)), dtype=jnp.float32)
        traj = JointState(
            position=q,
            velocity=jnp.gradient(q, axis=-2),
            acceleration=jnp.asarray(rng.normal(0, 0.5, q.shape), dtype=jnp.float32),
            jerk=jnp.asarray(rng.normal(0, 2.0, q.shape), dtype=jnp.float32),
        )
        qg = jnp.asarray(rng.uniform(-1.0, 1.0, (B, p.n_dof)), dtype=jnp.float32)
        st = compute_kinematics(p, qg)
        goal = Goal.from_pose(
            Pose(st.tool_pose.position[:, 0], st.tool_pose.quaternion[:, 0])
        ).tile_seeds(S)
        return RobotRollout(p, cfg), BlastRollout(p, cfg), goal, traj

    def test_trajectory_cost_matches(self, kin, world):
        if kin.params.n_tools != 1:
            pytest.skip("multi-tool robot")
        gen, blast, goal, traj = self.make(kin, world)
        r1 = gen.evaluate_trajectory(world, goal, traj)
        r2 = blast.evaluate_trajectory(world, goal, traj)
        np.testing.assert_allclose(np.asarray(r2.cost), np.asarray(r1.cost), rtol=3e-4, atol=5e-3)
        np.testing.assert_allclose(np.asarray(r2.pos_err), np.asarray(r1.pos_err), atol=1e-5)
        np.testing.assert_array_equal(np.asarray(r2.feasible), np.asarray(r1.feasible))

    def test_trajectory_grad_matches(self, kin, world):
        if kin.params.n_tools != 1:
            pytest.skip("multi-tool robot")
        import dataclasses

        gen, blast, goal, traj = self.make(kin, world)

        def loss(fn, q):
            t = dataclasses.replace(traj, position=q)
            return jnp.sum(fn(world, goal, t).cost)

        g1 = jax.grad(lambda q: loss(gen.evaluate_trajectory, q))(traj.position)
        g2 = jax.grad(lambda q: loss(blast.evaluate_trajectory, q))(traj.position)
        np.testing.assert_allclose(np.asarray(g2), np.asarray(g1), rtol=1e-3, atol=1e-2)
