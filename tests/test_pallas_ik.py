"""Pallas mega-kernel consistency tests (interpret mode on CPU).

The kernel's cost and hand-written self-collision backward must match the
blast path (which itself is oracle-tested against the generic rollout).
"""

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from curobo_tpu.geom import types as gt
from curobo_tpu.geom import world as wm
from curobo_tpu.robot.kinematics import Kinematics, compute_kinematics
from curobo_tpu.rollout.robot_rollout import Goal, RobotRolloutConfig
from curobo_tpu.types.pose import Pose

CONTENT = os.path.join(os.path.dirname(__file__), "..", "curobo_tpu", "content", "robots")


@pytest.fixture(scope="module", autouse=True)
def interpret_pallas():
    """Force interpret mode so the kernel runs on the CPU test backend."""
    from jax.experimental import pallas as pl

    import curobo_tpu.ops.pallas_ik as pik_mod

    orig = pik_mod.pl.pallas_call
    pik_mod.pl.pallas_call = functools.partial(orig, interpret=True)
    yield
    pik_mod.pl.pallas_call = orig


@pytest.fixture(scope="module")
def setup():
    from curobo_tpu.ops.blast import BlastRollout
    from curobo_tpu.ops.pallas_ik import PallasIKCost

    kin = Kinematics.from_robot_yaml(os.path.join(CONTENT, "franka.yml"))
    world = wm.compile_scene(
        gt.Scene().add(
            gt.Cuboid(name="table", pose=[0.4, 0, -0.1, 1, 0, 0, 0], dims=[1.2, 1.2, 0.2]),
            gt.SphereObstacle(name="ball", pose=[0.3, 0.3, 0.5, 1, 0, 0, 0], radius=0.1),
        )
    )
    cfg = RobotRolloutConfig()
    return kin, world, BlastRollout(kin.params, cfg), PallasIKCost(kin.params, cfg, world)


class TestPallasIK:
    def test_cost_and_grad_match_blast(self, setup):
        kin, world, blast, pik = setup
        N = 1024  # one block
        rng = np.random.RandomState(0)
        q = jnp.asarray(rng.uniform(-1.3, 1.3, (N, 7)), dtype=jnp.float32)
        qg = jnp.asarray(rng.uniform(-1.0, 1.0, (N, 7)), dtype=jnp.float32)
        st = compute_kinematics(kin.params, qg)
        goal = Goal.from_pose(Pose(st.tool_pose.position[:, 0], st.tool_pose.quaternion[:, 0]))
        goal7 = jnp.concatenate(
            [st.tool_pose.position[:, 0], st.tool_pose.quaternion[:, 0]], axis=-1
        )

        c, g = pik(goal7, q)
        cb = blast.evaluate_config(world, goal, q).cost
        gb = jax.grad(lambda q: jnp.sum(blast.evaluate_config(world, goal, q).cost))(q)

        rel_c = np.abs(np.asarray(c - cb)) / (np.abs(np.asarray(cb)) + 1e-2)
        assert np.median(rel_c) < 1e-4
        assert np.percentile(rel_c, 99) < 1e-2

        rel_g = np.abs(np.asarray(g - gb)) / (np.abs(np.asarray(gb)) + 1.0)
        assert np.median(rel_g) < 1e-4
        assert np.percentile(rel_g, 99) < 1e-2

    def test_cost_only_matches(self, setup):
        kin, world, blast, pik = setup
        N = 256
        rng = np.random.RandomState(1)
        q = jnp.asarray(rng.uniform(-1.0, 1.0, (N, 7)), dtype=jnp.float32)
        qg = jnp.asarray(rng.uniform(-1.0, 1.0, (N, 7)), dtype=jnp.float32)
        st = compute_kinematics(kin.params, qg)
        goal7 = jnp.concatenate(
            [st.tool_pose.position[:, 0], st.tool_pose.quaternion[:, 0]], axis=-1
        )
        c_fwd = pik.cost_only(goal7, q)
        c_grad, _ = pik(goal7, q)
        np.testing.assert_allclose(np.asarray(c_fwd), np.asarray(c_grad), rtol=1e-5)

    def test_multitool_cost_and_grad_match_blast(self):
        """Dual-arm (2 tool frames): the kernel's summed-over-tools pose
        objective must match the blast multi-tool path (r5)."""
        from curobo_tpu.ops.blast import BlastRollout
        from curobo_tpu.ops.pallas_ik import PallasIKCost

        kin = Kinematics.from_robot_yaml(
            os.path.join(CONTENT, "dual_ur10e.yml")
        )
        world = wm.compile_scene(
            gt.Scene().add(
                gt.Cuboid(name="table", pose=[0, 0, -0.1, 1, 0, 0, 0],
                          dims=[4.0, 4.0, 0.2])
            )
        )
        cfg = RobotRolloutConfig()
        blast = BlastRollout(kin.params, cfg)
        pik = PallasIKCost(kin.params, cfg, world)
        N = 256
        D = kin.params.n_dof
        rng = np.random.RandomState(3)
        q = jnp.asarray(rng.uniform(-1.2, 1.2, (N, D)), dtype=jnp.float32)
        qg = jnp.asarray(rng.uniform(-1.0, 1.0, (N, D)), dtype=jnp.float32)
        st = compute_kinematics(kin.params, qg)
        goal = Goal.from_pose(
            Pose(st.tool_pose.position, st.tool_pose.quaternion)
        )  # (N, T)
        T = kin.params.n_tools
        assert T == 2
        goal7 = jnp.concatenate(
            [st.tool_pose.position, st.tool_pose.quaternion], axis=-1
        ).reshape(N, T * 7)

        c, g = pik(goal7, q)
        cb = blast.evaluate_config(world, goal, q).cost
        gb = jax.grad(
            lambda q: jnp.sum(blast.evaluate_config(world, goal, q).cost)
        )(q)
        rel_c = np.abs(np.asarray(c - cb)) / (np.abs(np.asarray(cb)) + 1e-2)
        assert np.median(rel_c) < 1e-4
        assert np.percentile(rel_c, 99) < 1e-2
        rel_g = np.abs(np.asarray(g - gb)) / (np.abs(np.asarray(gb)) + 1.0)
        assert np.median(rel_g) < 1e-4
        assert np.percentile(rel_g, 99) < 1e-2

    def test_padding_correct(self, setup):
        # N not a multiple of the block size: padded rows must not corrupt
        # real outputs.
        kin, world, blast, pik = setup
        rng = np.random.RandomState(2)
        q1 = jnp.asarray(rng.uniform(-1.0, 1.0, (700, 7)), dtype=jnp.float32)
        qg = jnp.asarray(rng.uniform(-1.0, 1.0, (700, 7)), dtype=jnp.float32)
        st = compute_kinematics(kin.params, qg)
        goal7 = jnp.concatenate(
            [st.tool_pose.position[:, 0], st.tool_pose.quaternion[:, 0]], axis=-1
        )
        c700, g700 = pik(goal7, q1)
        c300, g300 = pik(goal7[:300], q1[:300])
        np.testing.assert_allclose(np.asarray(c700[:300]), np.asarray(c300), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(g700[:300]), np.asarray(g300), rtol=1e-5)
