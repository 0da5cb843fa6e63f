"""Mimic/locked-joint semantics on the reference's mimic test robot data."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from curobo_tpu.robot.kinematics import Kinematics, compute_kinematics

CONTENT = os.path.join(os.path.dirname(__file__), "..", "curobo_tpu", "content", "robots")


@pytest.fixture(scope="module")
def robot():
    return Kinematics.from_robot_yaml(os.path.join(CONTENT, "simple_mimic_robot.yml"))


class TestMimicRobot:
    def test_locked_chain_is_constant(self, robot):
        p = robot.params
        # chain 1 is locked at 0.2: its link poses must not depend on q
        i = p.link_names.index("chain_1_link_1")
        st0 = compute_kinematics(p, jnp.zeros((p.n_dof,)))
        st1 = compute_kinematics(p, jnp.ones((p.n_dof,)))
        np.testing.assert_allclose(
            np.asarray(st0.link_pos[i]), np.asarray(st1.link_pos[i]), atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(st0.link_rot[i]), np.asarray(st1.link_rot[i]), atol=1e-6
        )

    def test_locked_mimic_folds_constant(self, robot):
        # chain_1_mimic_joint_2 mimics the LOCKED chain_1_active_joint_1
        # (lock 0.2, multiplier -1.5, offset 0.5) -> frozen at -1.5*0.2+0.5.
        p = robot.params
        i = p.link_names.index("chain_1_link_2")
        assert p.dof_idx[i] == -1 or float(p.mimic_mult[i]) == 0.0
        np.testing.assert_allclose(float(p.mimic_offset[i]), -1.5 * 0.2 + 0.5, atol=1e-6)

    def test_live_mimic_follows_driver(self):
        # Build the same robot WITHOUT the lock: the mimic becomes live and
        # must share its driver's dof with multiplier -1.5.
        from curobo_tpu.robot.model import RobotModelConfig, build_kinematics_params

        cfg = RobotModelConfig.from_urdf(
            "/root/reference/curobo/content/assets/robot/simple/simple_mimic_robot.urdf",
            base_link="base_link",
            tool_frames=["ee_link"],
        )
        p = build_kinematics_params(cfg)
        drv = p.joint_names.index("chain_1_active_joint_1")
        i = p.link_names.index("chain_1_link_2")
        assert p.dof_idx[i] == drv
        np.testing.assert_allclose(float(p.mimic_mult[i]), -1.5, atol=1e-6)
        np.testing.assert_allclose(float(p.mimic_offset[i]), 0.5, atol=1e-6)
        # the mimic's joint value tracks mult*q_driver + offset
        from curobo_tpu.robot.kinematics import joint_values

        v = joint_values(p, jnp.zeros((p.n_dof,)).at[drv].add(0.3))
        np.testing.assert_allclose(float(v[i]), -1.5 * 0.3 + 0.5, atol=1e-6)

    def test_fk_responds_only_to_active_dof(self, robot):
        p = robot.params
        assert p.n_dof == 1
        st0 = compute_kinematics(p, jnp.asarray([0.0]))
        st1 = compute_kinematics(p, jnp.asarray([0.5]))
        # the active joint rotates the ee about its own origin: orientation
        # changes, position does not
        from curobo_tpu.math import quaternion as qm

        ang = float(
            qm.quat_geodesic_distance(
                st0.tool_pose.quaternion[0], st1.tool_pose.quaternion[0]
            )
        )
        np.testing.assert_allclose(ang, 0.5, atol=1e-4)


class TestLockedJoints:
    def test_with_locked_joints_matches_full_model(self):
        """`RobotModelConfig.with_locked_joints` (reference `lock_joints`,
        `cuda_robot_generator`): locking actuated joints at fixed values
        must reproduce the full model's FK with those values plugged in,
        with the dof axis reduced."""
        import numpy as np
        import jax.numpy as jnp
        from curobo_tpu.robot.model import RobotModelConfig
        from curobo_tpu.robot.kinematics import Kinematics, compute_kinematics

        path = os.path.join(CONTENT, "ur10e.yml")
        mc = RobotModelConfig.from_yaml(path)
        full = Kinematics.from_robot_config(mc)
        lock = mc.actuated_joints[1]
        mc2 = mc.with_locked_joints([lock], [0.4])
        red = Kinematics.from_robot_config(mc2)
        assert red.params.n_dof == full.params.n_dof - 1

        rng = np.random.RandomState(0)
        qr = jnp.asarray(rng.uniform(-1.0, 1.0, (4, red.params.n_dof)), jnp.float32)
        qf = jnp.concatenate(
            [qr[:, :1], jnp.full((4, 1), 0.4, jnp.float32), qr[:, 1:]], axis=1
        )
        sr = compute_kinematics(red.params, qr)
        sf = compute_kinematics(full.params, qf)
        np.testing.assert_allclose(
            np.asarray(sr.tool_pose.position), np.asarray(sf.tool_pose.position),
            atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(sr.spheres), np.asarray(sf.spheres), atol=1e-6
        )

    def test_unknown_joint_raises(self):
        from curobo_tpu.robot.model import RobotModelConfig

        mc = RobotModelConfig.from_yaml(os.path.join(CONTENT, "ur10e.yml"))
        try:
            mc.with_locked_joints(["bogus"])
            assert False, "expected ValueError"
        except ValueError as e:
            assert "bogus" in str(e)
