"""RobotSceneCollision + AttachmentManager tests."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from curobo_tpu.collision.robot_scene import AttachmentManager, RobotSceneCollision
from curobo_tpu.geom import types as gt
from curobo_tpu.geom import world as wm
from curobo_tpu.robot.kinematics import Kinematics, compute_kinematics

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


class TestRobotSceneCollision:
    def test_query(self, kin, world):
        rsc = RobotSceneCollision(kin.params)
        res = rsc.query(world, kin.params.retract_config[None])
        assert bool(res.valid[0])
        assert float(res.scene_clearance[0]) > 0

    def test_validate_trajectory(self, kin, world):
        rsc = RobotSceneCollision(kin.params)
        q0 = kin.params.retract_config
        traj = jnp.broadcast_to(q0, (1, 8, 7))
        assert bool(rsc.validate_trajectory(world, traj)[0])

    def test_sample_collision_free(self, kin, world):
        rsc = RobotSceneCollision(kin.params)
        qs, ok = rsc.sample(world, 16)
        assert int(jnp.sum(ok)) >= 8
        valid = rsc.validate(world, qs)
        assert bool(jnp.all(valid[ok]))


class TestAttachmentManager:
    def test_attach_detach(self, kin, world):
        am = AttachmentManager(kin.params)
        assert am.n_slots == 4
        rsc = RobotSceneCollision(kin.params)
        q = kin.params.retract_config[None]

        # attach a big box payload: spheres become live
        p2 = am.attach_box(kin.params, half_dims=[0.05, 0.05, 0.12], offset=[0, 0, 0.12])
        st = compute_kinematics(p2, q)
        live = np.asarray(st.spheres[0, :, 3] >= 0)
        assert live.sum() > np.asarray(
            compute_kinematics(kin.params, q).spheres[0, :, 3] >= 0
        ).sum()

        # margins for attached pairs are finite now
        assert bool(jnp.any(jnp.isfinite(p2.self_collision.pair_margin)
                            & ~jnp.isfinite(kin.params.self_collision.pair_margin)))

        # detach restores
        p3 = am.detach(p2)
        np.testing.assert_array_equal(
            np.asarray(p3.sphere_radii), np.asarray(kin.params.sphere_radii)
        )

    def test_attached_object_collides(self, kin):
        # A small ball placed exactly at the payload centroid: the bare
        # robot clears it, the robot with payload does not.
        am = AttachmentManager(kin.params)
        offset = np.array([0.0, 0.0, 0.25])
        p2 = am.attach_box(kin.params, half_dims=[0.03, 0.03, 0.06], offset=offset)
        q = kin.params.retract_config[None]
        st = compute_kinematics(kin.params, kin.params.retract_config)
        ti = kin.params.tool_frame_idx[0]
        R = np.asarray(st.link_rot[ti])
        centroid = np.asarray(st.tool_pose.position[0]) + R @ offset
        # sanity: centroid is clear of every bare robot sphere
        sph = np.asarray(st.spheres)
        live = sph[:, 3] >= 0
        d = np.linalg.norm(sph[live, :3] - centroid, axis=-1) - sph[live, 3]
        assert d.min() > 0.06, "test geometry: centroid too close to robot"
        world = wm.compile_scene(
            gt.Scene().add(
                gt.SphereObstacle(
                    name="ball", pose=[*centroid.tolist(), 1, 0, 0, 0], radius=0.03
                )
            )
        )
        rsc0 = RobotSceneCollision(kin.params)
        rsc2 = RobotSceneCollision(p2)
        assert bool(rsc0.query(world, q).valid[0])  # bare robot clears
        assert not bool(rsc2.query(world, q).valid[0])  # payload hits ball
