"""Tests for quaternion/transform math against scipy reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from curobo_tpu.math import quaternion as qm
from curobo_tpu.math import transform as tf
from curobo_tpu.types.pose import Pose
from curobo_tpu.types.state import JointState


def random_quats(n, seed=0):
    r = Rotation.random(n, random_state=seed)
    xyzw = r.as_quat()
    wxyz = np.concatenate([xyzw[:, 3:4], xyzw[:, :3]], axis=-1)
    return wxyz, r


class TestQuaternion:
    def test_quat_to_matrix_matches_scipy(self):
        wxyz, r = random_quats(128)
        m = np.asarray(qm.quat_to_matrix(jnp.asarray(wxyz)))
        np.testing.assert_allclose(m, r.as_matrix(), atol=1e-5)

    def test_matrix_to_quat_roundtrip(self):
        wxyz, r = random_quats(256)
        q = np.asarray(qm.matrix_to_quat(jnp.asarray(r.as_matrix(), dtype=jnp.float32)))
        # canonical sign: w >= 0
        expect = np.where(wxyz[:, :1] < 0, -wxyz, wxyz)
        np.testing.assert_allclose(q, expect, atol=1e-5)

    def test_quat_multiply_matches_scipy(self):
        w1, r1 = random_quats(64, seed=1)
        w2, r2 = random_quats(64, seed=2)
        q = np.asarray(qm.quat_multiply(jnp.asarray(w1), jnp.asarray(w2)))
        rr = (r1 * r2).as_quat()
        expect = np.concatenate([rr[:, 3:4], rr[:, :3]], axis=-1)
        sign = np.sign(np.sum(q * expect, axis=-1, keepdims=True))
        np.testing.assert_allclose(q, sign * expect, atol=1e-5)

    def test_quat_rotate_matches_matrix(self):
        wxyz, r = random_quats(64, seed=3)
        v = np.random.RandomState(0).randn(64, 3).astype(np.float32)
        out = np.asarray(qm.quat_rotate(jnp.asarray(wxyz, dtype=jnp.float32), jnp.asarray(v)))
        np.testing.assert_allclose(out, r.apply(v), atol=1e-4)

    def test_axis_angle_rotation(self):
        axis = jnp.asarray([0.0, 0.0, 1.0])
        ang = jnp.asarray(np.pi / 2)
        R = np.asarray(qm.axis_angle_rotation_matrix(axis, ang))
        np.testing.assert_allclose(R @ np.array([1.0, 0, 0]), [0, 1, 0], atol=1e-6)

    def test_quat_error_zero_at_identity(self):
        wxyz, _ = random_quats(16, seed=4)
        q = jnp.asarray(wxyz, dtype=jnp.float32)
        err = np.asarray(qm.quat_error(q, q))
        np.testing.assert_allclose(err, 0.0, atol=1e-5)

    def test_quat_error_magnitude(self):
        q0 = jnp.asarray([1.0, 0, 0, 0])
        q1 = qm.quat_from_axis_angle(jnp.asarray([0.0, 0, 1.0]), jnp.asarray(0.3))
        err = np.asarray(qm.quat_error(q0, q1))
        np.testing.assert_allclose(np.linalg.norm(err), 0.3, atol=1e-5)
        np.testing.assert_allclose(err, [0, 0, 0.3], atol=1e-5)

    def test_quat_error_gradient_finite(self):
        # Gradient must be finite even at zero error (optimizers hit this).
        q0 = jnp.asarray([1.0, 0.0, 0.0, 0.0])
        g = jax.grad(lambda q: jnp.sum(qm.quat_error(q0, q) ** 2))(q0)
        assert np.all(np.isfinite(np.asarray(g)))


class TestTransform:
    def test_compose_inverse(self):
        wxyz, r = random_quats(32, seed=5)
        R = jnp.asarray(r.as_matrix(), dtype=jnp.float32)
        p = jnp.asarray(np.random.RandomState(1).randn(32, 3), dtype=jnp.float32)
        Ri, pi = tf.inverse(R, p)
        Rc, pc = tf.compose(R, p, Ri, pi)
        np.testing.assert_allclose(np.asarray(Rc), np.tile(np.eye(3), (32, 1, 1)), atol=1e-5)
        np.testing.assert_allclose(np.asarray(pc), 0.0, atol=1e-5)

    def test_transform_points(self):
        wxyz, r = random_quats(8, seed=6)
        R = jnp.asarray(r.as_matrix(), dtype=jnp.float32)
        p = jnp.asarray(np.random.RandomState(2).randn(8, 3), dtype=jnp.float32)
        pts = np.random.RandomState(3).randn(8, 5, 3).astype(np.float32)
        out = np.asarray(tf.transform_points(R, p, jnp.asarray(pts)))
        expect = np.einsum("bij,bnj->bni", r.as_matrix(), pts) + np.asarray(p)[:, None]
        np.testing.assert_allclose(out, expect, atol=1e-4)

    def test_inverse_transform_points_roundtrip(self):
        wxyz, r = random_quats(4, seed=7)
        R = jnp.asarray(r.as_matrix(), dtype=jnp.float32)
        p = jnp.asarray(np.random.RandomState(4).randn(4, 3), dtype=jnp.float32)
        pts = jnp.asarray(np.random.RandomState(5).randn(4, 6, 3), dtype=jnp.float32)
        out = tf.inverse_transform_points(R, p, tf.transform_points(R, p, pts))
        np.testing.assert_allclose(np.asarray(out), np.asarray(pts), atol=1e-4)


class TestPose:
    def test_multiply_inverse_identity(self):
        wxyz, _ = random_quats(16, seed=8)
        pose = Pose(
            jnp.asarray(np.random.RandomState(6).randn(16, 3), dtype=jnp.float32),
            jnp.asarray(wxyz, dtype=jnp.float32),
        )
        ident = pose.multiply(pose.inverse())
        np.testing.assert_allclose(np.asarray(ident.position), 0.0, atol=1e-5)
        np.testing.assert_allclose(np.abs(np.asarray(ident.quaternion[:, 0])), 1.0, atol=1e-5)

    def test_matrix_roundtrip(self):
        wxyz, _ = random_quats(16, seed=9)
        pose = Pose(
            jnp.asarray(np.random.RandomState(7).randn(16, 3), dtype=jnp.float32),
            jnp.asarray(wxyz, dtype=jnp.float32),
        )
        pose2 = Pose.from_matrix(pose.to_matrix())
        np.testing.assert_allclose(np.asarray(pose2.position), np.asarray(pose.position), atol=1e-5)

    def test_pose_jit_pytree(self):
        pose = Pose.identity((4,))
        out = jax.jit(lambda p: p.multiply(p))(pose)
        assert out.position.shape == (4, 3)

    def test_interpolate(self):
        p0 = Pose.identity(())
        p1 = Pose.from_list([1.0, 0, 0, np.cos(0.5), 0, 0, np.sin(0.5)])
        mid = p0.interpolate(p1, jnp.asarray(0.5))
        np.testing.assert_allclose(np.asarray(mid.position), [0.5, 0, 0], atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(qm.quat_angle(mid.quaternion)), 0.5, atol=1e-4
        )


class TestJointState:
    def test_reorder(self):
        js = JointState.from_position(
            jnp.arange(14.0).reshape(2, 7), [f"j{i}" for i in range(7)]
        )
        js2 = js.reorder(["j1", "j0", "j2", "j3", "j4", "j5", "j6"])
        np.testing.assert_allclose(np.asarray(js2.position[0, :2]), [1.0, 0.0])

    def test_tile_seeds(self):
        js = JointState.from_position(jnp.zeros((4, 7)))
        assert js.tile_seeds(8).position.shape == (4, 8, 7)

    def test_jit_pytree(self):
        js = JointState.from_position(jnp.zeros((4, 7)), [f"j{i}" for i in range(7)])
        out = jax.jit(lambda s: s._map(lambda a: a + 1.0))(js)
        assert out.joint_names == js.joint_names
