"""SDF pose detector tests: recover a known object pose from points."""

import numpy as np
import jax.numpy as jnp
import pytest
from scipy.spatial import ConvexHull

from curobo_tpu.geom import types as gt
from curobo_tpu.math import quaternion as qm
from curobo_tpu.perception.pose_estimation import PoseEstimationConfig, SDFPoseDetector
from curobo_tpu.types.pose import Pose


@pytest.fixture(scope="module")
def box_detector():
    h = np.array([0.06, 0.09, 0.12])  # asymmetric box (unique orientation)
    v = np.array(
        [[sx * h[0], sy * h[1], sz * h[2]] for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)]
    )
    hull = ConvexHull(v)
    mesh = gt.MeshObstacle(name="box", vertices=v, faces=hull.simplices, voxel_size=0.01)
    det = SDFPoseDetector(mesh, PoseEstimationConfig(n_iters=40))
    return det, h


def surface_points(h, n=256, seed=0):
    """Sample points on the box surface (in the object frame)."""
    rng = np.random.RandomState(seed)
    pts = rng.uniform(-1, 1, (n, 3)) * h
    # project to the nearest face
    ratios = np.abs(pts) / h
    face = np.argmax(ratios, axis=-1)
    for i in range(n):
        pts[i, face[i]] = np.sign(pts[i, face[i]]) * h[face[i]]
    return pts


class TestSDFPoseDetector:
    def test_refine_recovers_small_offset(self, box_detector):
        det, h = box_detector
        true_pos = np.array([0.4, 0.1, 0.3])
        true_quat = np.array([np.cos(0.15), 0.0, 0.0, np.sin(0.15)])  # 0.3 rad yaw
        pts_local = surface_points(h)
        pts_world = (
            np.asarray(qm.quat_rotate(jnp.asarray(true_quat), jnp.asarray(pts_local)))
            + true_pos
        )
        # initial guess: 3 cm + 0.15 rad off
        pose0 = Pose(
            jnp.asarray(true_pos + np.array([0.03, -0.02, 0.01]), dtype=jnp.float32),
            qm.quat_normalize(jnp.asarray(true_quat + np.array([0.05, 0, 0, 0]), dtype=jnp.float32)),
        )
        refined, rms = det.refine(pose0, jnp.asarray(pts_world, dtype=jnp.float32))
        pos_err = float(jnp.linalg.norm(refined.position - jnp.asarray(true_pos)))
        rot_err = float(
            qm.quat_geodesic_distance(refined.quaternion, jnp.asarray(true_quat, dtype=jnp.float32))
        )
        assert pos_err < 0.01, f"pos err {pos_err}"
        assert rot_err < 0.1, f"rot err {rot_err}"
        assert float(rms) < 0.01

    def test_residual_decreases(self, box_detector):
        det, h = box_detector
        pts = jnp.asarray(surface_points(h), dtype=jnp.float32) + jnp.asarray([0.2, 0.0, 0.0])
        pose0 = Pose(jnp.asarray([0.23, 0.01, -0.01]), jnp.asarray([1.0, 0, 0, 0]))
        r0 = jnp.sqrt(jnp.mean(det._residuals(pose0.position, pose0.quaternion, pts) ** 2))
        refined, rms = det.refine(pose0, pts)
        assert float(rms) < float(r0)
