"""Example: pose calibration from a point cloud — SDF-based detection.

A noisy surface point cloud of an object (here an L-shaped bracket mesh)
is observed at an unknown pose. `SDFPoseDetector` recovers the pose:
global detection (orientation-fan sampling + batched LM refinement of all
candidates at once) followed by local refinement — the same two-button
workflow as the reference's calibrate demo, headless.

Usage:
    python examples/robot_pose_calibration.py [--test]

Parity: reference `examples/reference/robot_pose_calibration.py`
(PoseDetector / SDFPoseDetector).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def bracket_mesh():
    """L-shaped bracket as vertices/faces (two fused boxes — asymmetric, so
    the pose is unambiguous)."""
    import numpy as np

    def box(c, h):
        c, h = np.asarray(c), np.asarray(h)
        sign = np.array(
            [[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)],
            float,
        )
        v = c + sign * h
        f = np.array(
            [
                [0, 1, 3], [0, 3, 2], [4, 6, 7], [4, 7, 5],
                [0, 4, 5], [0, 5, 1], [2, 3, 7], [2, 7, 6],
                [0, 2, 6], [0, 6, 4], [1, 5, 7], [1, 7, 3],
            ]
        )
        return v, f

    v1, f1 = box([0.0, 0.0, 0.05], [0.15, 0.05, 0.05])
    v2, f2 = box([0.10, 0.0, 0.20], [0.05, 0.05, 0.10])
    return np.concatenate([v1, v2]), np.concatenate([f1, f2 + len(v1)])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--test", action="store_true")
    args = ap.parse_args()

    if args.test:
        os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import numpy as np

    import curobo_tpu as ct
    from curobo_tpu.geom import types as gt
    from curobo_tpu.math import quaternion as qm
    from curobo_tpu.perception.pose_estimation import (
        PoseEstimationConfig,
        SDFPoseDetector,
    )

    verts, faces = bracket_mesh()
    mesh = gt.MeshObstacle(name="bracket", vertices=verts, faces=faces,
                           voxel_size=0.01)

    # ground-truth pose: rotation about z + offset
    ang = 0.6
    gt_quat = jnp.asarray([np.cos(ang / 2), 0.0, 0.0, np.sin(ang / 2)], jnp.float32)
    gt_pos = jnp.asarray([0.35, -0.15, 0.1], jnp.float32)

    # observed cloud: surface samples (face centroids + vertices), posed +
    # 2 mm gaussian noise
    rng = np.random.RandomState(0)
    surf = np.concatenate([verts, verts[faces].mean(axis=1)])
    pose_true = ct.Pose(gt_pos, gt_quat)
    pts = pose_true.transform_points(jnp.asarray(surf, jnp.float32)[None])[0]
    pts = pts + jnp.asarray(rng.normal(0, 0.002, pts.shape), jnp.float32)

    det = SDFPoseDetector(
        mesh, PoseEstimationConfig(n_orientation_samples=64, n_iters=40)
    )

    # 1. global calibrate: orientation fan + batched LM, no initial guess
    pose_est, res = det.detect(pts, position_hint=jnp.mean(pts, axis=0))
    # 2. local calibrate: refine from the detected pose
    pose_ref, res_ref = det.refine(pose_est, pts)

    perr = float(jnp.linalg.norm(pose_ref.position - gt_pos)) * 1e3
    qerr = float(
        jnp.linalg.norm(qm.quat_error(gt_quat[None], pose_ref.quaternion[None]))
    )
    print(f"global detect residual: {float(res) * 1e3:.2f} mm rms")
    print(f"refined residual:       {float(res_ref) * 1e3:.2f} mm rms")
    print(f"position error: {perr:.1f} mm, rotation error: {qerr:.4f} rad")
    if args.test:
        # mesh-SDF alignment of a symmetric-ish part: accept cm-class pose
        assert float(res_ref) < 0.02 and perr < 50.0
        print("TEST PASSED")


if __name__ == "__main__":
    main()
