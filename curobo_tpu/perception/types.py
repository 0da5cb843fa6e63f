"""Sensor observation types.

Parity: reference `curobo/_src/types/camera.py` (`CameraObservation`) and
`types/lidar.py` (`LidarObservation`).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from curobo_tpu.types.pose import Pose


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class CameraObservation:
    """Depth (+ optional RGB / feature) observation.

    depth: (H, W) metres, 0 or non-finite = invalid.
    intrinsics: (3, 3) pinhole K matrix.
    pose: camera-to-world Pose.
    """

    depth: jnp.ndarray
    intrinsics: jnp.ndarray
    pose: Pose
    rgb: Optional[jnp.ndarray] = None  # (H, W, 3)
    feature: Optional[jnp.ndarray] = None  # (H, W, F)

    @property
    def resolution(self):
        return self.depth.shape

    def pointcloud(self) -> jnp.ndarray:
        """Back-project valid depth to world-frame points (H*W, 3) with
        invalid pixels mapped to a far sentinel."""
        H, W = self.depth.shape
        fx, fy = self.intrinsics[0, 0], self.intrinsics[1, 1]
        cx, cy = self.intrinsics[0, 2], self.intrinsics[1, 2]
        v, u = jnp.meshgrid(jnp.arange(H), jnp.arange(W), indexing="ij")
        z = self.depth
        x = (u - cx) / fx * z
        y = (v - cy) / fy * z
        pts_cam = jnp.stack([x, y, z], axis=-1).reshape(-1, 3)
        valid = (z > 0).reshape(-1)
        pts_w = self.pose.transform_points(pts_cam[None])[0]
        return jnp.where(valid[:, None], pts_w, 1.0e6)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class LidarObservation:
    """Point cloud in sensor frame + sensor pose."""

    points: jnp.ndarray  # (N, 3), invalid = non-finite or 0
    pose: Pose

    def world_points(self) -> jnp.ndarray:
        return self.pose.transform_points(self.points[None])[0]
