"""Robot segmentation + depth filtering for perception pipelines.

Parity: reference `RobotSegmenter` (`curobo/_src/perception/
robot_segmenter.py:35`, `get_robot_mask:163` — depth -> pointcloud ->
distance-to-robot-spheres mask) and `FilterDepth`
(`perception/filter_depth.py:64`, separable validity-masked smoothing).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from curobo_tpu.perception.types import CameraObservation
from curobo_tpu.robot import kinematics as kin_mod
from curobo_tpu.robot.params import KinematicsParams


@dataclasses.dataclass(frozen=True)
class SegmenterConfig:
    # extra margin added to sphere radii when masking robot pixels
    distance_threshold: float = 0.05


class RobotSegmenter:
    """Masks robot pixels out of depth images using the sphere model."""

    def __init__(self, params: KinematicsParams, cfg: SegmenterConfig = SegmenterConfig()):
        self.params = params
        self.cfg = cfg
        self._mask_jit = jax.jit(self._mask_impl)

    def _mask_impl(self, obs: CameraObservation, q: jnp.ndarray) -> jnp.ndarray:
        st = kin_mod.compute_kinematics(self.params, q)
        spheres = st.spheres  # (S, 4)
        pts = obs.pointcloud()  # (HW, 3)
        d = jnp.linalg.norm(
            pts[:, None, :] - spheres[None, :, :3], axis=-1
        ) - spheres[None, :, 3]
        live = spheres[:, 3] >= 0
        on_robot = jnp.any(
            (d < self.cfg.distance_threshold) & live[None, :], axis=-1
        )
        return on_robot.reshape(obs.depth.shape)

    def get_robot_mask(self, obs: CameraObservation, q: jnp.ndarray) -> jnp.ndarray:
        """(H, W) bool mask: True where the pixel belongs to the robot."""
        return self._mask_jit(obs, q)

    def remove_robot(self, obs: CameraObservation, q: jnp.ndarray) -> CameraObservation:
        mask = self.get_robot_mask(obs, q)
        return dataclasses.replace(obs, depth=jnp.where(mask, 0.0, obs.depth))


@dataclasses.dataclass(frozen=True)
class FilterDepthConfig:
    kernel_size: int = 5
    sigma: float = 1.5
    # reject smoothed values whose support mixed depths further apart than
    # this (edge preservation)
    max_depth_diff: float = 0.05


class FilterDepth:
    """Validity-masked separable Gaussian depth filter with edge rejection."""

    def __init__(self, cfg: FilterDepthConfig = FilterDepthConfig()):
        self.cfg = cfg
        import numpy as np

        k = cfg.kernel_size
        xs = np.arange(k) - k // 2
        w = np.exp(-0.5 * (xs / cfg.sigma) ** 2)
        self._w = jnp.asarray(w / w.sum(), dtype=jnp.float32)
        self._filter_jit = jax.jit(self._filter_impl)

    def _sep_conv(self, img, mask):
        k = self.cfg.kernel_size
        pad = k // 2
        w = self._w

        def conv_axis(x, axis):
            xp = jnp.pad(
                x,
                [(pad, pad) if a == axis else (0, 0) for a in range(x.ndim)],
            )
            out = jnp.zeros_like(x)
            for i in range(k):
                sl = [slice(None)] * x.ndim
                sl[axis] = slice(i, i + x.shape[axis])
                out = out + w[i] * xp[tuple(sl)]
            return out

        num = conv_axis(conv_axis(img * mask, 0), 1)
        den = conv_axis(conv_axis(mask, 0), 1)
        return num, den

    def _filter_impl(self, depth: jnp.ndarray) -> jnp.ndarray:
        mask = (depth > 0).astype(depth.dtype)
        num, den = self._sep_conv(depth, mask)
        sm = num / jnp.maximum(den, 1e-6)
        ok = (den > 0.25) & (jnp.abs(sm - depth) < self.cfg.max_depth_diff)
        # keep original where valid & close to the smoothed estimate;
        # fill small holes with the smoothed value
        out = jnp.where(mask > 0, jnp.where(ok, sm, depth), jnp.where(den > 0.5, sm, 0.0))
        return out

    def __call__(self, obs: CameraObservation) -> CameraObservation:
        return dataclasses.replace(obs, depth=self._filter_jit(obs.depth))
