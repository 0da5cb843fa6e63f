"""Pose pytree: batched position + wxyz quaternion.

API parity target: reference `curobo/_src/types/pose.py:63` (`Pose`), but
implemented as an immutable JAX pytree dataclass so it flows through `jit`,
`vmap`, `shard_map` and autodiff unchanged.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from curobo_tpu.math import quaternion as quat_math


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Pose:
    """Batched rigid-body pose.

    Attributes:
      position: (..., 3) float array.
      quaternion: (..., 4) float array, wxyz ordering, unit norm.
    """

    position: jnp.ndarray
    quaternion: jnp.ndarray

    # ---- constructors -------------------------------------------------
    @staticmethod
    def identity(batch_shape=(), dtype=jnp.float32) -> "Pose":
        pos = jnp.zeros(tuple(batch_shape) + (3,), dtype=dtype)
        q = jnp.zeros(tuple(batch_shape) + (4,), dtype=dtype)
        q = q.at[..., 0].set(1.0)
        return Pose(pos, q)

    @staticmethod
    def from_list(vals, dtype=jnp.float32) -> "Pose":
        """[x, y, z, qw, qx, qy, qz] (or batched nested lists)."""
        arr = jnp.asarray(vals, dtype=dtype)
        return Pose(arr[..., :3], quat_math.quat_normalize(arr[..., 3:7]))

    @staticmethod
    def from_matrix(mat: jnp.ndarray) -> "Pose":
        """(..., 4, 4) or (..., 3, 4) homogeneous matrix -> Pose."""
        return Pose(mat[..., :3, 3], quat_math.matrix_to_quat(mat[..., :3, :3]))

    @staticmethod
    def from_rotation(R: jnp.ndarray, p: jnp.ndarray) -> "Pose":
        return Pose(p, quat_math.matrix_to_quat(R))

    # ---- shape ops ----------------------------------------------------
    @property
    def batch_shape(self):
        return self.position.shape[:-1]

    @property
    def shape(self):
        return self.batch_shape

    def reshape(self, *batch_shape) -> "Pose":
        return Pose(
            self.position.reshape(tuple(batch_shape) + (3,)),
            self.quaternion.reshape(tuple(batch_shape) + (4,)),
        )

    def repeat(self, n: int, axis: int = 0) -> "Pose":
        return Pose(
            jnp.repeat(self.position, n, axis=axis),
            jnp.repeat(self.quaternion, n, axis=axis),
        )

    def tile_seeds(self, n_seeds: int) -> "Pose":
        """(B, ...) -> (B, n_seeds, ...) broadcast over a new seed axis."""
        pos = jnp.broadcast_to(
            self.position[:, None], (self.position.shape[0], n_seeds) + self.position.shape[1:]
        )
        q = jnp.broadcast_to(
            self.quaternion[:, None], (self.quaternion.shape[0], n_seeds) + self.quaternion.shape[1:]
        )
        return Pose(pos, q)

    def __getitem__(self, idx) -> "Pose":
        return Pose(self.position[idx], self.quaternion[idx])

    # ---- algebra ------------------------------------------------------
    def multiply(self, other: "Pose") -> "Pose":
        return Pose(
            self.position + quat_math.quat_rotate(self.quaternion, other.position),
            quat_math.quat_normalize(
                quat_math.quat_multiply(self.quaternion, other.quaternion)
            ),
        )

    def inverse(self) -> "Pose":
        q_inv = quat_math.quat_conjugate(self.quaternion)
        return Pose(-quat_math.quat_rotate(q_inv, self.position), q_inv)

    def transform_points(self, pts: jnp.ndarray) -> jnp.ndarray:
        return quat_math.quat_rotate(self.quaternion[..., None, :], pts) + self.position[..., None, :]

    def rotation_matrix(self) -> jnp.ndarray:
        return quat_math.quat_to_matrix(self.quaternion)

    def to_matrix(self) -> jnp.ndarray:
        R = self.rotation_matrix()
        m = jnp.zeros(self.batch_shape + (4, 4), dtype=self.position.dtype)
        m = m.at[..., :3, :3].set(R)
        m = m.at[..., :3, 3].set(self.position)
        m = m.at[..., 3, 3].set(1.0)
        return m

    # ---- metrics ------------------------------------------------------
    def position_error(self, other: "Pose") -> jnp.ndarray:
        return jnp.linalg.norm(self.position - other.position, axis=-1)

    def rotation_error(self, other: "Pose") -> jnp.ndarray:
        return quat_math.quat_geodesic_distance(self.quaternion, other.quaternion)

    def interpolate(self, other: "Pose", t) -> "Pose":
        t = jnp.asarray(t, dtype=self.position.dtype)
        pos = (1.0 - t[..., None]) * self.position + t[..., None] * other.position
        q = quat_math.quat_slerp(self.quaternion, other.quaternion, t[..., None])
        return Pose(pos, q)

    def to_numpy(self) -> np.ndarray:
        return np.concatenate(
            [np.asarray(self.position), np.asarray(self.quaternion)], axis=-1
        )
