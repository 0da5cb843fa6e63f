"""Object pose estimation from point clouds against a mesh SDF.

Parity: reference `PoseDetector` (`curobo/_src/perception/pose_estimation/
pose_detector.py:27`, sampling-based) and `SDFPoseDetector`
(`sdf_pose_detector.py:110` — LM refinement over mesh-SDF residuals,
`optim_pose_lm.py`). Mesh queries use the baked SDF voxel grid
(`geom/mesh.py`) sampled trilinearly — the Warp mesh-query kernels
(`wp_mesh_sdf_alignment.py`) become pure gathers.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from curobo_tpu.geom import types as gt
from curobo_tpu.geom.mesh import mesh_to_sdf_grid
from curobo_tpu.geom.sdf import sample_voxel_grid
from curobo_tpu.math import quaternion as qm
from curobo_tpu.types.pose import Pose


@dataclasses.dataclass(frozen=True)
class PoseEstimationConfig:
    n_iters: int = 30
    damping: float = 1e-2
    step_clip: float = 0.1
    # sampling-based init
    n_orientation_samples: int = 32


class SDFPoseDetector:
    """LM pose refinement: minimize sum sdf(T^-1 p_i)^2 over the object pose."""

    def __init__(self, mesh: gt.MeshObstacle, cfg: PoseEstimationConfig = PoseEstimationConfig()):
        self.cfg = cfg
        sdf_grid, origin, cell = mesh_to_sdf_grid(mesh)
        self._grid = jnp.asarray(sdf_grid)
        self._origin = jnp.asarray(origin)
        self._cell = float(cell)
        self._refine_jit = jax.jit(self._refine)

    # ------------------------------------------------------------------
    def _residuals(self, pos, quat, points):
        """|sdf| at object-local coordinates of the observed points."""
        q_inv = qm.quat_conjugate(quat)
        local = qm.quat_rotate(q_inv[..., None, :], points - pos[..., None, :])
        return sample_voxel_grid(
            self._grid, local, self._origin, self._cell, outside_value=0.3
        )

    def _apply_delta(self, pos, quat, delta):
        """delta (..., 6): [translation, rotation-vector] left-applied."""
        dpos = delta[..., :3]
        rv = delta[..., 3:]
        angle = jnp.sqrt(jnp.sum(rv * rv, axis=-1) + 1e-12)
        axis = rv / angle[..., None]
        dq = qm.quat_from_axis_angle(axis, angle)
        return pos + dpos, qm.quat_normalize(qm.quat_multiply(dq, quat))

    def _refine(self, pos0, quat0, points):
        cfg = self.cfg

        def body(_, carry):
            pos, quat, damping, best = carry
            best_pos, best_quat, best_c = best

            def res_of_delta(delta):
                p, q = self._apply_delta(pos, quat, delta)
                return self._residuals(p, q, points)

            zero = jnp.zeros(pos.shape[:-1] + (6,), pos.dtype)
            r = res_of_delta(zero)  # (..., N)
            c = jnp.mean(r * r, axis=-1)
            # Jacobian wrt the 6 delta params via forward-mode (6 JVPs,
            # batched over leading pose dims)
            cols = []
            for k in range(6):
                tangent = jnp.zeros_like(zero).at[..., k].set(1.0)
                _, jv = jax.jvp(res_of_delta, (zero,), (tangent,))
                cols.append(jv)
            J = jnp.stack(cols, axis=-1)  # (..., N, 6)

            JtJ = jnp.einsum("...ni,...nj->...ij", J, J)
            b = -jnp.einsum("...ni,...n->...i", J, r)
            A = JtJ + damping[..., None, None] * jnp.eye(6, dtype=pos.dtype)
            L = jnp.linalg.cholesky(A)
            delta = jax.scipy.linalg.cho_solve((L, True), b[..., None])[..., 0]
            dn = jnp.max(jnp.abs(delta), axis=-1, keepdims=True)
            delta = delta * jnp.minimum(1.0, cfg.step_clip / jnp.maximum(dn, 1e-9))

            pos_n, quat_n = self._apply_delta(pos, quat, delta)
            r_n = self._residuals(pos_n, quat_n, points)
            c_n = jnp.mean(r_n * r_n, axis=-1)
            improved = c_n < c
            pos = jnp.where(improved[..., None], pos_n, pos)
            quat = jnp.where(improved[..., None], quat_n, quat)
            damping = jnp.where(improved, damping * 0.5, damping * 2.0)
            damping = jnp.clip(damping, 1e-6, 1e3)
            better = c_n < best_c
            best = (
                jnp.where(better[..., None], pos_n, best_pos),
                jnp.where(better[..., None], quat_n, best_quat),
                jnp.minimum(c_n, best_c),
            )
            return pos, quat, damping, best

        r0 = self._residuals(pos0, quat0, points)
        c0 = jnp.mean(r0 * r0, axis=-1)
        damping0 = jnp.full(pos0.shape[:-1], cfg.damping, pos0.dtype)
        carry = (pos0, quat0, damping0, (pos0, quat0, c0))
        carry = jax.lax.fori_loop(0, cfg.n_iters, body, carry)
        best_pos, best_quat, best_c = carry[3]
        return best_pos, best_quat, best_c

    # ------------------------------------------------------------------
    def refine(self, pose0: Pose, points: jnp.ndarray) -> Tuple[Pose, jnp.ndarray]:
        """Refine pose(s) against world points (..., N, 3).

        Returns (refined Pose, rms residual (...,)).
        """
        pos, quat, c = self._refine_jit(pose0.position, pose0.quaternion, points)
        return Pose(pos, quat), jnp.sqrt(c)

    def detect(
        self, points: jnp.ndarray, position_hint: jnp.ndarray, key=None
    ) -> Tuple[Pose, jnp.ndarray]:
        """Sampling-based init (orientation fan) + refinement.

        Parity: reference `PoseDetector` sampling strategy.
        """
        cfg = self.cfg
        if key is None:
            key = jax.random.PRNGKey(0)
        n = cfg.n_orientation_samples
        quats = qm.quat_normalize(jax.random.normal(key, (n, 4)))
        pos = jnp.broadcast_to(position_hint, (n, 3))
        pose, res = self.refine(Pose(pos, quats), points[None])
        best = jnp.argmin(res)
        return Pose(pose.position[best], pose.quaternion[best]), res[best]
