"""Robot-vs-scene collision convenience API + attachment manager.

Parity: reference `RobotSceneCollision`
(`curobo/_src/collision/collision_robot_scene.py:26` — joint-space distance
queries, batched sample/validate) and `AttachmentManager`
(`attachment_manager.py:24` — attach/detach objects as extra link spheres).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from curobo_tpu.geom import world as world_mod
from curobo_tpu.geom.self_collision import self_collision_distance
from curobo_tpu.robot import kinematics as kin_mod
from curobo_tpu.robot.params import KinematicsParams
from curobo_tpu.util.sampling import halton_sequence


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class CollisionQueryResult:
    """Per-config distances (parity: reference distance query outputs)."""

    scene_clearance: jnp.ndarray  # (...,) min signed clearance to the world
    self_violation: jnp.ndarray  # (...,) max self-collision violation (0 = clear)
    in_collision: jnp.ndarray  # (...,) bool (scene or self)
    out_of_bounds: jnp.ndarray  # (...,) bool
    valid: jnp.ndarray  # (...,) bool: collision-free and inside limits


class RobotSceneCollision:
    """Joint-space collision queries against a world."""

    def __init__(self, params: KinematicsParams, margin: float = 0.0):
        self.params = params
        self.margin = margin
        self._query_jit = jax.jit(self._query)

    def _query(self, world: world_mod.WorldData, q: jnp.ndarray) -> CollisionQueryResult:
        p = self.params
        st = kin_mod.compute_kinematics(p, q)
        clear = world_mod.sphere_clearance(world, st.spheres)
        live = st.spheres[..., 3] >= 0
        min_clear = jnp.min(jnp.where(live, clear, 1.0e6), axis=-1)
        self_v = self_collision_distance(p.self_collision, st.spheres)
        lim = p.joint_limits
        oob = jnp.any((q < lim.lower) | (q > lim.upper), axis=-1)
        in_col = (min_clear < self.margin) | (self_v > 0)
        return CollisionQueryResult(
            scene_clearance=min_clear,
            self_violation=self_v,
            in_collision=in_col,
            out_of_bounds=oob,
            valid=~(in_col | oob),
        )

    def query(self, world: world_mod.WorldData, q: jnp.ndarray) -> CollisionQueryResult:
        """q (..., D) -> per-config result (trajectories fold into batch)."""
        return self._query_jit(world.anonymized(), q)

    def validate(self, world: world_mod.WorldData, q: jnp.ndarray) -> jnp.ndarray:
        """Parity: reference `validate:341` — bool per config."""
        return self.query(world, q).valid

    def validate_trajectory(
        self, world: world_mod.WorldData, traj_q: jnp.ndarray, substeps: int = 4
    ) -> jnp.ndarray:
        """(..., H, D) -> (...,) bool: every step + interpolated substeps clear."""
        prev = jnp.concatenate([traj_q[..., :1, :], traj_q[..., :-1, :]], axis=-2)
        alphas = jnp.linspace(1.0 / substeps, 1.0, substeps)
        interp = (
            prev[..., None, :, :] * (1 - alphas[:, None, None])
            + traj_q[..., None, :, :] * alphas[:, None, None]
        )  # (..., K, H, D)
        ok = self.query(world, interp).valid
        return jnp.all(jnp.all(ok, axis=-1), axis=-1)

    def sample(
        self,
        world: world_mod.WorldData,
        n: int,
        key: Optional[jax.Array] = None,
        max_attempts: int = 10,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Collision-free config sampling (parity: `sample:314`).

        Returns (configs (n, D), valid (n,)): Halton-sampled configs with a
        validity mask; callers filter/re-draw as needed.
        """
        p = self.params
        lo = np.asarray(p.joint_limits.lower)
        hi = np.asarray(p.joint_limits.upper)
        lo_c = np.maximum(lo, -np.pi)
        hi_c = np.minimum(hi, np.pi)
        out = np.zeros((n, p.n_dof), dtype=np.float32)
        ok = np.zeros(n, dtype=bool)
        skip = 11
        got = 0
        for attempt in range(max_attempts):
            h = halton_sequence(n, p.n_dof, skip=skip + attempt * n)
            q = jnp.asarray(lo_c + (hi_c - lo_c) * h, dtype=jnp.float32)
            valid = np.asarray(self.validate(world, q))
            take = np.where(valid)[0]
            k = min(len(take), n - got)
            out[got : got + k] = np.asarray(q)[take[:k]]
            ok[got : got + k] = True
            got += k
            if got >= n:
                break
        return jnp.asarray(out), jnp.asarray(ok)


class AttachmentManager:
    """Attach/detach grasped objects as extra collision spheres.

    Parity: reference `AttachmentManager` (`attachment_manager.py:24`,
    `fit_spheres:63`). The robot model reserves disabled placeholder
    spheres on designated links (``extra_collision_spheres`` in the robot
    YAML); attaching fills them functionally (no recompiles).
    """

    def __init__(self, params: KinematicsParams, link_name: str = "attached_object"):
        self.base_params = params
        self.link_name = link_name
        li = params.link_names.index(link_name)
        self._slots = [
            i for i, l in enumerate(params.sphere_link_idx) if l == li
        ]
        if not self._slots:
            raise ValueError(
                f"link {link_name!r} has no reserved collision sphere slots"
            )

    @property
    def n_slots(self) -> int:
        return len(self._slots)

    def attach_spheres(
        self, params: KinematicsParams, centers: jnp.ndarray, radii: jnp.ndarray
    ) -> KinematicsParams:
        """centers (K, 3) in the attach-link frame, radii (K,) with
        K <= n_slots. Returns updated params."""
        K = centers.shape[0]
        if K > len(self._slots):
            raise ValueError(f"{K} spheres > {len(self._slots)} reserved slots")
        idx = jnp.asarray(self._slots[:K], dtype=jnp.int32)
        c = params.sphere_centers.at[idx].set(centers)
        r = params.sphere_radii.at[idx].set(radii)
        params = params.update_spheres(c, r)
        return dataclasses.replace(
            params, self_collision=params.self_collision.recompute_margins(r)
        )

    def attach_box(
        self, params: KinematicsParams, half_dims, offset=(0.0, 0.0, 0.0)
    ) -> KinematicsParams:
        """Approximate a box payload with the reserved spheres along its
        longest axis (cheap sphere fit)."""
        h = np.asarray(half_dims, dtype=np.float32)
        n = len(self._slots)
        axis = int(np.argmax(h))
        r = float(np.sqrt(sum(h[i] ** 2 for i in range(3) if i != axis) + 1e-12))
        span = max(h[axis] - r, 0.0)
        ts = np.linspace(-span, span, n) if n > 1 else np.zeros(1)
        centers = np.tile(np.asarray(offset, dtype=np.float32), (n, 1))
        centers[:, axis] += ts
        return self.attach_spheres(
            params, jnp.asarray(centers), jnp.full((n,), r, dtype=jnp.float32)
        )

    def detach(self, params: KinematicsParams) -> KinematicsParams:
        idx = jnp.asarray(self._slots, dtype=jnp.int32)
        c = params.sphere_centers.at[idx].set(0.0)
        r = params.sphere_radii.at[idx].set(-10.0)
        params = params.update_spheres(c, r)
        return dataclasses.replace(
            params, self_collision=params.self_collision.recompute_margins(r)
        )
