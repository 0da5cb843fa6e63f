"""Device-side collision world: fixed-shape obstacle arrays + batched queries.

Parity: reference `curobo/_src/geom/data/` (per-type GPU stores) and
`curobo/_src/geom/collision/collision_scene.py:61` (`SceneCollision`).

TPU design: every obstacle type is a padded struct-of-arrays with an
``enabled`` mask, so one fused einsum/elementwise pass evaluates all robot
spheres against all obstacles of a type — no per-obstacle kernel launches,
no dynamic shapes. The Warp function-overload dispatch of the reference
(`wp_collision_kernel.py:70`) becomes a static Python loop over obstacle
types at trace time.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from curobo_tpu.geom import sdf as sdf_mod
from curobo_tpu.geom import types as gt
from curobo_tpu.math import quaternion as qm

BIG = 1.0e6


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class CuboidData:
    rot: jnp.ndarray  # (N, 3, 3) obstacle->world
    pos: jnp.ndarray  # (N, 3)
    half_dims: jnp.ndarray  # (N, 3)
    enabled: jnp.ndarray  # (N,) float 0/1
    names: Tuple[str, ...] = dataclasses.field(metadata=dict(static=True))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SphereData:
    center: jnp.ndarray  # (N, 3)
    radius: jnp.ndarray  # (N,)
    enabled: jnp.ndarray
    names: Tuple[str, ...] = dataclasses.field(metadata=dict(static=True))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class CapsuleData:
    rot: jnp.ndarray
    pos: jnp.ndarray
    base: jnp.ndarray  # (N, 3) local endpoint
    tip: jnp.ndarray  # (N, 3) local endpoint
    radius: jnp.ndarray
    enabled: jnp.ndarray
    names: Tuple[str, ...] = dataclasses.field(metadata=dict(static=True))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class CylinderData:
    rot: jnp.ndarray
    pos: jnp.ndarray
    radius: jnp.ndarray
    half_height: jnp.ndarray
    enabled: jnp.ndarray
    names: Tuple[str, ...] = dataclasses.field(metadata=dict(static=True))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class VoxelGridData:
    """Dense SDF grid in HBM (ESDF worlds, baked meshes).

    ``data[x, y, z]`` = signed distance at voxel center; ``origin`` is the
    grid-frame position of voxel (0,0,0)'s center; pose maps grid->world.
    """

    rot: jnp.ndarray  # (3, 3)
    pos: jnp.ndarray  # (3,)
    origin: jnp.ndarray  # (3,)
    cell_size: jnp.ndarray  # () scalar
    data: jnp.ndarray  # (X, Y, Z)
    enabled: jnp.ndarray  # () scalar 0/1
    name: str = dataclasses.field(metadata=dict(static=True))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class WorldData:
    cuboids: CuboidData
    spheres: SphereData
    capsules: CapsuleData
    cylinders: CylinderData
    voxel_grids: Tuple[VoxelGridData, ...]

    def anonymized(self) -> "WorldData":
        """Copy with all obstacle-name metadata blanked.

        Names are STATIC pytree metadata, so every distinct name set is a
        distinct `jax.jit` cache key: without this, two worlds with
        identical array shapes but different obstacle names recompile the
        whole solve (minutes on TPU; observed as one 400 s motion-bench
        outlier per new cuboid-count). Solvers call this at every jit
        boundary; name-keyed APIs (`update_obstacle_pose`, ...) operate on
        the original."""
        anon = dataclasses.replace(
            self,
            cuboids=dataclasses.replace(self.cuboids, names=()),
            spheres=dataclasses.replace(self.spheres, names=()),
            capsules=dataclasses.replace(self.capsules, names=()),
            cylinders=dataclasses.replace(self.cylinders, names=()),
            voxel_grids=tuple(
                dataclasses.replace(vg, name="") for vg in self.voxel_grids
            ),
        )
        return anon

    # -- functional updates --------------------------------------------
    def _type_of(self, name: str):
        for field in ("cuboids", "spheres", "capsules", "cylinders"):
            store = getattr(self, field)
            if name in store.names:
                return field, store.names.index(name)
        for i, vg in enumerate(self.voxel_grids):
            if vg.name == name:
                return "voxel_grids", i
        raise ValueError(f"obstacle {name!r} not in world")

    def update_obstacle_pose(self, name: str, position, quaternion) -> "WorldData":
        field, idx = self._type_of(name)
        R = qm.quat_to_matrix(jnp.asarray(quaternion))
        p = jnp.asarray(position)
        if field == "voxel_grids":
            vg = dataclasses.replace(self.voxel_grids[idx], rot=R, pos=p)
            grids = self.voxel_grids[:idx] + (vg,) + self.voxel_grids[idx + 1 :]
            return dataclasses.replace(self, voxel_grids=grids)
        store = getattr(self, field)
        if field == "spheres":
            store = dataclasses.replace(store, center=store.center.at[idx].set(p))
        else:
            store = dataclasses.replace(
                store, rot=store.rot.at[idx].set(R), pos=store.pos.at[idx].set(p)
            )
        return dataclasses.replace(self, **{field: store})

    def enable_obstacle(self, name: str, enabled: bool) -> "WorldData":
        field, idx = self._type_of(name)
        val = jnp.asarray(1.0 if enabled else 0.0)
        if field == "voxel_grids":
            vg = dataclasses.replace(self.voxel_grids[idx], enabled=val)
            grids = self.voxel_grids[:idx] + (vg,) + self.voxel_grids[idx + 1 :]
            return dataclasses.replace(self, voxel_grids=grids)
        store = getattr(self, field)
        store = dataclasses.replace(store, enabled=store.enabled.at[idx].set(val))
        return dataclasses.replace(self, **{field: store})

    def update_voxel_data(self, name: str, data: jnp.ndarray) -> "WorldData":
        """Swap the SDF contents of a voxel grid (perception feed path).

        Parity: reference `SceneCollision.update_voxel_data`
        (`collision_scene.py:459`).
        """
        field, idx = self._type_of(name)
        if field != "voxel_grids":
            raise ValueError(f"{name!r} is not a voxel grid")
        vg = self.voxel_grids[idx]
        if data.shape != vg.data.shape:
            raise ValueError(
                f"voxel data shape {data.shape} != grid shape {vg.data.shape}"
            )
        vg = dataclasses.replace(vg, data=data)
        grids = self.voxel_grids[:idx] + (vg,) + self.voxel_grids[idx + 1 :]
        return dataclasses.replace(self, voxel_grids=grids)


# ---------------------------------------------------------------------------
# Scene -> WorldData compilation
# ---------------------------------------------------------------------------
def _pose_Rp(pose) -> Tuple[np.ndarray, np.ndarray]:
    # pure host math: an eager jax op here dispatches to the (possibly
    # remote) device per OBSTACLE — measured 380 s per compile_scene
    # through the axon tunnel
    pose = np.asarray(pose, dtype=np.float32)
    w, x, y, z = pose[3:7] / max(np.linalg.norm(pose[3:7]), 1e-9)
    R = np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
            [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
            [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
        ],
        dtype=np.float32,
    )
    return R, pose[:3]


def _pad(n: int, cap: Optional[int]) -> int:
    if cap is not None:
        if cap < n:
            raise ValueError(f"capacity {cap} < obstacle count {n}")
        return cap
    return n


def compile_scene(
    scene: gt.Scene,
    capacities: Optional[Dict[str, int]] = None,
    dtype=jnp.float32,
) -> WorldData:
    """Bake a host Scene into the fixed-shape device world.

    ``capacities`` optionally over-allocates per type ({"cuboid": 32, ...})
    so obstacles can be added later by enabling padded slots without a
    recompile.
    """
    caps = capacities or {}

    def pads(lst, cap_key):
        n = len(lst)
        return lst, _pad(n, caps.get(cap_key))

    # Cuboids
    cubs, n_cub = pads(scene.by_type(gt.Cuboid), "cuboid")
    rot = np.tile(np.eye(3, dtype=np.float32), (n_cub, 1, 1))
    pos = np.full((n_cub, 3), BIG, dtype=np.float32)
    half = np.full((n_cub, 3), 0.01, dtype=np.float32)
    en = np.zeros((n_cub,), dtype=np.float32)
    names = []
    for i, o in enumerate(cubs):
        rot[i], pos[i] = _pose_Rp(o.pose)
        half[i] = np.asarray(o.dims, dtype=np.float32) / 2.0
        en[i] = float(o.enabled)
        names.append(o.name)
    names += [f"_cuboid_slot_{i}" for i in range(len(cubs), n_cub)]
    cuboids = CuboidData(
        jnp.asarray(rot, dtype), jnp.asarray(pos, dtype), jnp.asarray(half, dtype),
        jnp.asarray(en, dtype), tuple(names),
    )

    # Spheres
    sphs, n_sph = pads(scene.by_type(gt.SphereObstacle), "sphere")
    c = np.full((n_sph, 3), BIG, dtype=np.float32)
    r = np.full((n_sph,), 0.01, dtype=np.float32)
    en = np.zeros((n_sph,), dtype=np.float32)
    names = []
    for i, o in enumerate(sphs):
        _, c[i] = _pose_Rp(o.pose)
        r[i] = o.radius
        en[i] = float(o.enabled)
        names.append(o.name)
    names += [f"_sphere_slot_{i}" for i in range(len(sphs), n_sph)]
    spheres = SphereData(
        jnp.asarray(c, dtype), jnp.asarray(r, dtype), jnp.asarray(en, dtype), tuple(names)
    )

    # Capsules
    capsl, n_cap = pads(scene.by_type(gt.Capsule), "capsule")
    rot = np.tile(np.eye(3, dtype=np.float32), (n_cap, 1, 1))
    pos = np.full((n_cap, 3), BIG, dtype=np.float32)
    base = np.zeros((n_cap, 3), dtype=np.float32)
    tip = np.tile(np.asarray([0, 0, 0.01], dtype=np.float32), (n_cap, 1))
    r = np.full((n_cap,), 0.01, dtype=np.float32)
    en = np.zeros((n_cap,), dtype=np.float32)
    names = []
    for i, o in enumerate(capsl):
        rot[i], pos[i] = _pose_Rp(o.pose)
        base[i] = np.asarray(o.base, dtype=np.float32)
        tip[i] = np.asarray(o.tip, dtype=np.float32)
        r[i] = o.radius
        en[i] = float(o.enabled)
        names.append(o.name)
    names += [f"_capsule_slot_{i}" for i in range(len(capsl), n_cap)]
    capsules = CapsuleData(
        jnp.asarray(rot, dtype), jnp.asarray(pos, dtype), jnp.asarray(base, dtype),
        jnp.asarray(tip, dtype), jnp.asarray(r, dtype), jnp.asarray(en, dtype), tuple(names),
    )

    # Cylinders
    cyls, n_cyl = pads(scene.by_type(gt.Cylinder), "cylinder")
    rot = np.tile(np.eye(3, dtype=np.float32), (n_cyl, 1, 1))
    pos = np.full((n_cyl, 3), BIG, dtype=np.float32)
    r = np.full((n_cyl,), 0.01, dtype=np.float32)
    hh = np.full((n_cyl,), 0.01, dtype=np.float32)
    en = np.zeros((n_cyl,), dtype=np.float32)
    names = []
    for i, o in enumerate(cyls):
        rot[i], pos[i] = _pose_Rp(o.pose)
        r[i] = o.radius
        hh[i] = o.height / 2.0
        en[i] = float(o.enabled)
        names.append(o.name)
    names += [f"_cylinder_slot_{i}" for i in range(len(cyls), n_cyl)]
    cylinders = CylinderData(
        jnp.asarray(rot, dtype), jnp.asarray(pos, dtype), jnp.asarray(r, dtype),
        jnp.asarray(hh, dtype), jnp.asarray(en, dtype), tuple(names),
    )

    # Voxel grids (+ meshes baked to voxel SDFs)
    grids: List[VoxelGridData] = []
    for o in scene.by_type(gt.VoxelGridObstacle):
        R, p = _pose_Rp(o.pose)
        shape = tuple(
            int(round(d / o.voxel_size)) for d in o.dims
        )
        data = (
            np.asarray(o.data, dtype=np.float32)
            if o.data is not None
            else np.full(shape, 10.0, dtype=np.float32)
        )
        # grid centred on the obstacle pose
        origin = -(np.asarray(o.dims, dtype=np.float32) / 2.0) + o.voxel_size / 2.0
        grids.append(
            VoxelGridData(
                jnp.asarray(R, dtype), jnp.asarray(p, dtype), jnp.asarray(origin, dtype),
                jnp.asarray(o.voxel_size, dtype), jnp.asarray(data, dtype),
                jnp.asarray(float(o.enabled), dtype), o.name,
            )
        )
    for o in scene.by_type(gt.MeshObstacle):
        from curobo_tpu.geom.mesh import mesh_to_sdf_grid

        sdf_grid, origin, cell = mesh_to_sdf_grid(o)
        R, p = _pose_Rp(o.pose)
        grids.append(
            VoxelGridData(
                jnp.asarray(R, dtype), jnp.asarray(p, dtype), jnp.asarray(origin, dtype),
                jnp.asarray(cell, dtype), jnp.asarray(sdf_grid, dtype),
                jnp.asarray(float(o.enabled), dtype), o.name,
            )
        )
    # Point clouds bake to voxel SDFs too (reference `geom/types.py:736`).
    for o in scene.by_type(gt.PointCloudObstacle):
        from curobo_tpu.geom.mesh import points_to_sdf_grid

        sdf_grid, origin, cell = points_to_sdf_grid(o)
        R, p = _pose_Rp(o.pose)
        grids.append(
            VoxelGridData(
                jnp.asarray(R, dtype), jnp.asarray(p, dtype), jnp.asarray(origin, dtype),
                jnp.asarray(cell, dtype), jnp.asarray(sdf_grid, dtype),
                jnp.asarray(float(o.enabled), dtype), o.name,
            )
        )

    return WorldData(cuboids, spheres, capsules, cylinders, tuple(grids))


def empty_world() -> WorldData:
    return compile_scene(gt.Scene())


def stack_worlds(worlds: Sequence[WorldData]) -> WorldData:
    """Stack per-environment worlds along a leading env axis.

    Parity: the reference's multi-env obstacle sets routed by
    `env_query_idx` (`collision_scene.py:37-60`, SolveMode.MULTI_ENV).
    All worlds must share capacities (compile the scenes with the same
    ``capacities`` argument). Query by gathering per-problem environments:
    ``env_world = jax.tree.map(lambda a: a[env_idx], stacked)`` and vmap the
    rollout over the problem axis (see RobotRollout.evaluate_config_env).
    """
    w0 = worlds[0]
    leaves0, treedef = jax.tree.flatten(w0)
    all_leaves = [leaves0]
    for w in worlds[1:]:
        leaves, _ = jax.tree.flatten(w)
        if len(leaves) != len(leaves0) or any(
            a.shape != b.shape for a, b in zip(leaves, leaves0)
        ):
            raise ValueError(
                "worlds must share obstacle capacities/types to stack "
                "(compile with the same `capacities`)"
            )
        all_leaves.append(leaves)
    stacked = [jnp.stack(xs) for xs in zip(*all_leaves)]
    # obstacle names (static metadata) are taken from worlds[0]
    return jax.tree.unflatten(treedef, stacked)


# ---------------------------------------------------------------------------
# Queries
# ---------------------------------------------------------------------------
def sphere_sdf(world: WorldData, x: jnp.ndarray) -> jnp.ndarray:
    """Min signed distance from query points to all obstacles.

    x: (..., S, 3) -> (..., S). Fully differentiable; disabled/padded
    obstacles contribute +BIG.
    """
    parts = []

    if world.cuboids.pos.shape[0] > 0:
        cb = world.cuboids
        # (..., S, N, 3) local points
        xl = jnp.einsum("nji,...sj->...sni", cb.rot, x - 0) - jnp.einsum(
            "nji,nj->ni", cb.rot, cb.pos
        )
        # NOTE: above combines R^T x - R^T p; einsum keeps it fused.
        d = sdf_mod.sdf_box(xl, cb.half_dims)
        parts.append(jnp.where(cb.enabled > 0, d, BIG))

    if world.spheres.center.shape[0] > 0:
        sp = world.spheres
        d = sdf_mod.sdf_sphere(x[..., None, :], sp.center, sp.radius[..., :])
        parts.append(jnp.where(sp.enabled > 0, d, BIG))

    if world.capsules.pos.shape[0] > 0:
        cp = world.capsules
        a = jnp.einsum("nij,nj->ni", cp.rot, cp.base) + cp.pos
        b = jnp.einsum("nij,nj->ni", cp.rot, cp.tip) + cp.pos
        d = sdf_mod.sdf_capsule(x[..., None, :], a, b, cp.radius)
        parts.append(jnp.where(cp.enabled > 0, d, BIG))

    if world.cylinders.pos.shape[0] > 0:
        cy = world.cylinders
        xl = jnp.einsum("nji,...snj->...sni", cy.rot, x[..., None, :] - cy.pos)
        d = sdf_mod.sdf_cylinder(xl, cy.radius, cy.half_height)
        parts.append(jnp.where(cy.enabled > 0, d, BIG))

    for vg in world.voxel_grids:
        xl = jnp.einsum("ji,...sj->...si", vg.rot, x - vg.pos)
        d = sdf_mod.sample_voxel_grid(vg.data, xl, vg.origin, vg.cell_size, outside_value=10.0)
        parts.append(jnp.where(vg.enabled > 0, d, BIG)[..., None])

    if not parts:
        return jnp.full(x.shape[:-1], BIG, dtype=x.dtype)
    all_d = jnp.concatenate(parts, axis=-1)  # (..., S, N_total)
    return jnp.min(all_d, axis=-1)


def sphere_clearance(world: WorldData, spheres: jnp.ndarray) -> jnp.ndarray:
    """Signed clearance (sdf - radius) for robot spheres (..., S, 4)."""
    return sphere_sdf(world, spheres[..., :3]) - spheres[..., 3]


def collision_cost(
    world: WorldData, spheres: jnp.ndarray, activation_distance: float = 0.025
) -> jnp.ndarray:
    """Per-sphere activated penetration cost (..., S).

    cost = max(0, activation + radius - sdf); zero when the sphere is more
    than ``activation_distance`` clear of every obstacle. Matches the
    reference's activated-distance semantics
    (`geom/collision/wp_collision_kernel.py:70`).
    """
    clearance = sphere_clearance(world, spheres)
    # Disabled robot spheres (negative radius placeholders) contribute 0.
    live = spheres[..., 3] >= 0
    return jnp.where(live, jnp.maximum(0.0, activation_distance - clearance), 0.0)
