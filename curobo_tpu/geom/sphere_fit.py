"""Sphere fitting: approximate a mesh volume with collision spheres.

Parity: reference `fit_spheres_to_mesh` (`curobo/_src/geom/sphere_fit/
fit_spheres.py:220`), voxel init (`fit_voxel.py`) and the MorphIt Adam
optimizer (`fit_morphit.py` — coverage/outside/tangency/overlap losses).
Mesh queries use the baked SDF grid (geom/mesh.py) instead of Warp BVH
queries — same losses, TPU-native evaluation.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from curobo_tpu.geom import types as gt
from curobo_tpu.geom.mesh import mesh_to_sdf_grid
from curobo_tpu.geom.sdf import sample_voxel_grid

_BIG_DIAG = 1.0e6  # masks the self-pair in nearest-neighbor reductions


@dataclasses.dataclass(frozen=True)
class SphereFitConfig:
    n_spheres: int = 16
    n_iters: int = 200
    learning_rate: float = 1e-2
    # loss weights (MorphIt-style)
    outside_weight: float = 10.0  # spheres must stay inside the mesh
    coverage_weight: float = 1.0  # surface samples should be inside a sphere
    overlap_weight: float = 0.1  # discourage redundant spheres
    tangency_weight: float = 0.05  # neighbors should touch (no gaps)
    min_radius: float = 0.005


def voxel_init(
    sdf: np.ndarray, origin: np.ndarray, cell: float, n_spheres: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Greedy deepest-voxel seeding (parity: fit_voxel.py)."""
    s = sdf.copy()
    centers = []
    radii = []
    for _ in range(n_spheres):
        idx = np.unravel_index(np.argmin(s), s.shape)
        r = -s[idx]
        if r <= 0:
            idx = np.unravel_index(np.argmax(-s), s.shape)
            r = max(-s[idx], cell)
        c = origin + np.asarray(idx) * cell
        centers.append(c)
        radii.append(max(r, cell))
        # suppress the covered neighborhood
        grid_idx = np.stack(
            np.meshgrid(*[np.arange(n) for n in s.shape], indexing="ij"), axis=-1
        )
        d = np.linalg.norm((grid_idx - np.asarray(idx)) * cell, axis=-1)
        s = np.where(d < r, 1.0e6, s)
    return np.asarray(centers, dtype=np.float32), np.asarray(radii, dtype=np.float32)


def fit_spheres_to_mesh(
    mesh: gt.MeshObstacle, cfg: SphereFitConfig = SphereFitConfig()
) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (centers (K, 3), radii (K,)) in the mesh's local frame."""
    sdf_grid, origin, cell = mesh_to_sdf_grid(mesh)
    centers0, radii0 = voxel_init(sdf_grid, origin, cell, cfg.n_spheres)

    grid = jnp.asarray(sdf_grid)
    org = jnp.asarray(origin)

    # surface samples for the coverage loss: voxels near sdf=0
    near = np.argwhere(np.abs(sdf_grid) < cell)
    if len(near) > 512:
        near = near[np.random.RandomState(0).choice(len(near), 512, replace=False)]
    surf = jnp.asarray(origin + near * cell, dtype=jnp.float32)

    def loss(params):
        c, r_raw = params
        r = jnp.maximum(r_raw, cfg.min_radius)
        sd = sample_voxel_grid(grid, c, org, cell, outside_value=1.0)
        # outside loss: sphere must fit inside the mesh: sdf(c) <= -r
        outside = jnp.maximum(sd + r, 0.0)
        l_out = jnp.sum(outside**2)
        # coverage: each surface sample close to some sphere surface
        # (safe norm: NaN-free gradient when a sample coincides with a center)
        d = jnp.sqrt(jnp.sum((surf[:, None] - c[None]) ** 2, axis=-1) + 1e-12) - r[None]
        l_cov = jnp.sum(jnp.maximum(jnp.min(d, axis=-1), 0.0) ** 2)
        # overlap: penalize deeply contained sphere pairs (mask the diagonal)
        cc = jnp.sqrt(jnp.sum((c[:, None] - c[None]) ** 2, axis=-1) + 1e-12)
        contained = jnp.maximum(r[:, None] - (cc + r[None]), 0.0)
        contained = contained * (1.0 - jnp.eye(contained.shape[0], dtype=contained.dtype))
        l_ov = jnp.sum(contained**2) / 2.0
        # tangency (MorphIt): each sphere's nearest neighbor should touch
        # it — penalize the gap to the closest other sphere's surface
        K = cc.shape[0]
        gap = cc - (r[:, None] + r[None])
        gap = gap + _BIG_DIAG * jnp.eye(K, dtype=gap.dtype)
        l_tan = jnp.sum(jnp.maximum(jnp.min(gap, axis=-1), 0.0) ** 2)
        return (
            cfg.outside_weight * l_out
            + cfg.coverage_weight * l_cov
            + cfg.overlap_weight * l_ov
            + cfg.tangency_weight * l_tan
        )

    params = (jnp.asarray(centers0), jnp.asarray(radii0))
    opt = optax.adam(cfg.learning_rate)
    state = opt.init(params)

    @jax.jit
    def step(params, state):
        g = jax.grad(loss)(params)
        upd, state = opt.update(g, state)
        return optax.apply_updates(params, upd), state

    for _ in range(cfg.n_iters):
        params, state = step(params, state)

    c, r_raw = params
    r = jnp.maximum(r_raw, cfg.min_radius)
    return np.asarray(c), np.asarray(r)


def estimate_sphere_count(mesh: gt.MeshObstacle, target_ratio: float = 0.02) -> int:
    """Heuristic sphere budget from mesh extents vs voxel size."""
    sdf_grid, _, cell = mesh_to_sdf_grid(mesh)
    interior = int((sdf_grid < 0).sum())
    return int(np.clip(interior * target_ratio, 1, 64))
