"""Analytic signed-distance primitives + voxel-grid sampling (pure jnp).

Convention: sdf(x) > 0 outside the obstacle, < 0 inside (distance to the
surface). All functions are batched over arbitrary leading dims and fully
differentiable (costs get gradients via autodiff — replaces the hand-written
gradient accumulation in the reference's Warp SDF kernels,
`curobo/_src/geom/data/data_cuboid.py:461`, `data_voxel.py:791`).
"""

from __future__ import annotations

import jax.numpy as jnp


def _safe_norm(v: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """norm with finite gradient at 0 (NaN-safe for points inside shapes)."""
    return jnp.sqrt(jnp.sum(v * v, axis=-1) + eps)


def sdf_box(x_local: jnp.ndarray, half_dims: jnp.ndarray) -> jnp.ndarray:
    """Box centred at origin. x_local (..., 3), half_dims (..., 3) -> (...)."""
    q = jnp.abs(x_local) - half_dims
    outside = _safe_norm(jnp.maximum(q, 0.0))
    inside = jnp.minimum(jnp.max(q, axis=-1), 0.0)
    return outside + inside


def sdf_sphere(x: jnp.ndarray, center: jnp.ndarray, radius: jnp.ndarray) -> jnp.ndarray:
    return _safe_norm(x - center) - radius


def sdf_capsule(
    x: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray, radius: jnp.ndarray
) -> jnp.ndarray:
    """Capsule with world-space endpoints a, b and given radius."""
    pa = x - a
    ba = b - a
    denom = jnp.maximum(jnp.sum(ba * ba, axis=-1), 1e-12)
    h = jnp.clip(jnp.sum(pa * ba, axis=-1) / denom, 0.0, 1.0)
    return _safe_norm(pa - ba * h[..., None]) - radius


def sdf_cylinder(x_local: jnp.ndarray, radius: jnp.ndarray, half_height: jnp.ndarray) -> jnp.ndarray:
    """Capped cylinder along local z, centred at origin."""
    d_r = _safe_norm(x_local[..., :2]) - radius
    d_z = jnp.abs(x_local[..., 2]) - half_height
    outside = _safe_norm(
        jnp.stack([jnp.maximum(d_r, 0.0), jnp.maximum(d_z, 0.0)], axis=-1)
    )
    inside = jnp.minimum(jnp.maximum(d_r, d_z), 0.0)
    return outside + inside


def sample_voxel_grid(
    grid: jnp.ndarray,
    x_local: jnp.ndarray,
    origin: jnp.ndarray,
    cell_size,
    outside_value: float = 1.0,
) -> jnp.ndarray:
    """Trilinear sample of a dense SDF grid.

    grid (X, Y, Z) values, x_local (..., 3) in grid frame, origin (3,) =
    world position of voxel (0,0,0) center. Points outside the grid return
    ``outside_value`` (blended at the boundary). Differentiable wrt x_local.

    Parity: reference `data_voxel.py:791` `sample_voxel_sdf_with_grad`.
    """
    gx, gy, gz = grid.shape
    u = (x_local - origin) / cell_size  # voxel coordinates
    u0 = jnp.floor(u)
    frac = u - u0
    i0 = u0.astype(jnp.int32)

    def gather(di, dj, dk):
        idx = i0 + jnp.asarray([di, dj, dk])
        valid = jnp.all(
            (idx >= 0) & (idx < jnp.asarray([gx, gy, gz])), axis=-1
        )
        ic = jnp.clip(idx, 0, jnp.asarray([gx - 1, gy - 1, gz - 1]))
        vals = grid[ic[..., 0], ic[..., 1], ic[..., 2]]
        return jnp.where(valid, vals, outside_value)

    fx, fy, fz = frac[..., 0], frac[..., 1], frac[..., 2]
    c00 = gather(0, 0, 0) * (1 - fx) + gather(1, 0, 0) * fx
    c10 = gather(0, 1, 0) * (1 - fx) + gather(1, 1, 0) * fx
    c01 = gather(0, 0, 1) * (1 - fx) + gather(1, 0, 1) * fx
    c11 = gather(0, 1, 1) * (1 - fx) + gather(1, 1, 1) * fx
    c0 = c00 * (1 - fy) + c10 * fy
    c1 = c01 * (1 - fy) + c11 * fy
    return c0 * (1 - fz) + c1 * fz
