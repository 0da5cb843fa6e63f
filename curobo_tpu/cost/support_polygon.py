"""Support-polygon balance cost for legged / humanoid robots.

Keeps the robot's center of mass (projected to the ground plane) inside the
convex hull of its foot-contact spheres.

Parity: reference `CostSupportPolygon`
(`curobo/_src/cost/cost_support_polygon.py:109` forward semantics) +
`ConvexPolygon2DHelper` (`curobo/_src/geom/convex_polygon_helper.py:336`).
TPU-first redesign: the hull is built ONCE on the host (numpy monotone
chain) from a static stance — foot placement is a per-task constant, like
the reference's first-forward cached hull — and baked as a fixed-size
vertex table; the per-candidate signed distance + cost is pure jnp over
static shapes, so it fuses into the rollout objective under jit (no
data-dependent hull rebuilds inside the solve).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class SupportPolygonConfig:
    """Static config (inlined at trace time).

    foot_sphere_indices: indices into the robot's collision-sphere table
    whose (x, y) projections span the support region (reference
    `foot_sphere_indices`, `cost_support_polygon_cfg.py`).
    """

    weight: float = 0.0  # 0 disables the term
    foot_sphere_indices: Tuple[int, ...] = ()
    # alternative to explicit indices: links whose spheres are the feet
    # (reference `foot_link_names`); resolved by `stance_hull`
    foot_link_names: Tuple[str, ...] = ()
    padding: float = 0.05  # hull inflation, matches reference default
    # reference `inside_cost_weight`: linear pull toward a margin_target
    # clearance from the hull boundary even while balanced
    inside_cost_weight: float = 0.001
    margin_target: float = 0.1


def convex_hull_2d(points: np.ndarray, padding: float = 0.0) -> np.ndarray:
    """CCW convex hull of (N, 2) points via Andrew's monotone chain, with
    optional outward padding (vertices pushed radially from the centroid,
    matching the reference's `_apply_padding_to_hull` inflation intent).

    Returns (V, 2) float32 vertices in CCW order.
    """
    pts = np.asarray(points, dtype=np.float64)
    if pts.ndim != 2 or pts.shape[-1] != 2:
        raise ValueError(f"expected (N, 2) points, got {pts.shape}")
    pts = np.unique(pts, axis=0)
    if pts.shape[0] < 3:
        hull = pts
    else:
        pts = pts[np.lexsort((pts[:, 1], pts[:, 0]))]

        def cross2(o, a, b):
            return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])

        def half(seq):
            out = []
            for p in seq:
                while len(out) >= 2 and cross2(out[-2], out[-1], p) <= 0:
                    out.pop()
                out.append(p)
            return out

        lower = half(pts)
        upper = half(pts[::-1])
        hull = np.asarray(lower[:-1] + upper[:-1])
    if padding != 0.0 and hull.shape[0] >= 1:
        c = hull.mean(axis=0)
        d = hull - c
        n = np.linalg.norm(d, axis=-1, keepdims=True)
        hull = hull + padding * d / np.maximum(n, 1e-9)
    return hull.astype(np.float32)


def signed_distance_to_hull(
    p_xy: jnp.ndarray, hull: jnp.ndarray
) -> jnp.ndarray:
    """Exact signed distance from points (..., 2) to a CCW convex polygon
    (V, 2): negative inside, positive outside (reference
    `compute_point_hull_distance` semantics). Degenerate (repeated-vertex)
    edges are handled, so fixed-size padded vertex tables are safe.
    """
    a = hull  # (V, 2)
    b = jnp.roll(hull, -1, axis=0)  # (V, 2)
    e = b - a  # (V, 2)
    pa = p_xy[..., None, :] - a  # (..., V, 2)
    # segment distances (zero-length edges fall back to vertex distance)
    ee = jnp.sum(e * e, axis=-1)  # (V,)
    t = jnp.sum(pa * e, axis=-1) / jnp.maximum(ee, 1e-12)
    t = jnp.clip(t, 0.0, 1.0) * jnp.where(ee > 1e-12, 1.0, 0.0)
    closest = a + t[..., None] * e  # (..., V, 2)
    d_seg = jnp.linalg.norm(p_xy[..., None, :] - closest, axis=-1)  # (..., V)
    d_min = jnp.min(d_seg, axis=-1)
    # inside test: point is left of (or on) every CCW edge; degenerate
    # edges contribute cross=0 and never flip the test
    cross = e[..., 0] * pa[..., 1] - e[..., 1] * pa[..., 0]  # (..., V)
    inside = jnp.all(cross >= -1e-9, axis=-1)
    return jnp.where(inside, -d_min, d_min)


def support_polygon_cost(
    com_xy: jnp.ndarray,  # (..., 2) ground-projected CoM
    hull: jnp.ndarray,  # (V, 2) CCW
    cfg: SupportPolygonConfig,
) -> jnp.ndarray:
    """Balance penalty (...,). Outside the hull: the exit distance. Inside
    (with inside_cost_weight > 0): a small linear pull until the CoM is
    margin_target clear of the boundary — reference
    `_compute_support_polygon_cost_vectorized`.
    """
    sd = signed_distance_to_hull(com_xy, hull)
    if cfg.inside_cost_weight > 0.0:
        inside_c = cfg.inside_cost_weight * jnp.maximum(
            cfg.margin_target + sd, 0.0
        )
        c = jnp.where(sd < 0.0, inside_c, sd)
    else:
        c = jnp.maximum(sd, 0.0)
    return cfg.weight * c


def foot_indices_from_links(params, link_names) -> Tuple[int, ...]:
    """Collision-sphere indices attached to the named foot links
    (reference `foot_link_names` -> sphere-index resolution,
    `cost_support_polygon_cfg.py`)."""
    want = set()
    for name in link_names:
        want.add(params.link_names.index(name))
    return tuple(
        i for i, li in enumerate(params.sphere_link_idx) if li in want
    )


def stance_hull(
    params, q_stance: np.ndarray, cfg: SupportPolygonConfig
) -> jnp.ndarray:
    """Build the (V, 2) support hull from the foot spheres of a stance
    config (host-side, once per task). Equivalent to the reference caching
    the hull from the first forward's foot spheres
    (`cost_support_polygon.py:49-51`)."""
    from curobo_tpu.robot.kinematics import compute_kinematics

    idx = cfg.foot_sphere_indices
    if not idx and cfg.foot_link_names:
        idx = foot_indices_from_links(params, cfg.foot_link_names)
    if not idx:
        raise ValueError("support polygon needs foot spheres or foot links")
    st = compute_kinematics(params, jnp.asarray(q_stance, jnp.float32))
    feet = np.asarray(st.spheres)[..., list(idx), :2]
    feet = feet.reshape(-1, 2)
    return jnp.asarray(convex_hull_2d(feet, padding=cfg.padding))


def configure_rollout(rollout_cfg, params, q_stance):
    """Return a rollout config with `support_hull` baked from the stance.

    No-op when the support-polygon term is disabled. The hull is stored as
    a static tuple so the config stays hashable (trace-time constant)."""
    sp = rollout_cfg.support_polygon
    if sp is None or sp.weight <= 0.0:
        return rollout_cfg
    hull = np.asarray(stance_hull(params, q_stance, sp))
    return dataclasses.replace(
        rollout_cfg, support_hull=tuple(map(tuple, hull.tolist()))
    )
