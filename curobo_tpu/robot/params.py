"""Tensorized robot model: struct-of-arrays kinematics parameters.

Parity target: reference `curobo/_src/robot/types/kinematics_params.py:23`
(`KinematicsParams`) — but laid out for XLA: per-link tables are jnp arrays
(so attachments / per-env sphere edits are functional updates), while tree
topology (parents, levels, dof routing) is *static* Python metadata so the
FK composition loop unrolls at trace time into level-batched einsums.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Joint type codes (static, used to pre-split links at trace time).
JOINT_FIXED = 0
JOINT_REVOLUTE = 1
JOINT_PRISMATIC = 2


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class JointLimits:
    """Per-dof limits, all shape (n_dof,)."""

    lower: jnp.ndarray
    upper: jnp.ndarray
    velocity: jnp.ndarray
    acceleration: jnp.ndarray
    jerk: jnp.ndarray
    effort: jnp.ndarray


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SelfCollisionParams:
    """Precomputed collision-sphere pair list.

    Parity: reference `curobo/_src/robot/types/self_collision_params.py:16`.
    ``pair_a/pair_b`` index into the robot sphere array; ``pair_margin`` is
    r_a + r_b + per-link buffers, so contact when dist < pair_margin.
    Padded to a fixed size with margin=-inf pairs so shapes stay static.
    """

    pair_a: jnp.ndarray  # (n_pairs,) int32
    pair_b: jnp.ndarray  # (n_pairs,) int32
    pair_margin: jnp.ndarray  # (n_pairs,) float32 (includes radii)
    # buffer-only part of the margin (link buffers, no radii) — used to
    # rebuild pair_margin when sphere radii change (attachments)
    pair_buffer: jnp.ndarray  # (n_pairs,) float32

    def recompute_margins(self, radii: jnp.ndarray) -> "SelfCollisionParams":
        ra = radii[self.pair_a]
        rb = radii[self.pair_b]
        margin = ra + rb + self.pair_buffer
        margin = jnp.where((ra < 0) | (rb < 0), -jnp.inf, margin)
        return dataclasses.replace(self, pair_margin=margin)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class KinematicsParams:
    """Device-resident robot description.

    Static metadata (topology) is pytree aux data; numeric tables are leaves.
    Link index 0 is always the base link with identity fixed transform.
    """

    # --- per-link tables (n_links, ...) --------------------------------
    fixed_rot: jnp.ndarray  # (n_links, 3, 3) joint-origin rotation
    fixed_pos: jnp.ndarray  # (n_links, 3) joint-origin translation
    joint_axis: jnp.ndarray  # (n_links, 3) unit axis in post-origin frame
    mimic_mult: jnp.ndarray  # (n_links,) q_link = mult * q[dof] + offset
    mimic_offset: jnp.ndarray  # (n_links,)

    # --- spheres -------------------------------------------------------
    sphere_centers: jnp.ndarray  # (n_spheres, 3) in link frame
    sphere_radii: jnp.ndarray  # (n_spheres,) (negative radius = disabled)

    # --- dof-level data ------------------------------------------------
    joint_limits: JointLimits
    retract_config: jnp.ndarray  # (n_dof,)
    cspace_weight: jnp.ndarray  # (n_dof,)
    null_space_weight: jnp.ndarray  # (n_dof,)

    # --- self collision ------------------------------------------------
    self_collision: SelfCollisionParams

    # --- inertial (for RNEA dynamics; zeros if not loaded) -------------
    link_mass: jnp.ndarray  # (n_links,)
    link_com: jnp.ndarray  # (n_links, 3) CoM in link frame
    link_inertia: jnp.ndarray  # (n_links, 3, 3) about CoM, link frame

    # --- static topology metadata --------------------------------------
    link_names: Tuple[str, ...] = dataclasses.field(metadata=dict(static=True))
    joint_names: Tuple[str, ...] = dataclasses.field(metadata=dict(static=True))
    parent_idx: Tuple[int, ...] = dataclasses.field(metadata=dict(static=True))
    joint_type: Tuple[int, ...] = dataclasses.field(metadata=dict(static=True))
    # dof driving each link's joint (-1 = none / fixed or locked)
    dof_idx: Tuple[int, ...] = dataclasses.field(metadata=dict(static=True))
    # links grouped by tree depth, root(s) first — FK composes level-by-level
    levels: Tuple[Tuple[int, ...], ...] = dataclasses.field(metadata=dict(static=True))
    sphere_link_idx: Tuple[int, ...] = dataclasses.field(metadata=dict(static=True))
    tool_frame_names: Tuple[str, ...] = dataclasses.field(metadata=dict(static=True))
    tool_frame_idx: Tuple[int, ...] = dataclasses.field(metadata=dict(static=True))
    base_link: str = dataclasses.field(metadata=dict(static=True))
    robot_name: str = dataclasses.field(metadata=dict(static=True))

    # ------------------------------------------------------------------
    @property
    def n_links(self) -> int:
        return len(self.link_names)

    @property
    def n_dof(self) -> int:
        return len(self.joint_names)

    @property
    def n_spheres(self) -> int:
        return len(self.sphere_link_idx)

    @property
    def n_tools(self) -> int:
        return len(self.tool_frame_idx)

    def link_index(self, name: str) -> int:
        return self.link_names.index(name)

    # Per-dof joint-type codes (JOINT_REVOLUTE / JOINT_PRISMATIC), derived
    # from the per-link tables. Host-side (static metadata).
    def dof_joint_types(self) -> np.ndarray:
        types = np.full(self.n_dof, JOINT_REVOLUTE, dtype=np.int32)
        for l, d in enumerate(self.dof_idx):
            if d >= 0:
                types[d] = self.joint_type[l]
        return types

    def dof_clip_bounds(self, angular_cap: float = 2.0 * np.pi):
        """Optimizer clipping window per dof: REVOLUTE dofs intersect their
        limits with +-angular_cap (continuous joints would otherwise hand
        the optimizer a +-16 rad box); PRISMATIC dofs keep their true
        limits — a floating-base +-10 m translation must stay reachable
        (clamping it to +-2pi meters silently truncates the workspace,
        the round-3 G1 free-base failure mode)."""
        types = self.dof_joint_types()
        ang = types != JOINT_PRISMATIC
        lo = np.asarray(self.joint_limits.lower, np.float64)
        hi = np.asarray(self.joint_limits.upper, np.float64)
        lo = np.where(ang, np.maximum(lo, -angular_cap), lo)
        hi = np.where(ang, np.minimum(hi, angular_cap), hi)
        return lo.astype(np.float32), hi.astype(np.float32)

    # Ancestor mask (n_tools, n_links): ancestors[t, l] = 1 if link l is on
    # the chain from base to tool t (inclusive). Host-side, cached.
    def tool_ancestor_mask(self) -> np.ndarray:
        mask = np.zeros((self.n_tools, self.n_links), dtype=np.float32)
        for t, tool_l in enumerate(self.tool_frame_idx):
            l = tool_l
            while l >= 0:
                mask[t, l] = 1.0
                l = self.parent_idx[l]
        return mask

    # One-hot dof routing matrix (n_links, n_dof) scaled by mimic multiplier
    # — turns per-link Jacobian contributions into per-dof columns with one
    # MXU-friendly matmul.
    def dof_routing_matrix(self) -> np.ndarray:
        m = np.zeros((self.n_links, self.n_dof), dtype=np.float32)
        mult = np.asarray(self.mimic_mult)
        for l, d in enumerate(self.dof_idx):
            if d >= 0:
                m[l, d] = mult[l]
        return m

    def update_spheres(
        self, centers: jnp.ndarray, radii: jnp.ndarray
    ) -> "KinematicsParams":
        """Functional sphere-table update (used by attachment manager)."""
        return dataclasses.replace(self, sphere_centers=centers, sphere_radii=radii)
