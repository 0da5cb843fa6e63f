"""Batched forward kinematics + analytic Jacobians, TPU-first.

Parity target: the reference's fused FK CUDA kernel
(`curobo/_src/curobolib/kernels/kinematics/kinematics_forward_kernel.cuh:20`,
wrapper `curobo/_src/robot/kinematics/kinematics.py:38`). The CUDA design
(half-warp serial chain composition in shared memory) is replaced by the
TPU-native formulation from SURVEY.md §7 hard-part 1: all per-link local
transforms are computed in one fused batch, then composed level-by-level
down the tree — each level is a single batched 3x3 einsum over every link
at that depth, so a humanoid's branches compose in parallel and XLA fuses
the whole chain into a handful of kernels. Gradients flow through standard
autodiff (all ops are jnp), which reuses the forward intermediates the same
way the reference's hand-written backward consumes its saved cumulative
transforms.

Shapes: q is (..., n_dof) with arbitrary leading batch dims (problems,
seeds, horizon all fold in).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from curobo_tpu.math import quaternion as qm
from curobo_tpu.robot.params import (
    JOINT_PRISMATIC,
    JOINT_REVOLUTE,
    KinematicsParams,
)
from curobo_tpu.types.pose import Pose


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class KinematicsState:
    """FK results. Parity: reference `robot/kinematics/kinematics_state.py`."""

    link_rot: jnp.ndarray  # (..., n_links, 3, 3)
    link_pos: jnp.ndarray  # (..., n_links, 3)
    tool_pose: Pose  # batched (..., n_tools)
    spheres: jnp.ndarray  # (..., n_spheres, 4) xyz + radius
    jacobian: Optional[jnp.ndarray] = None  # (..., n_tools, 6, n_dof)

    @property
    def tool_position(self) -> jnp.ndarray:
        return self.tool_pose.position

    @property
    def tool_quaternion(self) -> jnp.ndarray:
        return self.tool_pose.quaternion


def joint_values(params: KinematicsParams, q: jnp.ndarray) -> jnp.ndarray:
    """Per-link joint values (..., n_links) incl. mimic/locked routing."""
    dof_gather = np.asarray(
        [max(d, 0) for d in params.dof_idx], dtype=np.int32
    )
    return params.mimic_mult * q[..., dof_gather] + params.mimic_offset


def _local_transforms(
    params: KinematicsParams, vals: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """All per-link local transforms in one fused batch.

    Returns (R_local (..., L, 3, 3), p_local (..., L, 3)).
    """
    jt = np.asarray(params.joint_type)
    rev = jnp.asarray((jt == JOINT_REVOLUTE).astype(np.float32))
    prism = jnp.asarray((jt == JOINT_PRISMATIC).astype(np.float32))

    axis = params.joint_axis  # (L, 3)
    # Rodrigues for every link (fixed/prismatic links get masked to identity).
    Rj = qm.axis_angle_rotation_matrix(axis, vals * rev)  # (..., L, 3, 3)
    pj = (prism[:, None] * axis) * vals[..., None]  # (..., L, 3)

    R_local = jnp.einsum("lij,...ljk->...lik", params.fixed_rot, Rj)
    p_local = (
        jnp.einsum("lij,...lj->...li", params.fixed_rot, pj) + params.fixed_pos
    )
    return R_local, p_local


def link_transforms(
    params: KinematicsParams, q: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Global link transforms: (..., L, 3, 3), (..., L, 3).

    Level-synchronous composition: links at the same tree depth compose
    against their (already computed) parents in one batched einsum.
    """
    vals = joint_values(params, q)
    R_local, p_local = _local_transforms(params, vals)

    L = params.n_links
    R_out: list = [None] * L
    p_out: list = [None] * L

    # Root level: parent is the world frame (identity).
    for i in params.levels[0]:
        R_out[i] = R_local[..., i, :, :]
        p_out[i] = p_local[..., i, :]

    for level in params.levels[1:]:
        idx = np.asarray(level, dtype=np.int32)
        parents = [params.parent_idx[i] for i in level]
        Rp = jnp.stack([R_out[p] for p in parents], axis=-3)  # (..., k, 3, 3)
        pp = jnp.stack([p_out[p] for p in parents], axis=-2)  # (..., k, 3)
        Rl = R_local[..., idx, :, :]
        pl = p_local[..., idx, :]
        Rg = jnp.einsum("...nij,...njk->...nik", Rp, Rl)
        pg = jnp.einsum("...nij,...nj->...ni", Rp, pl) + pp
        for n, i in enumerate(level):
            R_out[i] = Rg[..., n, :, :]
            p_out[i] = pg[..., n, :]

    return jnp.stack(R_out, axis=-3), jnp.stack(p_out, axis=-2)


def robot_spheres(
    params: KinematicsParams, link_rot: jnp.ndarray, link_pos: jnp.ndarray
) -> jnp.ndarray:
    """World-frame collision spheres (..., n_spheres, 4)."""
    if params.n_spheres == 0:
        return jnp.zeros(link_pos.shape[:-2] + (0, 4), dtype=link_pos.dtype)
    sl = np.asarray(params.sphere_link_idx, dtype=np.int32)
    R = link_rot[..., sl, :, :]  # (..., S, 3, 3)
    p = link_pos[..., sl, :]  # (..., S, 3)
    centers = jnp.einsum("...sij,sj->...si", R, params.sphere_centers) + p
    radii = jnp.broadcast_to(params.sphere_radii, centers.shape[:-1])
    return jnp.concatenate([centers, radii[..., None]], axis=-1)


def compute_com(
    params: KinematicsParams, link_rot: jnp.ndarray, link_pos: jnp.ndarray
) -> jnp.ndarray:
    """Whole-robot center of mass in world frame (..., 3).

    Parity: the reference FK kernel's COMPUTE_COM emission
    (`kinematics_forward_kernel.cuh`, template flag) — here a single
    mass-weighted einsum over the already-computed link transforms.
    """
    com_w = (
        jnp.einsum("...lij,lj->...li", link_rot, params.link_com) + link_pos
    )  # (..., L, 3)
    m = params.link_mass  # (L,)
    total = jnp.maximum(jnp.sum(m), 1e-9)
    return jnp.einsum("l,...li->...i", m, com_w) / total


def analytic_jacobian(
    params: KinematicsParams,
    link_rot: jnp.ndarray,
    link_pos: jnp.ndarray,
    tool_pos: jnp.ndarray,
) -> jnp.ndarray:
    """Geometric Jacobians for all tool frames: (..., n_tools, 6, n_dof).

    Rows 0:3 = linear velocity, rows 3:6 = angular velocity. Per-link
    contributions are routed into dof columns with a single static
    (n_links x n_dof) matmul that also folds in mimic multipliers —
    replaces the reference's fused Jacobian emission
    (`kinematics_forward_kernel.cuh`, Jacobian phase).
    """
    jt = np.asarray(params.joint_type)
    rev = jnp.asarray((jt == JOINT_REVOLUTE).astype(np.float32))[:, None]
    prism = jnp.asarray((jt == JOINT_PRISMATIC).astype(np.float32))[:, None]

    axis_w = jnp.einsum("...lij,lj->...li", link_rot, params.joint_axis)
    # (..., T, L, 3): arm from each joint origin to each tool point.
    arm = tool_pos[..., :, None, :] - link_pos[..., None, :, :]
    contrib_v = rev * jnp.cross(axis_w[..., None, :, :], arm) + (
        prism * axis_w
    )[..., None, :, :]
    contrib_w = (rev * axis_w)[..., None, :, :]
    contrib_w = jnp.broadcast_to(contrib_w, contrib_v.shape)

    anc = jnp.asarray(params.tool_ancestor_mask())  # (T, L)
    route = jnp.asarray(params.dof_routing_matrix())  # (L, D)
    Jv = jnp.einsum("...tlk,tl,ld->...tkd", contrib_v, anc, route)
    Jw = jnp.einsum("...tlk,tl,ld->...tkd", contrib_w, anc, route)
    return jnp.concatenate([Jv, Jw], axis=-2)


def compute_kinematics(
    params: KinematicsParams,
    q: jnp.ndarray,
    compute_jacobian: bool = False,
) -> KinematicsState:
    """Single public FK entry point.

    Parity: reference `Kinematics.compute_kinematics`
    (`curobo/_src/robot/kinematics/kinematics.py:172`).
    """
    from curobo_tpu.util.checks import check_joint_config

    q = check_joint_config("q", q, params.n_dof)
    link_rot, link_pos = link_transforms(params, q)
    ti = np.asarray(params.tool_frame_idx, dtype=np.int32)
    tool_R = link_rot[..., ti, :, :]
    tool_p = link_pos[..., ti, :]
    tool_pose = Pose(tool_p, qm.matrix_to_quat(tool_R))
    spheres = robot_spheres(params, link_rot, link_pos)
    jac = None
    if compute_jacobian:
        jac = analytic_jacobian(params, link_rot, link_pos, tool_p)
    return KinematicsState(
        link_rot=link_rot,
        link_pos=link_pos,
        tool_pose=tool_pose,
        spheres=spheres,
        jacobian=jac,
    )


class Kinematics:
    """Thin OO facade over the functional FK core.

    Parity: reference `Kinematics` (`robot/kinematics/kinematics.py:38`).
    """

    def __init__(self, params: KinematicsParams, visuals=None, asset_root=""):
        self.params = params
        # host-side visual-mesh metadata for exporters (viewer/USD):
        # {link_name: [{"mesh", "origin_xyz", "origin_rpy", "scale"}]}
        self.visuals = visuals or {}
        self.asset_root = asset_root

    @staticmethod
    def from_robot_config(cfg) -> "Kinematics":
        from curobo_tpu.robot.model import build_kinematics_params

        visuals = {
            l.name: l.visual for l in cfg.links if getattr(l, "visual", None)
        }
        return Kinematics(
            build_kinematics_params(cfg),
            visuals=visuals,
            asset_root=getattr(cfg, "asset_root", ""),
        )

    @staticmethod
    def from_robot_yaml(path: str) -> "Kinematics":
        from curobo_tpu.robot.model import RobotModelConfig

        return Kinematics.from_robot_config(RobotModelConfig.from_yaml(path))

    @property
    def n_dof(self) -> int:
        return self.params.n_dof

    @property
    def joint_names(self):
        return self.params.joint_names

    def compute_kinematics(self, q, compute_jacobian: bool = False) -> KinematicsState:
        return compute_kinematics(self.params, q, compute_jacobian)

    def tool_pose(self, q) -> Pose:
        return self.compute_kinematics(q).tool_pose
