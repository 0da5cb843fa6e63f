"""Recursive Newton-Euler inverse dynamics (Featherstone), batched jnp.

Parity: reference RNEA CUDA kernels
(`curobo/_src/curobolib/kernels/dynamics/rnea_forward_kernel.cuh:55`,
`spatial_algebra.cuh`, wrapper `robot/dynamics/dynamics.py:45`). The
tree-level CUDA parallelism (links per depth processed by TPB threads)
becomes the same link-level loop unrolled at trace time over batched (...,3)
vectors; gradients (the hand-written `rnea_backward_kernel.cuh`) come from
autodiff through the forward recursion.

Computes tau = ID(q, qdot, qddot, gravity): base->tip velocity/acceleration
propagation, per-link inertial forces, tip->base force accumulation.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from curobo_tpu.robot.params import (
    JOINT_PRISMATIC,
    JOINT_REVOLUTE,
    KinematicsParams,
)

GRAVITY = (0.0, 0.0, -9.81)


def _local_rot_pos(params: KinematicsParams, q: jnp.ndarray):
    """Per-link local transform (parent->link): R (..., L, 3, 3), p (..., L, 3).

    Same construction as kinematics._local_transforms (joint rotation applied
    after the fixed origin transform).
    """
    from curobo_tpu.robot.kinematics import _local_transforms, joint_values

    vals = joint_values(params, q)
    return _local_transforms(params, vals), vals


def compute_inverse_dynamics(
    params: KinematicsParams,
    q: jnp.ndarray,  # (..., D)
    qd: jnp.ndarray,  # (..., D)
    qdd: jnp.ndarray,  # (..., D)
    gravity=GRAVITY,
    external_wrench: Optional[jnp.ndarray] = None,  # (..., L, 6) [force, torque] world frame
) -> jnp.ndarray:
    """Joint torques (..., D)."""
    (R_loc, p_loc), _ = _local_rot_pos(params, q)
    L = params.n_links
    batch = q.shape[:-1]
    dtype = q.dtype

    jt = params.joint_type
    dof = params.dof_idx
    parents = params.parent_idx
    axes = params.joint_axis  # (L, 3) in link frame (post-joint = pre-joint for rotation axis)
    mult = params.mimic_mult

    zeros3 = jnp.zeros(batch + (3,), dtype)
    g = jnp.asarray(gravity, dtype)

    # per-link joint rates (mimic-aware)
    qd_l = []
    qdd_l = []
    for i in range(L):
        if dof[i] >= 0:
            qd_l.append(mult[i] * qd[..., dof[i]])
            qdd_l.append(mult[i] * qdd[..., dof[i]])
        else:
            qd_l.append(jnp.zeros(batch, dtype))
            qdd_l.append(jnp.zeros(batch, dtype))

    # ---- forward pass: base -> tip (link-frame quantities) -------------
    w = [None] * L  # angular velocity
    al = [None] * L  # angular acceleration
    a = [None] * L  # linear acceleration of link-frame origin
    Fc = [None] * L  # inertial force at CoM (link frame)
    Nc = [None] * L  # inertial torque about CoM (link frame)

    for i in range(L):
        Ri = R_loc[..., i, :, :]  # parent -> link_i rotation
        ri = p_loc[..., i, :]  # link_i origin in parent frame
        S = axes[i]
        pi = parents[i]
        if pi < 0:
            w_p = zeros3
            al_p = zeros3
            a_p = -g  # gravity trick: accelerate the base frame upward
        else:
            w_p, al_p, a_p = w[pi], al[pi], a[pi]

        # transform parent quantities into link frame
        RT = jnp.swapaxes(Ri, -1, -2)
        w_in = jnp.einsum("...ij,...j->...i", RT, w_p)
        al_in = jnp.einsum("...ij,...j->...i", RT, al_p)
        a_in = jnp.einsum(
            "...ij,...j->...i",
            RT,
            a_p
            + jnp.cross(al_p, ri)
            + jnp.cross(w_p, jnp.cross(w_p, ri)),
        )

        if jt[i] == JOINT_REVOLUTE:
            Sqd = S * qd_l[i][..., None]
            w[i] = w_in + Sqd
            al[i] = al_in + S * qdd_l[i][..., None] + jnp.cross(w_in, Sqd)
            a[i] = a_in
        elif jt[i] == JOINT_PRISMATIC:
            w[i] = w_in
            al[i] = al_in
            Sqd = S * qd_l[i][..., None]
            a[i] = a_in + S * qdd_l[i][..., None] + 2.0 * jnp.cross(w_in, Sqd)
        else:
            w[i] = w_in
            al[i] = al_in
            a[i] = a_in

        # inertial wrench at the CoM
        c = params.link_com[i]
        m = params.link_mass[i]
        a_c = (
            a[i]
            + jnp.cross(al[i], jnp.broadcast_to(c, batch + (3,)))
            + jnp.cross(w[i], jnp.cross(w[i], jnp.broadcast_to(c, batch + (3,))))
        )
        Fc[i] = m * a_c
        I = params.link_inertia[i]
        Iw = jnp.einsum("ij,...j->...i", I, w[i])
        Nc[i] = jnp.einsum("ij,...j->...i", I, al[i]) + jnp.cross(w[i], Iw)

    # ---- backward pass: tip -> base ------------------------------------
    children = [[] for _ in range(L)]
    for i in range(L):
        if parents[i] >= 0:
            children[parents[i]].append(i)

    f = [None] * L  # total force at link origin, link frame
    n = [None] * L  # total torque about link origin, link frame
    tau = jnp.zeros(batch + (params.n_dof,), dtype)

    # world rotations needed to map external wrenches into link frames
    if external_wrench is not None:
        from curobo_tpu.robot.kinematics import link_transforms

        Rw, _ = link_transforms(params, q)

    for i in range(L - 1, -1, -1):
        c = params.link_com[i]
        fi = Fc[i]
        ni = Nc[i] + jnp.cross(jnp.broadcast_to(c, batch + (3,)), Fc[i])
        for ch in children[i]:
            Rc = R_loc[..., ch, :, :]
            rc = p_loc[..., ch, :]
            f_ch = jnp.einsum("...ij,...j->...i", Rc, f[ch])
            fi = fi + f_ch
            ni = ni + jnp.einsum("...ij,...j->...i", Rc, n[ch]) + jnp.cross(rc, f_ch)
        if external_wrench is not None:
            RwT = jnp.swapaxes(Rw[..., i, :, :], -1, -2)
            fe = jnp.einsum("...ij,...j->...i", RwT, external_wrench[..., i, :3])
            ne = jnp.einsum("...ij,...j->...i", RwT, external_wrench[..., i, 3:])
            fi = fi - fe
            ni = ni - ne
        f[i] = fi
        n[i] = ni
        if dof[i] >= 0:
            S = axes[i]
            if jt[i] == JOINT_REVOLUTE:
                t = jnp.einsum("j,...j->...", S, ni)
            else:
                t = jnp.einsum("j,...j->...", S, fi)
            tau = tau.at[..., dof[i]].add(mult[i] * t)

    return tau


class Dynamics:
    """OO facade. Parity: reference `Dynamics` (`robot/dynamics/dynamics.py:45`)."""

    def __init__(self, params: KinematicsParams, gravity=GRAVITY):
        self.params = params
        self.gravity = gravity

    def compute_inverse_dynamics(self, q, qd, qdd, external_wrench=None):
        return compute_inverse_dynamics(
            self.params, q, qd, qdd, self.gravity, external_wrench
        )

    def gravity_compensation(self, q):
        z = jnp.zeros_like(q)
        return compute_inverse_dynamics(self.params, q, z, z, self.gravity)
