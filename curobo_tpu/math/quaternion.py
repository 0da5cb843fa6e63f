"""Quaternion and rotation math for TPU (pure jnp, fully batched).

Conventions match the reference framework (wxyz quaternion ordering, see
reference `curobo/_src/types/pose.py:63` and
`curobo/_src/curobolib/kernels/common/quaternion_util.cuh`), but all
implementations here are written from scratch as branchless, vectorized JAX
ops so they fuse into surrounding XLA computations on TPU.

All functions accept arbitrary leading batch dimensions.
"""

from __future__ import annotations

import jax.numpy as jnp


def quat_normalize(q: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Normalize quaternion(s) to unit norm, keeping w >= 0 (canonical form)."""
    q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), eps)
    # Canonicalize sign so that w >= 0 (q and -q are the same rotation).
    return jnp.where(q[..., :1] < 0.0, -q, q)


def quat_multiply(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product q1 * q2, wxyz ordering."""
    w1, x1, y1, z1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    w2, x2, y2, z2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def quat_conjugate(q: jnp.ndarray) -> jnp.ndarray:
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vector(s) v by quaternion(s) q (wxyz)."""
    w = q[..., :1]
    u = q[..., 1:]
    uv = jnp.cross(u, v)
    return v + 2.0 * (w * uv + jnp.cross(u, uv))


def quat_to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion (wxyz) -> rotation matrix (..., 3, 3)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1.0 - 2.0 * (yy + zz), 2.0 * (xy - wz), 2.0 * (xz + wy),
            2.0 * (xy + wz), 1.0 - 2.0 * (xx + zz), 2.0 * (yz - wx),
            2.0 * (xz - wy), 2.0 * (yz + wx), 1.0 - 2.0 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(m.shape[:-1] + (3, 3))


def matrix_to_quat(m: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix (..., 3, 3) -> unit quaternion (wxyz), branchless.

    Uses the four-candidate construction (one per largest diagonal term),
    selected with `where` masks so it is XLA-friendly (no data-dependent
    control flow) and numerically stable for all rotations.
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    tr = m00 + m11 + m22
    # Four candidate 4*q_k^2 values (always >= 0 for a valid rotation).
    qw2 = 1.0 + tr
    qx2 = 1.0 + m00 - m11 - m22
    qy2 = 1.0 - m00 + m11 - m22
    qz2 = 1.0 - m00 - m11 + m22

    # Candidate quaternions (unnormalized), one per dominant component.
    cw = jnp.stack([qw2, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    cx = jnp.stack([m21 - m12, qx2, m01 + m10, m02 + m20], axis=-1)
    cy = jnp.stack([m02 - m20, m01 + m10, qy2, m12 + m21], axis=-1)
    cz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, qz2], axis=-1)

    vals = jnp.stack([qw2, qx2, qy2, qz2], axis=-1)
    idx = jnp.argmax(vals, axis=-1)[..., None]

    q = jnp.where(
        idx == 0, cw, jnp.where(idx == 1, cx, jnp.where(idx == 2, cy, cz))
    )
    return quat_normalize(q)


def quat_from_axis_angle(axis: jnp.ndarray, angle: jnp.ndarray) -> jnp.ndarray:
    """axis (..., 3) unit, angle (...,) -> quaternion (..., 4) wxyz."""
    half = 0.5 * angle[..., None]
    return jnp.concatenate([jnp.cos(half), axis * jnp.sin(half)], axis=-1)


def axis_angle_rotation_matrix(axis: jnp.ndarray, angle: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues formula: axis (..., 3) unit, angle (...,) -> (..., 3, 3)."""
    c = jnp.cos(angle)[..., None, None]
    s = jnp.sin(angle)[..., None, None]
    ax = axis[..., 0], axis[..., 1], axis[..., 2]
    zeros = jnp.zeros_like(axis[..., 0])
    # Skew-symmetric cross-product matrix K.
    k = jnp.stack(
        [
            zeros, -ax[2], ax[1],
            ax[2], zeros, -ax[0],
            -ax[1], ax[0], zeros,
        ],
        axis=-1,
    ).reshape(axis.shape[:-1] + (3, 3))
    eye = jnp.broadcast_to(jnp.eye(3, dtype=axis.dtype), k.shape)
    outer = axis[..., :, None] * axis[..., None, :]
    return c * eye + s * k + (1.0 - c) * outer


def quat_angle(q: jnp.ndarray, eps: float = 1e-7) -> jnp.ndarray:
    """Rotation angle of quaternion(s) in [0, pi]."""
    w = jnp.clip(jnp.abs(q[..., 0]), 0.0, 1.0 - eps)
    return 2.0 * jnp.arccos(w)


def quat_error(q_goal: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """Rotation-vector error between quaternions (goal^-1 * q), shape (..., 3).

    Smooth near identity (uses sin(theta/2) ~ |vec| expansion) so gradients
    are well-behaved for optimization.
    """
    dq = quat_multiply(quat_conjugate(q_goal), q)
    dq = quat_normalize(dq)
    w = dq[..., :1]
    vec = dq[..., 1:]
    # Safe-norm construction: route the s==0 case through a constant inside
    # sqrt so autodiff never sees d(sqrt(0)) (the NaN would leak through
    # `where` otherwise).
    s2 = jnp.sum(vec * vec, axis=-1, keepdims=True)
    small = s2 < 1e-12
    s = jnp.sqrt(jnp.where(small, 1.0, s2))
    # angle = 2*atan2(s, w); axis = vec/s. Near s=0 use 2*vec (small-angle).
    angle = 2.0 * jnp.arctan2(s, w)
    scale = jnp.where(small, 2.0, angle / s)
    return vec * scale


def quat_geodesic_distance(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    """Geodesic angle between two quaternions, smooth for optimization."""
    dot = jnp.clip(jnp.abs(jnp.sum(q1 * q2, axis=-1)), 0.0, 1.0)
    return 2.0 * jnp.arccos(dot)


def quat_slerp(q0: jnp.ndarray, q1: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Spherical linear interpolation, branchless (falls back to lerp when
    the quaternions are nearly parallel)."""
    dot = jnp.sum(q0 * q1, axis=-1, keepdims=True)
    q1 = jnp.where(dot < 0.0, -q1, q1)
    dot = jnp.abs(dot)
    dot_c = jnp.clip(dot, -1.0, 1.0 - 1e-7)
    theta = jnp.arccos(dot_c)
    sin_theta = jnp.sin(theta)
    use_lerp = dot > 1.0 - 1e-6
    t = jnp.asarray(t)[..., None] if jnp.ndim(t) == jnp.ndim(dot) - 1 else t
    w0 = jnp.where(use_lerp, 1.0 - t, jnp.sin((1.0 - t) * theta) / jnp.maximum(sin_theta, 1e-12))
    w1 = jnp.where(use_lerp, t, jnp.sin(t * theta) / jnp.maximum(sin_theta, 1e-12))
    return quat_normalize(w0 * q0 + w1 * q1)
