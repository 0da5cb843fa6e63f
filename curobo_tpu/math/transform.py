"""Batched rigid-transform math on (R, p) pairs.

The TPU-native representation for kinematic chains is a pair of arrays
``R (..., 3, 3)`` and ``p (..., 3)`` rather than 4x4 homogeneous matrices:
composing (R, p) pairs is two fused einsums that XLA maps onto the MXU/VPU
with no wasted lanes on the constant bottom row.

Equivalent functionality in the reference lives in
`curobo/_src/geom/transform.py` (Warp kernels) and
`curobo/_src/curobolib/kernels/common/pose_util.cuh`; this module is an
independent jnp implementation.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

Transform = Tuple[jnp.ndarray, jnp.ndarray]  # (R (...,3,3), p (...,3))


def compose(Ra: jnp.ndarray, pa: jnp.ndarray, Rb: jnp.ndarray, pb: jnp.ndarray) -> Transform:
    """(Ra, pa) @ (Rb, pb) -> world = a-frame transform applied to b."""
    R = jnp.einsum("...ij,...jk->...ik", Ra, Rb)
    p = jnp.einsum("...ij,...j->...i", Ra, pb) + pa
    return R, p


def inverse(R: jnp.ndarray, p: jnp.ndarray) -> Transform:
    Rt = jnp.swapaxes(R, -1, -2)
    return Rt, -jnp.einsum("...ij,...j->...i", Rt, p)


def transform_points(R: jnp.ndarray, p: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply transform to points. R (..., 3, 3), p (..., 3), pts (..., N, 3)."""
    return jnp.einsum("...ij,...nj->...ni", R, pts) + p[..., None, :]


def inverse_transform_points(R: jnp.ndarray, p: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply inverse transform to points (world -> local)."""
    return jnp.einsum("...ji,...nj->...ni", R, pts - p[..., None, :])


def identity_like(batch_shape, dtype=jnp.float32) -> Transform:
    R = jnp.broadcast_to(jnp.eye(3, dtype=dtype), tuple(batch_shape) + (3, 3))
    p = jnp.zeros(tuple(batch_shape) + (3,), dtype=dtype)
    return R, p
