"""Self-collision distance over a precomputed sphere-pair list.

Parity: reference self-collision CUDA kernels
(`curobo/_src/curobolib/kernels/geometry/self_collision/self_collision_kernel.cuh`,
wrapper `cuda_ops/geometry.py:17`). The CUDA map-reduce over shared-memory
sphere caches becomes a single batched gather + pairwise distance + masked
reduction — one fused XLA computation regardless of pair count, scaling to
the >1000-pair humanoid case without a special code path.
"""

from __future__ import annotations

import jax.numpy as jnp

from curobo_tpu.robot.params import SelfCollisionParams


def self_collision_distance(
    sc: SelfCollisionParams, spheres: jnp.ndarray
) -> jnp.ndarray:
    """Max pairwise violation (..., ): margin - distance, clipped at 0.

    spheres: (..., S, 4). Positive result = self-collision (or within
    buffer); 0 = clear. Differentiable wrt sphere positions.
    """
    ca = spheres[..., sc.pair_a, :3]
    cb = spheres[..., sc.pair_b, :3]
    d2 = jnp.sum((ca - cb) ** 2, axis=-1)
    dist = jnp.sqrt(jnp.maximum(d2, 1e-12))
    violation = sc.pair_margin - dist
    return jnp.max(jnp.maximum(violation, 0.0), axis=-1)


def self_collision_cost(
    sc: SelfCollisionParams, spheres: jnp.ndarray, activation_distance: float = 0.0
) -> jnp.ndarray:
    """Smooth summed violation cost (...,) for optimization."""
    ca = spheres[..., sc.pair_a, :3]
    cb = spheres[..., sc.pair_b, :3]
    d2 = jnp.sum((ca - cb) ** 2, axis=-1)
    dist = jnp.sqrt(jnp.maximum(d2, 1e-12))
    violation = jnp.maximum(sc.pair_margin + activation_distance - dist, 0.0)
    return jnp.sum(violation, axis=-1)
