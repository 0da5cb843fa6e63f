"""Self-collision distance over a precomputed sphere-pair list.

Parity: reference self-collision CUDA kernels
(`curobo/_src/curobolib/kernels/geometry/self_collision/self_collision_kernel.cuh`,
wrapper `cuda_ops/geometry.py:17`). The CUDA map-reduce over shared-memory
sphere caches becomes a batched gather + pairwise distance + masked
reduction. For humanoid-scale pair lists (G1: 162k pairs) the gather is
CHUNKED under a rematerialized `lax.scan`: materializing the full
(batch, n_pairs, 3) tensor at MPPI particle counts is tens of GB and
crashes the XLA TPU compile outright — the scan bounds peak memory to one
(batch, chunk, 3) block regardless of pair count (the map-reduce kernel's
role, `self_collision_kernel.cuh:114`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from curobo_tpu.robot.params import SelfCollisionParams

# pairs processed per scan step; peak transient = batch x chunk x 3 floats
_CHUNK = 4096
_DEAD = -1.0e30


def _padded_pair_chunks(sc: SelfCollisionParams):
    """(n_chunks, chunk) int32 index/margin tables, dead-padded."""
    pa = np.asarray(sc.pair_a, np.int32)
    pb = np.asarray(sc.pair_b, np.int32)
    mg = np.asarray(sc.pair_margin, np.float32)
    P = pa.shape[0]
    n_chunks = max((P + _CHUNK - 1) // _CHUNK, 1)
    Ppad = n_chunks * _CHUNK
    pa2 = np.zeros(Ppad, np.int32)
    pb2 = np.zeros(Ppad, np.int32)
    mg2 = np.full(Ppad, _DEAD, np.float32)
    pa2[:P], pb2[:P], mg2[:P] = pa, pb, mg
    return (
        jnp.asarray(pa2.reshape(n_chunks, _CHUNK)),
        jnp.asarray(pb2.reshape(n_chunks, _CHUNK)),
        jnp.asarray(mg2.reshape(n_chunks, _CHUNK)),
    )


def _pair_scan(sc: SelfCollisionParams, pos: jnp.ndarray, accum_fn, init):
    """Scan accum_fn over pair chunks; pos (..., S, 3). The chunk body is
    `jax.checkpoint`ed so the backward recomputes gathers instead of
    stacking per-chunk residuals (which would restore the full-tensor
    memory blow-up through the scan's saved linearization points)."""
    pa2, pb2, mg2 = _padded_pair_chunks(sc)

    @jax.checkpoint
    def body(acc, xs):
        ia, ib, mg = xs
        ca = jnp.take(pos, ia, axis=-2)  # (..., chunk, 3)
        cb = jnp.take(pos, ib, axis=-2)
        d2 = jnp.sum((ca - cb) ** 2, axis=-1)
        dist = jnp.sqrt(jnp.maximum(d2, 1e-12))
        return accum_fn(acc, mg, dist), None

    acc, _ = jax.lax.scan(body, init, (pa2, pb2, mg2))
    return acc


def self_collision_distance(
    sc: SelfCollisionParams, spheres: jnp.ndarray
) -> jnp.ndarray:
    """Max pairwise violation (..., ): margin - distance, clipped at 0.

    spheres: (..., S, 4). Positive result = self-collision (or within
    buffer); 0 = clear. Differentiable wrt sphere positions.
    """
    pos = spheres[..., :3]
    batch = spheres.shape[:-2]

    def accum(acc, mg, dist):
        return jnp.maximum(acc, jnp.max(jnp.maximum(mg - dist, 0.0), axis=-1))

    return _pair_scan(sc, pos, accum, jnp.zeros(batch, spheres.dtype))


def self_collision_cost(
    sc: SelfCollisionParams, spheres: jnp.ndarray, activation_distance: float = 0.0
) -> jnp.ndarray:
    """Smooth summed violation cost (...,) for optimization."""
    pos = spheres[..., :3]
    batch = spheres.shape[:-2]

    def accum(acc, mg, dist):
        return acc + jnp.sum(
            jnp.maximum(mg + activation_distance - dist, 0.0), axis=-1
        )

    return _pair_scan(sc, pos, accum, jnp.zeros(batch, spheres.dtype))
