"""MPPI particle optimizer — fully batched, jit-compiled, mesh-shardable.

Parity: reference `MPPI` (`curobo/_src/optim/particle/mppi.py`, core loop
`ParticleOptCore._opt_iters` at `particle_opt_core.py:320`). The CUDA-graph
capture of optimizer iterations becomes a `lax.fori_loop` inside one jit;
particle sampling uses a Halton quasi-random bank (the reference's
`SampleBuffer` pattern) mixed with a per-call PRNG sign flip.

Contract: x is (..., D); cost_fn maps (..., D) -> (...,) and must also
accept a LEADING particle axis: (P, ..., D) -> (P, ...). Leading-axis
folding means per-problem constants closed over by cost_fn broadcast
without modification.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from curobo_tpu.util.sampling import gaussian_halton_bank


@dataclasses.dataclass(frozen=True)
class MPPIConfig:
    n_particles: int = 64
    n_iters: int = 16
    temperature: float = 0.05
    init_std: float = 0.4
    # multiplicative std decay per iteration (annealing)
    std_decay: float = 0.9
    min_std: float = 0.01
    # particle 0 copies the mean exactly (null-action particle): no regress
    elite_keep: bool = True
    step_size: float = 0.9


def smooth_sample_transform(n_knots: int, dof: int, reg: float = 1e-4) -> jnp.ndarray:
    """STOMP-style smoothness covariance factor over a knot axis.

    Returns L (n_knots, n_knots) with LL^T ∝ (A^T A + reg I)^-1 where A is the
    second-difference operator — samples drawn as L @ z concentrate on
    low-acceleration perturbations. Parity: reference STOMP covariance
    sampler (`optim/particle/sample_strategies/`, SURVEY §2.2).
    Apply per dof: eps' = einsum('kj,...jd->...kd', L, eps).
    """
    import numpy as np

    A = np.zeros((n_knots + 2, n_knots))
    for i in range(n_knots):
        A[i, i] += 1.0
        A[i + 1, i] += -2.0
        A[i + 2, i] += 1.0
    cov = np.linalg.inv(A.T @ A + reg * np.eye(n_knots))
    L = np.linalg.cholesky(cov)
    # normalize so per-knot marginal std is ~1 (preserves cfg.init_std scale)
    L = L / np.sqrt(np.diag(cov)).max()
    return jnp.asarray(L, dtype=jnp.float32)


def mppi_optimize(
    cost_fn: Callable[[jnp.ndarray], jnp.ndarray],
    x0: jnp.ndarray,  # (..., D)
    key: jax.Array,
    cfg: MPPIConfig,
    lower: Optional[jnp.ndarray] = None,
    upper: Optional[jnp.ndarray] = None,
    init_std: Optional[jnp.ndarray] = None,  # (..., D) or scalar override
    eps_transform: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Minimize cost_fn from x0. Returns (x_best (..., D), cost_best (...,)).

    eps_transform optionally reshapes/correlates the raw normal noise
    (P, ..., D) -> (P, ..., D) before scaling by std (smooth sampling).
    """
    batch_shape = x0.shape[:-1]
    D = x0.shape[-1]
    P = cfg.n_particles
    nb = len(batch_shape)

    std0 = jnp.broadcast_to(
        jnp.asarray(cfg.init_std if init_std is None else init_std, x0.dtype),
        x0.shape,
    )

    # Quasi-random normal bank (n_iters, P, 1...1, D); per-problem random
    # sign flips decorrelate problems while keeping the low-discrepancy
    # structure within each particle set.
    bank = gaussian_halton_bank(cfg.n_iters * P, D).reshape(
        (cfg.n_iters, P) + (1,) * nb + (D,)
    )
    signs = jax.random.rademacher(key, batch_shape + (D,), dtype=x0.dtype)

    def body(i, carry):
        mean, std, best_x, best_c = carry
        eps = bank[i] * signs  # (P, ..., D)
        if eps_transform is not None:
            eps = eps_transform(eps)
        x = mean + std * eps
        if cfg.elite_keep:
            x = x.at[0].set(mean)
        if lower is not None:
            x = jnp.clip(x, lower, upper)
        c = cost_fn(x)  # (P, ...)

        # softmax weights over particles (leading axis)
        c_min = jnp.min(c, axis=0, keepdims=True)
        w = jax.nn.softmax(-(c - c_min) / cfg.temperature, axis=0)
        new_mean = jnp.sum(w[..., None] * x, axis=0)
        mean = mean + cfg.step_size * (new_mean - mean)
        std = jnp.maximum(std * cfg.std_decay, cfg.min_std)

        # track best particle ever
        i_best = jnp.argmin(c, axis=0)  # (...,)
        xb = jnp.take_along_axis(x, i_best[None, ..., None], axis=0)[0]
        cb = jnp.min(c, axis=0)
        improved = cb < best_c
        best_x = jnp.where(improved[..., None], xb, best_x)
        best_c = jnp.minimum(cb, best_c)
        return mean, std, best_x, best_c

    init_c = cost_fn(x0[None])[0]
    carry = (x0, std0, x0, init_c)
    mean, std, best_x, best_c = jax.lax.fori_loop(0, cfg.n_iters, body, carry)

    # final: best-ever vs final mean, whichever is better
    c_mean = cost_fn(mean[None])[0]
    use_mean = c_mean < best_c
    x_out = jnp.where(use_mean[..., None], mean, best_x)
    c_out = jnp.minimum(c_mean, best_c)
    return x_out, c_out
