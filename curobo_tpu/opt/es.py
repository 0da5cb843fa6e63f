"""Evolution-strategies particle optimizer (antithetic OpenAI-ES flavor).

Parity: reference `EvolutionStrategies` (`curobo/_src/optim/particle/
evolution_strategies.py`, SURVEY §2.2). Complements MPPI: rank-based
gradient estimate with antithetic pairs, useful for rough cost landscapes.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from curobo_tpu.util.sampling import gaussian_halton_bank


@dataclasses.dataclass(frozen=True)
class ESConfig:
    n_particles: int = 64  # must be even (antithetic pairs)
    n_iters: int = 16
    init_std: float = 0.3
    std_decay: float = 0.99
    min_std: float = 0.01
    learning_rate: float = 0.5


def es_optimize(
    cost_fn: Callable[[jnp.ndarray], jnp.ndarray],
    x0: jnp.ndarray,  # (..., D)
    key: jax.Array,
    cfg: ESConfig,
    lower: Optional[jnp.ndarray] = None,
    upper: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Minimize cost_fn (leading-particle-axis contract, like mppi)."""
    assert cfg.n_particles % 2 == 0
    batch_shape = x0.shape[:-1]
    D = x0.shape[-1]
    P = cfg.n_particles
    nb = len(batch_shape)

    half = P // 2
    bank = gaussian_halton_bank(cfg.n_iters * half, D).reshape(
        (cfg.n_iters, half) + (1,) * nb + (D,)
    )
    signs = jax.random.rademacher(key, batch_shape + (D,), dtype=x0.dtype)

    def body(i, carry):
        mean, std, best_x, best_c = carry
        eps_h = bank[i] * signs  # (half, ..., D)
        eps = jnp.concatenate([eps_h, -eps_h], axis=0)  # antithetic
        x = mean + std * eps
        if lower is not None:
            x = jnp.clip(x, lower, upper)
        c = cost_fn(x)  # (P, ...)

        # rank-based fitness shaping: lower cost -> higher weight
        order = jnp.argsort(c, axis=0)
        ranks = jnp.argsort(order, axis=0).astype(x0.dtype)
        w = (P - 1.0 - ranks) / (P - 1.0) - 0.5  # in [-0.5, 0.5]
        # normalized rank-weighted step: magnitude ~ lr * std regardless of P
        step = jnp.sum(w[..., None] * eps, axis=0) / jnp.sum(
            jnp.abs(w), axis=0
        )[..., None]
        mean = mean + cfg.learning_rate * std * step
        if lower is not None:
            mean = jnp.clip(mean, lower, upper)
        std = jnp.maximum(std * cfg.std_decay, cfg.min_std)

        i_best = jnp.argmin(c, axis=0)
        xb = jnp.take_along_axis(x, i_best[None, ..., None], axis=0)[0]
        cb = jnp.min(c, axis=0)
        improved = cb < best_c
        best_x = jnp.where(improved[..., None], xb, best_x)
        best_c = jnp.minimum(cb, best_c)
        return mean, std, best_x, best_c

    std0 = jnp.broadcast_to(jnp.asarray(cfg.init_std, x0.dtype), x0.shape)
    init_c = cost_fn(x0[None])[0]
    carry = (x0, std0, x0, init_c)
    mean, std, best_x, best_c = jax.lax.fori_loop(0, cfg.n_iters, body, carry)
    c_mean = cost_fn(mean[None])[0]
    use_mean = c_mean < best_c
    return (
        jnp.where(use_mean[..., None], mean, best_x),
        jnp.minimum(c_mean, best_c),
    )
