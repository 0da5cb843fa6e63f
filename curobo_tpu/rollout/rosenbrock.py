"""Rosenbrock toy rollout — the optimizer-protocol demonstrator.

Parity: reference `rollout/rollout_rosenbrock.py` (`RosenbrockRollout`),
which the reference ships publicly (`curobo/rollout.py`) as the minimal
example of the rollout/cost protocol and as the optimizer test objective.

Here the protocol is simpler — a rollout IS a batched cost function with
the leading-candidate-axis contract (`(..., D) -> (...)`) — so this class
is both documentation of that contract and a hard non-convex objective
for `opt/` tests (global minimum at x = 1).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class RosenbrockConfig:
    dof: int = 2
    a: float = 1.0
    b: float = 100.0


class RosenbrockRollout:
    """Batched N-dimensional Rosenbrock objective.

    cost(x) = sum_i [ b (x_{i+1} - x_i^2)^2 + (a - x_i)^2 ]
    """

    def __init__(self, cfg: RosenbrockConfig = RosenbrockConfig()):
        if cfg.dof < 2:
            raise ValueError("RosenbrockRollout needs dof >= 2")
        self.cfg = cfg

    @property
    def dof(self) -> int:
        return self.cfg.dof

    @property
    def optimum(self) -> jnp.ndarray:
        return jnp.full((self.cfg.dof,), self.cfg.a, jnp.float32)

    def cost(self, x: jnp.ndarray) -> jnp.ndarray:
        """(..., D) -> (...): works under jit/vmap/grad, any batch shape."""
        x = jnp.asarray(x)
        head, tail = x[..., :-1], x[..., 1:]
        return jnp.sum(
            self.cfg.b * (tail - head**2) ** 2 + (self.cfg.a - head) ** 2,
            axis=-1,
        )

    __call__ = cost
