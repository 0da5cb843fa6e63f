"""Optimizer debug recorder: capture per-iteration traces for analysis.

Parity: reference `optim/components/debug_recorder.py` + `store_debug`
cfg flags (iteration traces for tuning / paper plots).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, List

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class DebugRecorder:
    """Host-side iteration trace store.

    Optimizers run fixed-iteration loops inside jit, so traces are captured
    by re-running the optimizer with `record=True` wrappers (scan with
    stacked outputs) rather than by mutating state mid-jit.
    """

    traces: Dict[str, List[np.ndarray]] = dataclasses.field(default_factory=dict)

    def add(self, name: str, value) -> None:
        self.traces.setdefault(name, []).append(np.asarray(value))

    def stacked(self, name: str) -> np.ndarray:
        return np.stack(self.traces[name])

    def clear(self) -> None:
        self.traces.clear()

    def summary(self) -> Dict[str, dict]:
        out = {}
        for name, vals in self.traces.items():
            arr = np.stack(vals)
            out[name] = {
                "n": len(vals),
                "first": float(arr.reshape(len(vals), -1).mean(-1)[0]),
                "last": float(arr.reshape(len(vals), -1).mean(-1)[-1]),
                "min": float(arr.min()),
            }
        return out


def record_gradient_descent(
    cost_fn: Callable[[jnp.ndarray], jnp.ndarray],
    x0: jnp.ndarray,
    n_iters: int,
    lr: float = 1e-2,
) -> DebugRecorder:
    """Reference-quality debug run: plain GD with a full per-iteration trace
    (cost curve + gradient norms) for diagnosing cost shaping."""
    rec = DebugRecorder()

    @jax.jit
    def step(x):
        c, vjp = jax.vjp(cost_fn, x)
        (g,) = vjp(jnp.ones_like(c))
        return x - lr * g, c, jnp.linalg.norm(g.reshape(g.shape[0], -1), axis=-1)

    x = x0
    for _ in range(n_iters):
        x, c, gn = step(x)
        rec.add("cost", c)
        rec.add("grad_norm", gn)
    rec.add("x_final", x)
    return rec
