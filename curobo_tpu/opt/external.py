"""External (host-side) optimizer adapters.

Escape hatch mirroring the reference's external-optimizer wrappers
(`optim/external/scipy_opt.py:ScipyOpt`, `torch_opt.py:TorchOpt`): wrap a
battle-tested host optimizer around the same batched cost contract the
device optimizers use, for non-jittable objectives, small offline
problems, or as a convergence oracle in tests.

Contract (same as `opt/factory.optimize`): ``cost_fn`` maps ``(..., D) ->
(...)`` and must accept a leading batch axis; gradients come from JAX
autodiff of the (jitted) cost unless ``cost_grad_fn`` is given. The batch
is solved problem-by-problem on the host — this path trades throughput
for robustness and is NOT the production device path (the jit'd L-BFGS /
MPPI solvers are).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class ScipyOptConfig:
    """scipy.optimize.minimize settings (reference `ScipyOptCfg`)."""

    method: str = "L-BFGS-B"
    max_iters: int = 200
    tol: Optional[float] = None


def scipy_optimize(
    cost_fn: Callable[[jnp.ndarray], jnp.ndarray],
    x0: jnp.ndarray,
    cfg: ScipyOptConfig = ScipyOptConfig(),
    lower: Optional[jnp.ndarray] = None,
    upper: Optional[jnp.ndarray] = None,
    cost_grad_fn: Optional[Callable] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Minimize per-problem with scipy -> (x_best, cost_best).

    ``x0``: (..., D); bounds broadcast against the trailing D axis.
    """
    from scipy.optimize import minimize

    x0 = jnp.asarray(x0, jnp.float32)
    batch_shape, D = x0.shape[:-1], x0.shape[-1]
    flat = np.asarray(x0.reshape(-1, D), np.float64)

    if cost_grad_fn is None:
        single = jax.jit(jax.value_and_grad(lambda q: cost_fn(q[None])[0]))
    else:
        single = jax.jit(
            lambda q: tuple(a[0] for a in cost_grad_fn(q[None]))
        )

    def fun(z):
        c, g = single(jnp.asarray(z, jnp.float32))
        return float(c), np.asarray(g, np.float64)

    bounds = None
    if lower is not None or upper is not None:
        lo = np.broadcast_to(
            np.asarray(-np.inf if lower is None else lower, np.float64), (D,)
        )
        hi = np.broadcast_to(
            np.asarray(np.inf if upper is None else upper, np.float64), (D,)
        )
        bounds = list(zip(lo, hi))

    xs, cs = [], []
    for z in flat:
        r = minimize(
            fun, z, jac=True, method=cfg.method, bounds=bounds, tol=cfg.tol,
            options={"maxiter": cfg.max_iters},
        )
        xs.append(r.x)
        cs.append(r.fun)
    x_best = jnp.asarray(np.asarray(xs), jnp.float32).reshape(*batch_shape, D)
    c_best = jnp.asarray(np.asarray(cs), jnp.float32).reshape(batch_shape)
    return x_best, c_best


@dataclasses.dataclass(frozen=True)
class TorchOptConfig:
    """torch.optim settings (reference `TorchOptCfg`,
    `optim/external/torch_opt.py:24`). The whole batch is optimized
    jointly (sum of per-problem costs — gradients stay per-problem
    because problems are independent), with a per-problem best tracker."""

    method: str = "adam"  # adam | lbfgs | sgd
    max_iters: int = 100
    lr: float = 0.1


def torch_optimize(
    cost_fn: Callable[[jnp.ndarray], jnp.ndarray],
    x0: jnp.ndarray,
    cfg: TorchOptConfig = TorchOptConfig(),
    lower: Optional[jnp.ndarray] = None,
    upper: Optional[jnp.ndarray] = None,
    cost_grad_fn: Optional[Callable] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Minimize with a torch optimizer -> (x_best, cost_best).

    Parity: reference `TorchOpt` (`optim/external/torch_opt.py:84`). The
    cost/grad evaluation stays on the JAX device (one jitted batched
    call per iteration); torch owns only the parameter-update rule on
    host, so any `torch.optim` method drops in without a device bridge.
    """
    import torch

    x0 = jnp.asarray(x0, jnp.float32)
    batch_shape, D = x0.shape[:-1], x0.shape[-1]

    if cost_grad_fn is None:
        batched = jax.jit(
            lambda q: jax.value_and_grad(lambda z: jnp.sum(cost_fn(z)))(q)
        )

        def eval_cg(q):
            s, g = batched(q)
            del s
            return cost_fn(q), g
    else:
        eval_cg = cost_grad_fn

    lo = None if lower is None else np.asarray(lower, np.float32)
    hi = None if upper is None else np.asarray(upper, np.float32)

    param = torch.from_numpy(np.asarray(x0).copy())
    param.requires_grad_(True)
    method = cfg.method.lower()
    if method == "adam":
        opt = torch.optim.Adam([param], lr=cfg.lr)
    elif method == "sgd":
        opt = torch.optim.SGD([param], lr=cfg.lr)
    elif method == "lbfgs":
        opt = torch.optim.LBFGS(
            [param], lr=cfg.lr, max_iter=1, history_size=10
        )
    else:
        raise ValueError(f"unknown torch method '{cfg.method}'")

    best_x = np.asarray(x0).copy()
    best_c = np.full(batch_shape, np.inf, np.float32)

    for _ in range(cfg.max_iters):
        z = param.detach().numpy()
        if lo is not None or hi is not None:
            z = np.clip(
                z,
                -np.inf if lo is None else lo,
                np.inf if hi is None else hi,
            )
        c, g = eval_cg(jnp.asarray(z))
        c_np = np.asarray(c)
        better = c_np < best_c
        best_c = np.where(better, c_np, best_c)
        best_x = np.where(better[..., None], z, best_x)

        def closure():
            opt.zero_grad()
            param.grad = torch.from_numpy(np.asarray(g).copy())
            return float(np.sum(c_np))

        if method == "lbfgs":
            opt.step(closure)
        else:
            closure()
            opt.step()

    return (
        jnp.asarray(best_x, jnp.float32),
        jnp.asarray(best_c, jnp.float32),
    )
