"""Optimizer registry + the gradient-descent / nonlinear-CG / L-SR1
variants that complete the reference's optimizer menu.

Parity: reference `optim_factory.py:37-61` registry (lbfgs,
gradient_descent, line_search_gradient_descent, conjugate_gradient, lsr1,
mppi, es) plus the host-side scipy escape hatch (`opt/external.py`,
reference `optim/external/scipy_opt.py`); a torch wrapper is out of scope
by design (JAX owns the whole device path). Every device optimizer here
follows the same batched contract as `lbfgs_optimize`: cost_fn maps
(..., D) -> (...,), may be called with one extra LEADING candidate axis,
and the whole run is one jit.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from curobo_tpu.opt.es import ESConfig, es_optimize
from curobo_tpu.opt.external import (
    ScipyOptConfig,
    TorchOptConfig,
    scipy_optimize,
    torch_optimize,
)
from curobo_tpu.opt.lbfgs import (
    LBFGSConfig,
    LineSearchConfig,
    _line_search,
    lbfgs_optimize,
)
from curobo_tpu.opt.mppi import MPPIConfig, mppi_optimize


def _make_cg(cost_fn, cost_grad_fn):
    if cost_grad_fn is not None:
        return cost_grad_fn

    def cg(x):
        c, vjp = jax.vjp(cost_fn, x)
        (g,) = vjp(jnp.ones_like(c))
        return c, g

    return cg


def _clamp_dir(d, max_step, eps):
    dn = jnp.max(jnp.abs(d), axis=-1, keepdims=True)
    return d * jnp.minimum(1.0, max_step / jnp.maximum(dn, eps))


@dataclasses.dataclass(frozen=True)
class GDConfig:
    """(Line-search) gradient descent — reference `GradientDescentOpt`."""

    n_iters: int = 100
    line_search: LineSearchConfig = LineSearchConfig()
    max_step: float = 1.0
    epsilon: float = 1e-8


def gd_optimize(
    cost_fn, x0, cfg: GDConfig, lower=None, upper=None, cost_grad_fn=None
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    cg = _make_cg(cost_fn, cost_grad_fn)

    def project(x):
        return jnp.clip(x, lower, upper) if lower is not None else x

    x = project(x0)
    c, g = cg(x)

    def body(i, carry):
        x, c, g, best_x, best_c = carry
        d = _clamp_dir(-g, cfg.max_step, cfg.epsilon)
        x, c, g = _line_search(cg, x, d, c, g, cfg.line_search)
        improved = c < best_c
        best_x = jnp.where(improved[..., None], x, best_x)
        best_c = jnp.minimum(c, best_c)
        return x, c, g, best_x, best_c

    carry = jax.lax.fori_loop(0, cfg.n_iters, body, (x, c, g, x, c))
    best_x, best_c = carry[3], carry[4]
    if lower is not None:
        best_x = project(best_x)
        best_c, _ = cg(best_x)
    return best_x, best_c


@dataclasses.dataclass(frozen=True)
class CGConfig:
    """Polak-Ribiere+ nonlinear conjugate gradient — reference
    `ConjugateGradientOpt` (`optim/gradient/conjugate_gradient.py`)."""

    n_iters: int = 100
    line_search: LineSearchConfig = LineSearchConfig()
    max_step: float = 1.0
    epsilon: float = 1e-8


def cg_optimize(
    cost_fn, x0, cfg: CGConfig, lower=None, upper=None, cost_grad_fn=None
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    cg = _make_cg(cost_fn, cost_grad_fn)

    def project(x):
        return jnp.clip(x, lower, upper) if lower is not None else x

    x = project(x0)
    c, g = cg(x)
    d0 = -g

    def body(i, carry):
        x, c, g, d, best_x, best_c = carry
        step_dir = _clamp_dir(d, cfg.max_step, cfg.epsilon)
        x_new, c_new, g_new = _line_search(cg, x, step_dir, c, g, cfg.line_search)
        # Polak-Ribiere+ restart: beta = max(0, g1.(g1-g0)/g0.g0)
        beta = jnp.sum(g_new * (g_new - g), axis=-1) / jnp.maximum(
            jnp.sum(g * g, axis=-1), cfg.epsilon
        )
        beta = jnp.maximum(beta, 0.0)
        d_new = -g_new + beta[..., None] * d
        # safeguard: restart with steepest descent if not a descent direction
        descent = jnp.sum(d_new * g_new, axis=-1) < 0
        d_new = jnp.where(descent[..., None], d_new, -g_new)
        improved = c_new < best_c
        best_x = jnp.where(improved[..., None], x_new, best_x)
        best_c = jnp.minimum(c_new, best_c)
        return x_new, c_new, g_new, d_new, best_x, best_c

    carry = jax.lax.fori_loop(0, cfg.n_iters, body, (x, c, g, d0, x, c))
    best_x, best_c = carry[4], carry[5]
    if lower is not None:
        best_x = project(best_x)
        best_c, _ = cg(best_x)
    return best_x, best_c


@dataclasses.dataclass(frozen=True)
class LSR1Config:
    """Limited-memory SR1 quasi-Newton — reference `LSR1Opt`
    (`optim/gradient/lsr1.py`). SR1 admits indefinite curvature updates
    (better on saddle-rich landscapes than BFGS's positive-definite ones);
    the line search keeps the step globally safe."""

    history: int = 8
    n_iters: int = 60
    line_search: LineSearchConfig = LineSearchConfig()
    max_step: float = 1.0
    epsilon: float = 1e-8
    skip_tol: float = 1e-8  # |u.y| > tol * |u| |y| update guard


def _sr1_direction(g, S, Y, valid, eps, skip_tol):
    """d = -H g where H applies m SR1 updates to gamma*I.

    H_i = H_{i-1} + u_i u_i^T / (u_i . y_i), u_i = s_i - H_{i-1} y_i.
    The u_i are built oldest-to-newest (each needs H_{i-1} y_i, i.e. all
    previous u's) — O(m^2) batched dot products, m is small and static.
    """
    m = S.shape[0]
    sy = jnp.sum(S[m - 1] * Y[m - 1], axis=-1)
    yy = jnp.sum(Y[m - 1] * Y[m - 1], axis=-1)
    gamma = jnp.where(valid[m - 1] > 0, sy / jnp.maximum(yy, eps), 1.0)
    gamma = jnp.abs(gamma) + eps  # keep the seed positive

    us = []
    denoms = []
    for i in range(m):
        hv = gamma[..., None] * Y[i]
        for j in range(i):
            coef = jnp.sum(us[j] * Y[i], axis=-1) * denoms[j]
            hv = hv + coef[..., None] * us[j]
        u = S[i] - hv
        uy = jnp.sum(u * Y[i], axis=-1)
        # SR1 skip rule: tiny |u.y| makes the update unstable
        un = jnp.sqrt(jnp.sum(u * u, axis=-1))
        yn = jnp.sqrt(jnp.sum(Y[i] * Y[i], axis=-1))
        ok = (jnp.abs(uy) > skip_tol * un * yn) & (valid[i] > 0)
        denom = jnp.where(ok, 1.0 / jnp.where(ok, uy, 1.0), 0.0)
        us.append(u)
        denoms.append(denom)

    hg = gamma[..., None] * g
    for j in range(m):
        coef = jnp.sum(us[j] * g, axis=-1) * denoms[j]
        hg = hg + coef[..., None] * us[j]
    return -hg


def lsr1_optimize(
    cost_fn, x0, cfg: LSR1Config, lower=None, upper=None, cost_grad_fn=None
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    cg = _make_cg(cost_fn, cost_grad_fn)
    batch_shape = x0.shape[:-1]
    D = x0.shape[-1]
    m = cfg.history
    dtype = x0.dtype

    def project(x):
        return jnp.clip(x, lower, upper) if lower is not None else x

    x = project(x0)
    c, g = cg(x)
    S = jnp.zeros((m,) + batch_shape + (D,), dtype)
    Y = jnp.zeros((m,) + batch_shape + (D,), dtype)
    valid = jnp.zeros((m,) + batch_shape, dtype)

    def body(i, carry):
        x, c, g, S, Y, valid, best_x, best_c = carry
        d = _sr1_direction(g, S, Y, valid, cfg.epsilon, cfg.skip_tol)
        descent = jnp.sum(d * g, axis=-1) < 0
        d = jnp.where(descent[..., None], d, -g)
        d = _clamp_dir(d, cfg.max_step, cfg.epsilon)
        x_new, c_new, g_new = _line_search(cg, x, d, c, g, cfg.line_search)
        s = x_new - x
        y = g_new - g
        moved = jnp.sum(s * s, axis=-1) > 1e-16
        S = jnp.concatenate(
            [S[1:], jnp.where(moved[..., None], s, 0.0)[None]], axis=0
        )
        Y = jnp.concatenate(
            [Y[1:], jnp.where(moved[..., None], y, 0.0)[None]], axis=0
        )
        valid = jnp.concatenate([valid[1:], moved.astype(dtype)[None]], axis=0)
        improved = c_new < best_c
        best_x = jnp.where(improved[..., None], x_new, best_x)
        best_c = jnp.minimum(c_new, best_c)
        return x_new, c_new, g_new, S, Y, valid, best_x, best_c

    carry = (x, c, g, S, Y, valid, x, c)
    carry = jax.lax.fori_loop(0, cfg.n_iters, body, carry)
    best_x, best_c = carry[6], carry[7]
    if lower is not None:
        best_x = project(best_x)
        best_c, _ = cg(best_x)
    return best_x, best_c


# ---------------------------------------------------------------------------
# Registry (reference optim_factory.py:37-61)
# ---------------------------------------------------------------------------
def _run_lbfgs(cost_fn, x0, cfg, lower, upper, key, cost_grad_fn):
    return lbfgs_optimize(cost_fn, x0, cfg, lower, upper, cost_grad_fn)


def _run_gd(cost_fn, x0, cfg, lower, upper, key, cost_grad_fn):
    return gd_optimize(cost_fn, x0, cfg, lower, upper, cost_grad_fn)


def _run_cg(cost_fn, x0, cfg, lower, upper, key, cost_grad_fn):
    return cg_optimize(cost_fn, x0, cfg, lower, upper, cost_grad_fn)


def _run_lsr1(cost_fn, x0, cfg, lower, upper, key, cost_grad_fn):
    return lsr1_optimize(cost_fn, x0, cfg, lower, upper, cost_grad_fn)


def _run_mppi(cost_fn, x0, cfg, lower, upper, key, cost_grad_fn):
    if key is None:
        key = jax.random.PRNGKey(0)
    return mppi_optimize(cost_fn, x0, key, cfg, lower, upper)


def _run_es(cost_fn, x0, cfg, lower, upper, key, cost_grad_fn):
    if key is None:
        key = jax.random.PRNGKey(0)
    return es_optimize(cost_fn, x0, key, cfg, lower, upper)


def _run_scipy(cost_fn, x0, cfg, lower, upper, key, cost_grad_fn):
    return scipy_optimize(cost_fn, x0, cfg, lower, upper, cost_grad_fn)


def _run_torch(cost_fn, x0, cfg, lower, upper, key, cost_grad_fn):
    return torch_optimize(cost_fn, x0, cfg, lower, upper, cost_grad_fn)


OPTIMIZERS = {
    "lbfgs": (LBFGSConfig, _run_lbfgs),
    "gradient_descent": (GDConfig, _run_gd),
    "line_search_gradient_descent": (GDConfig, _run_gd),
    "conjugate_gradient": (CGConfig, _run_cg),
    "lsr1": (LSR1Config, _run_lsr1),
    "mppi": (MPPIConfig, _run_mppi),
    "es": (ESConfig, _run_es),
    "scipy": (ScipyOptConfig, _run_scipy),
    "torch": (TorchOptConfig, _run_torch),
}


def make_config(name: str, **kwargs):
    """Build the config dataclass registered under ``name``."""
    if name not in OPTIMIZERS:
        raise ValueError(
            f"unknown optimizer {name!r}; have {sorted(OPTIMIZERS)}"
        )
    return OPTIMIZERS[name][0](**kwargs)


def optimize(
    name: str,
    cost_fn: Callable[[jnp.ndarray], jnp.ndarray],
    x0: jnp.ndarray,
    cfg=None,
    lower: Optional[jnp.ndarray] = None,
    upper: Optional[jnp.ndarray] = None,
    key: Optional[jax.Array] = None,
    cost_grad_fn: Optional[Callable] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Run a registered optimizer by name -> (x_best, cost_best)."""
    if name not in OPTIMIZERS:
        raise ValueError(
            f"unknown optimizer {name!r}; have {sorted(OPTIMIZERS)}"
        )
    cfg_cls, run = OPTIMIZERS[name]
    if cfg is None:
        cfg = cfg_cls()
    return run(cost_fn, x0, cfg, lower, upper, key, cost_grad_fn)
