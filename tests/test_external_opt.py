"""External (scipy) optimizer adapter + Rosenbrock rollout + profiling
facade tests (reference `optim/external/scipy_opt.py`,
`rollout/rollout_rosenbrock.py`, `curobo/profiling.py`)."""

import jax
import jax.numpy as jnp
import numpy as np

from curobo_tpu.opt.external import (
    ScipyOptConfig,
    TorchOptConfig,
    scipy_optimize,
    torch_optimize,
)
from curobo_tpu.opt.factory import make_config, optimize
from curobo_tpu.opt.lbfgs import LBFGSConfig, lbfgs_optimize
from curobo_tpu.profiling import DeviceTimer, annotate
from curobo_tpu.rollout.rosenbrock import RosenbrockConfig, RosenbrockRollout


def test_scipy_solves_rosenbrock_batch():
    roll = RosenbrockRollout(RosenbrockConfig(dof=4))
    x0 = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (5, 4)), jnp.float32)
    x, c = scipy_optimize(roll.cost, x0, ScipyOptConfig(max_iters=400))
    assert x.shape == (5, 4) and c.shape == (5,)
    np.testing.assert_allclose(np.asarray(x), 1.0, atol=1e-2)
    assert float(jnp.max(c)) < 1e-4


def test_scipy_respects_bounds():
    roll = RosenbrockRollout(RosenbrockConfig(dof=2))
    x0 = jnp.zeros((3, 2))
    lo, hi = jnp.full((2,), -0.5), jnp.full((2,), 0.5)
    x, _ = scipy_optimize(roll.cost, x0, lower=lo, upper=hi)
    assert float(jnp.min(x)) >= -0.5 - 1e-6
    assert float(jnp.max(x)) <= 0.5 + 1e-6


def test_scipy_registry_entry_matches_lbfgs_on_quadratic():
    target = jnp.asarray([[0.3, -0.7, 1.1]])

    def cost(x):
        return jnp.sum((x - target) ** 2, axis=-1)

    x0 = jnp.zeros((1, 3))
    xs, cs = optimize("scipy", cost, x0, make_config("scipy", max_iters=100))
    xl, cl = lbfgs_optimize(cost, x0, LBFGSConfig(n_iters=50))
    np.testing.assert_allclose(np.asarray(xs), np.asarray(xl), atol=1e-3)
    assert float(cs[0]) < 1e-6


def test_torch_adam_descends_rosenbrock():
    roll = RosenbrockRollout(RosenbrockConfig(dof=3))
    x0 = jnp.asarray(np.random.default_rng(1).uniform(-1, 1, (4, 3)), jnp.float32)
    c0 = roll.cost(x0)
    x, c = torch_optimize(roll.cost, x0, TorchOptConfig(max_iters=150, lr=0.05))
    assert x.shape == x0.shape and c.shape == (4,)
    assert float(jnp.max(c - c0)) < 0.0  # strictly better everywhere
    np.testing.assert_allclose(np.asarray(c), np.asarray(roll.cost(x)), rtol=1e-5)


def test_torch_lbfgs_solves_quadratic_with_bounds():
    target = jnp.asarray([0.8, -0.8])

    def cost(x):
        return jnp.sum((x - target) ** 2, axis=-1)

    lo, hi = jnp.full((2,), -0.5), jnp.full((2,), 0.5)
    x, c = torch_optimize(
        cost, jnp.zeros((3, 2)), TorchOptConfig(method="lbfgs", max_iters=60, lr=0.5),
        lower=lo, upper=hi,
    )
    # clipped optimum is (0.5, -0.5)
    np.testing.assert_allclose(np.asarray(x), [[0.5, -0.5]] * 3, atol=1e-3)
    assert float(jnp.min(x)) >= -0.5 - 1e-6 and float(jnp.max(x)) <= 0.5 + 1e-6


def test_torch_registry_entry():
    def cost(x):
        return jnp.sum(x**2, axis=-1)

    x, c = optimize(
        "torch", cost, jnp.full((2, 3), 1.0), make_config("torch", max_iters=200, lr=0.1)
    )
    assert float(jnp.max(c)) < 1e-4


def test_rosenbrock_protocol():
    roll = RosenbrockRollout()
    # leading candidate axis + jit/grad compatibility (the rollout contract)
    x = jnp.zeros((7, 3, 2))
    c = jax.jit(roll.cost)(x)
    assert c.shape == (7, 3)
    g = jax.grad(lambda q: roll.cost(q).sum())(x)
    assert g.shape == x.shape
    assert float(roll.cost(roll.optimum[None])[0]) == 0.0


def test_device_timer_and_annotate():
    with DeviceTimer() as t:
        with annotate("test.region"):
            out = jnp.ones((32, 32)) @ jnp.ones((32, 32))
        t.sync(out)
    assert t.elapsed_ms is not None and t.elapsed_ms >= 0.0
