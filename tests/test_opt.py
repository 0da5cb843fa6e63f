"""Optimizer unit tests on analytic objectives (Rosenbrock-style oracle,
mirroring the reference's `RosenbrockRollout` test pattern,
`rollout/metrics.py` / SURVEY §2.2)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from curobo_tpu.opt.lbfgs import LBFGSConfig, LineSearchConfig, lbfgs_optimize
from curobo_tpu.opt.mppi import MPPIConfig, mppi_optimize
from curobo_tpu.util.sampling import halton_sequence


def batched_quadratic(center):
    def f(x):
        return jnp.sum((x - center) ** 2, axis=-1)

    return f


def rosenbrock(x):
    # classic 2d rosenbrock over last axis pairs
    a, b = 1.0, 100.0
    x0, x1 = x[..., 0], x[..., 1]
    return (a - x0) ** 2 + b * (x1 - x0**2) ** 2


class TestHalton:
    def test_low_discrepancy(self):
        pts = halton_sequence(512, 3)
        assert pts.shape == (512, 3)
        assert pts.min() > 0 and pts.max() < 1
        # mean close to 0.5 (much tighter than random for n=512)
        np.testing.assert_allclose(pts.mean(axis=0), 0.5, atol=0.02)

    def test_deterministic(self):
        np.testing.assert_array_equal(halton_sequence(16, 2), halton_sequence(16, 2))


class TestMPPI:
    def test_quadratic_batch(self):
        B, D = 8, 4
        centers = jnp.asarray(np.random.RandomState(0).randn(B, D), dtype=jnp.float32)
        f = batched_quadratic(centers)  # leading particle axis broadcasts

        x0 = jnp.zeros((B, D))
        x, c = mppi_optimize(
            f, x0, jax.random.PRNGKey(0), MPPIConfig(n_particles=64, n_iters=30, init_std=1.0)
        )
        assert float(jnp.max(c)) < 0.05

    def test_never_regresses(self):
        # elite_keep: final cost can never exceed initial cost
        B, D = 4, 3
        f = batched_quadratic(jnp.zeros((B, D)))
        x0 = jnp.full((B, D), 0.1)
        x, c = mppi_optimize(
            f, x0, jax.random.PRNGKey(1), MPPIConfig(n_particles=8, n_iters=2, init_std=5.0)
        )
        assert float(jnp.max(c)) <= float(jnp.max(f(x0))) + 1e-6

    def test_respects_bounds(self):
        B, D = 4, 3
        f = batched_quadratic(jnp.full((B, D), 10.0))  # optimum outside bounds
        x, c = mppi_optimize(
            f, jnp.zeros((B, D)), jax.random.PRNGKey(2),
            MPPIConfig(n_particles=32, n_iters=10),
            lower=jnp.full((D,), -1.0), upper=jnp.full((D,), 1.0),
        )
        assert float(jnp.max(x)) <= 1.0 + 1e-6


class TestLBFGS:
    def test_quadratic_exact(self):
        B, D = 16, 8
        centers = jnp.asarray(np.random.RandomState(1).randn(B, D), dtype=jnp.float32)
        f = batched_quadratic(centers)
        x, c = lbfgs_optimize(f, jnp.zeros((B, D)), LBFGSConfig(n_iters=30))
        assert float(jnp.max(c)) < 1e-6

    def test_rosenbrock(self):
        B = 8
        x0 = jnp.asarray(np.random.RandomState(2).uniform(-1, 1, (B, 2)), dtype=jnp.float32)
        x, c = lbfgs_optimize(
            f := rosenbrock, x0, LBFGSConfig(n_iters=150, history=10, max_step=2.0)
        )
        # rosenbrock is hard in fp32; expect near-optimum
        assert float(jnp.median(c)) < 1e-3
        assert float(jnp.max(c)) < 0.5

    def test_monotone_never_worse(self):
        B, D = 8, 4
        f = batched_quadratic(jnp.ones((B, D)))
        x0 = jnp.zeros((B, D))
        x, c = lbfgs_optimize(f, x0, LBFGSConfig(n_iters=3))
        assert float(jnp.max(c)) <= float(jnp.max(f(x0))) + 1e-6

    def test_bounds_projection(self):
        B, D = 4, 3
        f = batched_quadratic(jnp.full((B, D), 5.0))
        x, c = lbfgs_optimize(
            f, jnp.zeros((B, D)), LBFGSConfig(n_iters=20),
            lower=jnp.full((D,), -2.0), upper=jnp.full((D,), 2.0),
        )
        np.testing.assert_allclose(np.asarray(x), 2.0, atol=1e-4)

    def test_jit_wrappable(self):
        f = batched_quadratic(jnp.ones((4, 3)))
        solve = jax.jit(lambda x0: lbfgs_optimize(f, x0, LBFGSConfig(n_iters=10)))
        x, c = solve(jnp.zeros((4, 3)))
        assert float(jnp.max(c)) < 1e-5


class TestOptimizerRegistry:
    """Reference registry parity (`optim_factory.py:37-61`): every entry
    minimizes a batched Rosenbrock from the same starts."""

    def _problem(self):
        def rosen(x):  # (..., D) -> (...)
            a = x[..., 1:] - x[..., :-1] ** 2
            b = 1.0 - x[..., :-1]
            return jnp.sum(100.0 * a * a + b * b, axis=-1)

        rng = np.random.RandomState(0)
        x0 = jnp.asarray(rng.uniform(-1.0, 1.0, (6, 4)), jnp.float32)
        return rosen, x0

    @pytest.mark.parametrize(
        "name", ["lbfgs", "gradient_descent", "conjugate_gradient", "lsr1",
                 "mppi", "es"]
    )
    def test_all_decrease(self, name):
        from curobo_tpu.opt import factory

        rosen, x0 = self._problem()
        c0 = rosen(x0)
        cfg = factory.make_config(name)
        xb, cb = jax.jit(
            lambda x: factory.optimize(name, rosen, x, cfg,
                                       key=jax.random.PRNGKey(1))
        )(x0)
        assert xb.shape == x0.shape
        assert bool(jnp.all(cb <= c0 + 1e-6))
        # gradient methods should make real progress on rosenbrock
        if name in ("lbfgs", "conjugate_gradient", "lsr1"):
            assert bool(jnp.all(cb < 0.25 * c0))

    def test_gradient_methods_near_optimum(self):
        from curobo_tpu.opt import factory
        from curobo_tpu.opt.lbfgs import LineSearchConfig

        rosen, x0 = self._problem()
        for name in ("lbfgs", "conjugate_gradient", "lsr1"):
            cfg_cls = factory.OPTIMIZERS[name][0]
            cfg = cfg_cls(
                n_iters=200,
                line_search=LineSearchConfig(
                    scales=(0.01, 0.05, 0.1, 0.3, 0.5, 1.0, 2.0)
                ),
            )
            _, cb = factory.optimize(name, rosen, x0, cfg)
            # CG is known-slow on the banana valley; quasi-Newton gets there
            tol = 1.0 if name == "conjugate_gradient" else 1e-2
            assert float(jnp.median(cb)) < tol, name

    def test_bounds_respected(self):
        from curobo_tpu.opt import factory

        rosen, x0 = self._problem()
        lo = jnp.full((4,), -0.5)
        hi = jnp.full((4,), 0.5)
        for name in ("gradient_descent", "conjugate_gradient", "lsr1"):
            xb, _ = factory.optimize(name, rosen, x0, None, lower=lo, upper=hi)
            assert bool(jnp.all(xb >= lo - 1e-6)) and bool(jnp.all(xb <= hi + 1e-6))

    def test_unknown_name_raises(self):
        from curobo_tpu.opt import factory

        with pytest.raises(ValueError, match="unknown optimizer"):
            factory.optimize("adamw", lambda x: x.sum(-1), jnp.zeros((2, 3)))


class TestRoberts:
    def test_low_discrepancy_and_range(self):
        from curobo_tpu.util.sampling import roberts_sequence

        r = roberts_sequence(2000, 5)
        assert r.shape == (2000, 5)
        assert (r > 0).all() and (r < 1).all()
        # each dim's empirical CDF is near-uniform
        for d in range(5):
            h, _ = np.histogram(r[:, d], bins=10, range=(0, 1))
            assert h.min() > 150 and h.max() < 250

    def test_gaussian_moments(self):
        from curobo_tpu.util.sampling import roberts_gaussian

        g = roberts_gaussian(4000, 3)
        np.testing.assert_allclose(g.mean(axis=0), 0.0, atol=0.05)
        np.testing.assert_allclose(g.std(axis=0), 1.0, atol=0.05)
