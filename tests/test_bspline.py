"""B-spline transition tests against scipy oracle."""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.interpolate import BSpline as ScipyBSpline

from curobo_tpu.transition.bspline import (
    BSplineConfig,
    BSplineTransition,
    N_PIN,
    _basis_matrices,
)


class TestBasis:
    def test_partition_of_unity(self):
        B0, _, _, _ = _basis_matrices(12, 5, 40)
        np.testing.assert_allclose(B0.sum(axis=1), 1.0, atol=1e-9)

    def test_derivative_matches_scipy(self):
        n_ctrl, degree, H = 10, 5, 101
        _, B1, B2, B3 = _basis_matrices(n_ctrl, degree, H)
        rng = np.random.RandomState(0)
        c = rng.randn(n_ctrl)
        n_interior = n_ctrl - degree - 1
        knots = np.concatenate(
            [np.zeros(degree + 1), np.arange(1, n_interior + 1) / (n_interior + 1), np.ones(degree + 1)]
        )
        spl = ScipyBSpline(knots, c, degree)
        ts = np.linspace(0, 1 - 1e-9, H)
        np.testing.assert_allclose(B1 @ c, spl.derivative(1)(ts), rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(B2 @ c, spl.derivative(2)(ts), rtol=1e-5, atol=1e-4)
        np.testing.assert_allclose(B3 @ c, spl.derivative(3)(ts), rtol=1e-5, atol=1e-2)

    def test_matches_scipy_eval(self):
        n_ctrl, degree, H = 9, 3, 33
        B0, _, _, _ = _basis_matrices(n_ctrl, degree, H)
        rng = np.random.RandomState(0)
        c = rng.randn(n_ctrl)
        n_interior = n_ctrl - degree - 1
        knots = np.concatenate(
            [np.zeros(degree + 1), np.arange(1, n_interior + 1) / (n_interior + 1), np.ones(degree + 1)]
        )
        spl = ScipyBSpline(knots, c, degree)
        ts = np.linspace(0, 1 - 1e-9, H)
        np.testing.assert_allclose(B0 @ c, spl(ts), atol=1e-7)


class TestTransition:
    def test_boundary_conditions(self):
        cfg = BSplineConfig(degree=5, n_control=14, horizon=64)
        tr = BSplineTransition(cfg)
        D = 7
        q0 = jnp.asarray(np.random.RandomState(1).randn(D), dtype=jnp.float32)
        free = jnp.asarray(np.random.RandomState(2).randn(cfg.n_free, D), dtype=jnp.float32)
        traj = tr.rollout(free, q0, jnp.asarray(0.02))
        np.testing.assert_allclose(np.asarray(traj.position[0]), np.asarray(q0), atol=1e-5)
        np.testing.assert_allclose(np.asarray(traj.velocity[0]), 0.0, atol=1e-4)
        np.testing.assert_allclose(np.asarray(traj.acceleration[0]), 0.0, atol=1e-2)

    def test_goal_pinned(self):
        cfg = BSplineConfig(degree=5, n_control=16, horizon=64)
        tr = BSplineTransition(cfg)
        D = 4
        q0 = jnp.zeros(D)
        qg = jnp.ones(D)
        free = jnp.asarray(
            np.random.RandomState(3).randn(cfg.n_free_cspace, D), dtype=jnp.float32
        )
        traj = tr.rollout(free, q0, jnp.asarray(0.02), q_goal=qg)
        np.testing.assert_allclose(np.asarray(traj.position[-1]), 1.0, atol=1e-4)
        np.testing.assert_allclose(np.asarray(traj.velocity[-1]), 0.0, atol=1e-3)

    def test_linear_seed_traces_line(self):
        cfg = BSplineConfig(degree=5, n_control=16, horizon=32)
        tr = BSplineTransition(cfg)
        q0 = jnp.zeros(3)
        q1 = jnp.asarray([1.0, 2.0, -1.0])
        free = tr.linear_seed(q0, q1)
        traj = tr.rollout(free, q0, jnp.asarray(0.05))
        # straight line in joint space: each dof proportional to dof 0 profile
        pos = np.asarray(traj.position)
        np.testing.assert_allclose(pos[-1], np.asarray(q1), atol=1e-5)
        np.testing.assert_allclose(pos[:, 1], 2 * pos[:, 0], atol=1e-5)

    def test_dt_scales_derivatives(self):
        cfg = BSplineConfig(degree=5, n_control=12, horizon=32)
        tr = BSplineTransition(cfg)
        free = tr.linear_seed(jnp.zeros(2), jnp.ones(2))
        t1 = tr.rollout(free, jnp.zeros(2), jnp.asarray(0.01))
        t2 = tr.rollout(free, jnp.zeros(2), jnp.asarray(0.02))
        np.testing.assert_allclose(
            np.asarray(t1.velocity), 2 * np.asarray(t2.velocity), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(t1.acceleration), 4 * np.asarray(t2.acceleration), atol=1e-3
        )

    def test_batched(self):
        cfg = BSplineConfig(degree=5, n_control=12, horizon=24)
        tr = BSplineTransition(cfg)
        B, S, D = 4, 3, 7
        free = jnp.zeros((B, S, cfg.n_free, D))
        q0 = jnp.zeros((B, S, D))
        traj = tr.rollout(free, q0, jnp.full((B, S), 0.02))
        assert traj.position.shape == (B, S, 24, D)
        assert traj.jerk.shape == (B, S, 24, D)

    def test_evaluate_at_matches_dense(self):
        cfg = BSplineConfig(degree=5, n_control=12, horizon=33)
        tr = BSplineTransition(cfg)
        free = jnp.asarray(np.random.RandomState(4).randn(cfg.n_free, 2), dtype=jnp.float32)
        ctrl = tr.assemble_control(free, jnp.zeros(2))
        dense = tr.evaluate(ctrl, jnp.asarray(0.02))
        ts = jnp.linspace(0.0, 1.0, 33)
        q = tr.evaluate_at(ctrl, jnp.asarray(0.02), ts)
        np.testing.assert_allclose(np.asarray(q), np.asarray(dense.position), atol=1e-4)
