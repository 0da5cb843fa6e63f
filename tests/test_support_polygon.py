"""Support-polygon balance cost tests (hand-computed oracle cases).

Parity: reference `CostSupportPolygon` semantics
(`curobo/_src/cost/cost_support_polygon.py:109`) + its unit tests
(`curobo/tests/_src/cost/test_cost_support_polygon.py`).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from curobo_tpu.cost.support_polygon import (
    SupportPolygonConfig,
    convex_hull_2d,
    signed_distance_to_hull,
    stance_hull,
    support_polygon_cost,
)

SQUARE = np.asarray([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0]])


class TestConvexHull:
    def test_square_from_interior_points(self):
        pts = np.vstack([SQUARE, [[0.5, 0.5], [0.3, 0.7]]])
        hull = convex_hull_2d(pts)
        assert hull.shape == (4, 2)
        assert set(map(tuple, hull.tolist())) == set(map(tuple, SQUARE.tolist()))

    def test_ccw_orientation(self):
        hull = convex_hull_2d(SQUARE)
        # shoelace area positive <=> CCW
        x, y = hull[:, 0], hull[:, 1]
        area = 0.5 * np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y)
        assert area > 0

    def test_padding_inflates(self):
        hull = convex_hull_2d(SQUARE, padding=0.1)
        c = hull.mean(axis=0)
        r_pad = np.linalg.norm(hull - c, axis=-1)
        r_raw = np.linalg.norm(convex_hull_2d(SQUARE) - c, axis=-1)
        assert np.all(r_pad > r_raw)
        np.testing.assert_allclose(r_pad - r_raw, 0.1, atol=1e-6)

    def test_collinear_and_duplicate_points(self):
        pts = np.asarray([[0, 0], [1, 0], [2, 0], [2, 0], [2, 1], [0, 1]], float)
        hull = convex_hull_2d(pts)
        assert hull.shape[0] == 4  # collinear midpoint dropped


class TestSignedDistance:
    def test_hand_computed_square(self):
        hull = jnp.asarray(convex_hull_2d(SQUARE))
        pts = jnp.asarray(
            [
                [0.5, 0.5],  # center: 0.5 from every edge -> -0.5
                [0.5, 0.9],  # 0.1 below top edge -> -0.1
                [0.5, 1.5],  # 0.5 above top edge -> +0.5
                [2.0, 2.0],  # outside corner: sqrt(2) from (1,1)
                [1.0, 0.5],  # exactly on the right edge -> 0
            ]
        )
        sd = signed_distance_to_hull(pts, hull)
        np.testing.assert_allclose(
            np.asarray(sd),
            [-0.5, -0.1, 0.5, np.sqrt(2.0), 0.0],
            atol=1e-5,
        )

    def test_batched_shapes(self):
        hull = jnp.asarray(convex_hull_2d(SQUARE))
        pts = jnp.zeros((3, 4, 2)) + 0.5
        assert signed_distance_to_hull(pts, hull).shape == (3, 4)

    def test_degenerate_padded_vertices(self):
        # fixed-size tables pad by repeating the last vertex
        hull = jnp.asarray(
            np.vstack([convex_hull_2d(SQUARE), [[0.0, 1.0], [0.0, 1.0]]]),
            jnp.float32,
        )
        sd = signed_distance_to_hull(jnp.asarray([0.5, 0.5]), hull)
        np.testing.assert_allclose(float(sd), -0.5, atol=1e-5)


class TestSupportPolygonCost:
    def test_outside_is_distance(self):
        cfg = SupportPolygonConfig(weight=2.0, inside_cost_weight=0.0)
        hull = jnp.asarray(convex_hull_2d(SQUARE))
        c = support_polygon_cost(jnp.asarray([0.5, 1.5]), hull, cfg)
        np.testing.assert_allclose(float(c), 2.0 * 0.5, atol=1e-5)

    def test_inside_zero_without_inside_weight(self):
        cfg = SupportPolygonConfig(weight=2.0, inside_cost_weight=0.0)
        hull = jnp.asarray(convex_hull_2d(SQUARE))
        c = support_polygon_cost(jnp.asarray([0.5, 0.5]), hull, cfg)
        assert float(c) == 0.0

    def test_inside_margin_pull(self):
        # sd = -0.1, margin_target = 0.2 -> cost = w * icw * 0.1
        cfg = SupportPolygonConfig(
            weight=1.0, inside_cost_weight=0.01, margin_target=0.2
        )
        hull = jnp.asarray(convex_hull_2d(SQUARE))
        c = support_polygon_cost(jnp.asarray([0.5, 0.9]), hull, cfg)
        np.testing.assert_allclose(float(c), 0.01 * 0.1, atol=1e-6)

    def test_deep_inside_beyond_margin_is_zero(self):
        cfg = SupportPolygonConfig(
            weight=1.0, inside_cost_weight=0.01, margin_target=0.2
        )
        hull = jnp.asarray(convex_hull_2d(SQUARE))
        c = support_polygon_cost(jnp.asarray([0.5, 0.5]), hull, cfg)
        assert float(c) == 0.0

    def test_gradient_points_inward(self):
        import jax

        cfg = SupportPolygonConfig(weight=1.0, inside_cost_weight=0.0)
        hull = jnp.asarray(convex_hull_2d(SQUARE))
        g = jax.grad(
            lambda p: jnp.sum(support_polygon_cost(p, hull, cfg))
        )(jnp.asarray([0.5, 1.5]))
        assert float(g[1]) > 0.0  # moving +y increases cost
        np.testing.assert_allclose(float(g[0]), 0.0, atol=1e-5)


class TestStanceHullAndRollout:
    @pytest.fixture(scope="class")
    def g1(self):
        import os

        from curobo_tpu.robot.kinematics import Kinematics

        path = os.path.join(
            os.path.dirname(__file__), "..", "curobo_tpu", "content",
            "robots", "unitree_g1.yml",
        )
        return Kinematics.from_robot_yaml(path)

    def _foot_sphere_indices(self, kin):
        import numpy as np

        from curobo_tpu.robot.kinematics import compute_kinematics

        q0 = jnp.asarray(np.asarray(kin.params.retract_config), jnp.float32)
        sph = np.asarray(compute_kinematics(kin.params, q0).spheres)
        # lowest-z spheres = feet
        order = np.argsort(sph[:, 2])
        return tuple(int(i) for i in order[:8])

    def test_stance_hull_contains_retract_com(self, g1):
        from curobo_tpu.robot.kinematics import compute_com, compute_kinematics

        idx = self._foot_sphere_indices(g1)
        cfg = SupportPolygonConfig(weight=1.0, foot_sphere_indices=idx)
        q0 = jnp.asarray(np.asarray(g1.params.retract_config), jnp.float32)
        hull = stance_hull(g1.params, q0, cfg)
        st = compute_kinematics(g1.params, q0)
        com = compute_com(g1.params, st.link_rot, st.link_pos)
        sd = signed_distance_to_hull(com[:2], hull)
        assert float(sd) < 0.0  # standing robot is balanced

    def test_rollout_penalizes_reaching_far(self, g1):
        """Leaning the whole arm far sideways must raise the balance cost."""
        from curobo_tpu.robot.kinematics import compute_com, compute_kinematics

        idx = self._foot_sphere_indices(g1)
        cfg = SupportPolygonConfig(
            weight=10.0, foot_sphere_indices=idx, padding=0.0,
            inside_cost_weight=0.001,
        )
        q0 = np.asarray(g1.params.retract_config, np.float32)
        hull = stance_hull(g1.params, q0, cfg)

        def balance_cost(q):
            st = compute_kinematics(g1.params, jnp.asarray(q))
            com = compute_com(g1.params, st.link_rot, st.link_pos)
            return float(support_polygon_cost(com[:2], hull, cfg))

        lo = np.asarray(g1.params.joint_limits.lower)
        hi = np.asarray(g1.params.joint_limits.upper)
        q_lean = np.clip(q0 + 0.9 * (hi - q0), lo, hi).astype(np.float32)
        assert balance_cost(q_lean) > balance_cost(q0)
