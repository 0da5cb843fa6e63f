"""PRM graph planner tests: finds collision-free paths around an obstacle
wall that straight-line interpolation cannot cross."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from curobo_tpu.geom import types as gt
from curobo_tpu.geom import world as wm
from curobo_tpu.graph.prm import PRMConfig, PRMGraphPlanner
from curobo_tpu.robot.kinematics import Kinematics

CONTENT = os.path.join(os.path.dirname(__file__), "..", "curobo_tpu", "content", "robots")


@pytest.fixture(scope="module")
def kin():
    return Kinematics.from_robot_yaml(os.path.join(CONTENT, "franka.yml"))


@pytest.fixture(scope="module")
def wall_world():
    # A wall in front of the robot that blocks direct side-to-side sweeps.
    return wm.compile_scene(
        gt.Scene().add(
            gt.Cuboid(name="wall", pose=[0.55, 0.0, 0.5, 1, 0, 0, 0], dims=[0.08, 0.5, 1.0]),
            gt.Cuboid(name="table", pose=[0.4, 0.0, -0.1, 1, 0, 0, 0], dims=[1.4, 1.4, 0.2]),
        )
    )


class TestPRM:
    def test_finds_path(self, kin, wall_world):
        planner = PRMGraphPlanner(kin.params, PRMConfig(n_nodes=256))
        # start on one side, goal on the other (joint 0 sweep)
        q_start = jnp.asarray([[1.0, -0.9, 0.0, -2.0, 0.0, 1.5, 0.0]])
        q_goal = jnp.asarray([[-1.0, -0.9, 0.0, -2.0, 0.0, 1.5, 0.0]])
        res = planner.plan(wall_world, q_start, q_goal)
        assert res.paths.shape == (1, planner.cfg.max_path_nodes, 7)
        # endpoints exact
        np.testing.assert_allclose(np.asarray(res.paths[0, 0]), np.asarray(q_start[0]), atol=1e-5)
        np.testing.assert_allclose(np.asarray(res.paths[0, -1]), np.asarray(q_goal[0]), atol=1e-5)
        if res.success[0]:
            # every waypoint collision-free
            ok = np.asarray(planner._check_q(wall_world, res.paths[0]))
            assert ok.all()

    def test_batch(self, kin, wall_world):
        planner = PRMGraphPlanner(kin.params, PRMConfig(n_nodes=128))
        B = 3
        q_start = jnp.broadcast_to(kin.params.retract_config, (B, 7))
        q_goal = q_start + jnp.asarray([0.5, 0.1, -0.2, 0.1, 0.0, 0.1, 0.0])
        res = planner.plan(wall_world, q_start, q_goal)
        assert res.paths.shape == (B, planner.cfg.max_path_nodes, 7)
        assert res.success.shape == (B,)

    @pytest.fixture(scope="class")
    def fin_world(self):
        """A thin fin that actually intersects the joint-0 sweep corridor
        (the arm's forearm passes x~0.1-0.3, z~0.6-0.9 mid-sweep): the
        direct start->goal edge is verifiably blocked while both endpoint
        configs stay free."""
        return wm.compile_scene(
            gt.Scene().add(
                gt.Cuboid(name="fin", pose=[0.24, 0.05, 0.75, 1, 0, 0, 0],
                          dims=[0.2, 0.04, 0.5]),
            )
        )

    def test_growth_connects_sparse_roadmap(self, kin, fin_world):
        """A roadmap too sparse to cross the fin must connect after
        informed growth rounds (reference `graph_planner_prm.py:190-223`)
        — and must FAIL without them (the growth is what fixed it)."""
        q_start = jnp.asarray([[1.0, -0.9, 0.0, -2.0, 0.0, 1.5, 0.0]])
        q_goal = jnp.asarray([[-1.0, -0.9, 0.0, -2.0, 0.0, 1.5, 0.0]])
        planner = PRMGraphPlanner(
            kin.params, PRMConfig(n_nodes=8, k_neighbors=4, growth_rounds=0)
        )
        # the direct edge is REALLY blocked (world sanity)
        assert not planner._edges_free(
            fin_world, np.asarray(q_start), np.asarray(q_goal)
        )[0]
        base = dict(n_nodes=8, k_neighbors=4)

        def make(growth_rounds):
            p = PRMGraphPlanner(
                kin.params,
                PRMConfig(growth_rounds=growth_rounds, growth_nodes=160,
                          **base),
            )
            # deterministic disconnection: every base node sits NEXT TO the
            # start, so all goal-side wiring must sweep through the fin —
            # only grown (informed) samples can bridge
            rng = np.random.RandomState(0)
            p._nodes = jnp.asarray(
                np.asarray(q_start) + 0.05 * rng.randn(base["n_nodes"], 7),
                jnp.float32,
            )
            return p

        no_growth = make(0).plan(fin_world, q_start, q_goal)
        grown = make(4).plan(fin_world, q_start, q_goal)
        assert not no_growth.success[0]
        assert grown.success[0]

    def test_shortcut_reduces_path_length(self, kin, wall_world):
        q_start = jnp.asarray([[1.0, -0.9, 0.0, -2.0, 0.0, 1.5, 0.0]])
        q_goal = jnp.asarray([[-1.0, -0.9, 0.0, -2.0, 0.0, 1.5, 0.0]])
        raw = PRMGraphPlanner(
            kin.params, PRMConfig(n_nodes=256, shortcut_rounds=0)
        ).plan(wall_world, q_start, q_goal)
        cut = PRMGraphPlanner(
            kin.params, PRMConfig(n_nodes=256, shortcut_rounds=2)
        ).plan(wall_world, q_start, q_goal)
        assert raw.success[0] and cut.success[0]
        assert cut.path_lengths[0] <= raw.path_lengths[0] + 1e-5
        # shortcut waypoints stay collision-free
        planner = PRMGraphPlanner(kin.params, PRMConfig(n_nodes=256))
        ok = np.asarray(planner._check_q(wall_world, cut.paths[0]))
        assert ok.all()

    def test_informed_samples_inside_spheroid(self, kin):
        planner = PRMGraphPlanner(kin.params, PRMConfig(informed_scale=1.5))
        rng = np.random.RandomState(0)
        # foci around the JOINT-BOX CENTER with a small spheroid so the box
        # clip never binds (clipping legitimately moves samples outside the
        # spheroid when it does — that is intended behavior)
        mid = 0.5 * (planner._lo + planner._hi).astype(np.float32)
        s = mid.copy()
        g = mid.copy()
        s[0] -= 0.3
        g[0] += 0.3
        pts = planner._informed_samples(rng, s, g, 256)
        c_min = np.linalg.norm(g - s)
        c_max = 1.5 * c_min
        ell = np.linalg.norm(pts - s, axis=-1) + np.linalg.norm(pts - g, axis=-1)
        assert np.all(ell <= c_max + 1e-4)
        # samples concentrate near the segment, not uniformly in the box
        assert np.std(pts - mid) < 0.6

    def test_straight_line_fallback(self, kin):
        # Empty world, trivial problem: path must exist and be ~straight.
        world = wm.empty_world()
        planner = PRMGraphPlanner(kin.params, PRMConfig(n_nodes=64))
        q_start = kin.params.retract_config[None]
        q_goal = q_start + 0.1
        res = planner.plan(world, q_start, q_goal)
        np.testing.assert_allclose(np.asarray(res.paths[0, 0]), np.asarray(q_start[0]), atol=1e-5)
        np.testing.assert_allclose(np.asarray(res.paths[0, -1]), np.asarray(q_goal[0]), atol=1e-5)
