"""RobotDebugger validation reports (parity: reference
`builder/debugger_robot.py:650` retract-pose checks)."""

import dataclasses
import os

import jax.numpy as jnp
import numpy as np
import pytest

from curobo_tpu.robot.debugger import RobotDebugger
from curobo_tpu.robot.kinematics import Kinematics

CONTENT = os.path.join(os.path.dirname(__file__), "..", "curobo_tpu", "content", "robots")


@pytest.fixture(scope="module")
def franka():
    return Kinematics.from_robot_yaml(os.path.join(CONTENT, "franka.yml"))


class TestRobotDebugger:
    def test_franka_clean(self, franka):
        rep = RobotDebugger(franka.params).report(n_samples=128)
        assert rep.ok, rep.issues
        assert rep.retract_self_collision_violation <= 0.0
        assert rep.n_dof == 7
        assert rep.n_spheres > 30
        assert rep.free_fraction > 0.5
        assert rep.sphere_radius_range[0] > 0.0
        # workspace must be a non-degenerate 3D volume around the arm
        lo, hi = np.asarray(rep.workspace_aabb)
        assert np.all(hi - lo > 0.3)
        assert "dof" in rep.summary()

    def test_flags_retract_outside_limits(self, franka):
        p = franka.params
        bad = dataclasses.replace(
            p, retract_config=jnp.asarray(p.joint_limits.upper) + 1.0
        )
        rep = RobotDebugger(bad).report(n_samples=16)
        assert not rep.ok
        assert any("outside joint limits" in s for s in rep.issues)

    def test_flags_degenerate_sphere(self, franka):
        p = franka.params
        radii = np.asarray(p.sphere_radii).copy()
        radii[0] = 1e-6
        bad = p.update_spheres(p.sphere_centers, jnp.asarray(radii))
        rep = RobotDebugger(bad).report(n_samples=16)
        assert any("degenerate sphere radius" in s for s in rep.issues)

    def test_flags_overtight_self_collision(self, franka):
        # inflate every pair margin so most configs "collide"
        p = franka.params
        sc = dataclasses.replace(
            p.self_collision,
            pair_margin=jnp.asarray(np.asarray(p.self_collision.pair_margin) + 10.0),
        )
        bad = dataclasses.replace(p, self_collision=sc)
        rep = RobotDebugger(bad).report(n_samples=32)
        assert not rep.ok
        assert any("self-collision" in s for s in rep.issues)
        assert rep.free_fraction < 0.05
