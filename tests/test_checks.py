"""Defensive-validation layer (util/checks.py): public API boundaries
must fail fast with the argument's name, never with an XLA traceback.

Parity role: reference `curobolib/cuda_ops/tensor_checks.py` +
`tests/_src/curobolib/cuda_ops/test_tensor_checks.py`."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from curobo_tpu.robot.kinematics import Kinematics, compute_kinematics
from curobo_tpu.types.pose import Pose
from curobo_tpu.util import checks

CONTENT = os.path.join(os.path.dirname(__file__), "..", "curobo_tpu", "content", "robots")


@pytest.fixture(scope="module")
def kin():
    return Kinematics.from_robot_yaml(os.path.join(CONTENT, "franka.yml"))


class TestCheckArray:
    def test_none_rejected(self):
        with pytest.raises(ValueError, match="goal is required"):
            checks.check_array("goal", None)

    def test_shape_wildcards(self):
        x = np.zeros((5, 7))
        assert checks.check_array("q", x, shape=(None, 7)) is x
        with pytest.raises(ValueError, match=r"q must have shape \(\*, 8\)"):
            checks.check_array("q", x, shape=(None, 8))

    def test_last_dim_and_kind(self):
        with pytest.raises(ValueError, match="trailing dimension 7"):
            checks.check_array("q", np.zeros((3, 6)), last_dim=7)
        with pytest.raises(ValueError, match="must be floating"):
            checks.check_array("q", np.zeros((3, 7), dtype=np.int32), kind="f")

    def test_list_input_converted(self):
        out = checks.check_array("q", [[0.0] * 7], last_dim=7, kind="f")
        assert out.shape == (1, 7)


class TestBoundaryGuards:
    def test_fk_wrong_dof(self, kin):
        with pytest.raises(ValueError, match="q must have trailing dimension 7"):
            compute_kinematics(kin.params, jnp.zeros((2, 6)))

    def test_ik_unbatched_goal(self, kin):
        from curobo_tpu.geom import world as wm
        from curobo_tpu.solver.ik import IKSolver

        solver = IKSolver(kin.params)
        bad = Pose(jnp.zeros(3), jnp.asarray([1.0, 0, 0, 0]))  # unbatched
        with pytest.raises(ValueError, match="goal_pose must be batched"):
            solver.solve_pose(wm.empty_world(), bad)

    def test_ik_mismatched_pose(self, kin):
        from curobo_tpu.geom import world as wm
        from curobo_tpu.solver.ik import IKSolver

        solver = IKSolver(kin.params)
        bad = Pose(jnp.zeros((4, 3)), jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (3, 1)))
        with pytest.raises(ValueError, match="position batch .* != quaternion"):
            solver.solve_pose(wm.empty_world(), bad)

    def test_ik_bad_seed_state(self, kin):
        from curobo_tpu.geom import world as wm
        from curobo_tpu.solver.ik import IKSolver

        solver = IKSolver(kin.params)
        goal = Pose(jnp.zeros((2, 3)), jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (2, 1)))
        with pytest.raises(ValueError, match="seed_state"):
            solver.solve_pose(wm.empty_world(), goal, seed_state=jnp.zeros((2, 9)))

    def test_trajopt_bad_q_start(self, kin):
        from curobo_tpu.geom import world as wm
        from curobo_tpu.solver.trajopt import TrajOptSolver

        solver = TrajOptSolver(kin.params)
        goal = Pose(jnp.zeros((2, 3)), jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (2, 1)))
        with pytest.raises(ValueError, match="q_start"):
            solver.solve_pose(
                wm.empty_world(), goal, jnp.zeros((2, 5)), jnp.zeros((2, 4, 7))
            )
