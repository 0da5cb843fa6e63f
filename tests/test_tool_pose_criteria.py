"""Per-tool ToolPoseCriteria tests (reference `cost/tool_pose_criteria.py:18`,
`types/tool_pose.py:183`)."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from curobo_tpu.cost import terms
from curobo_tpu.types.tool_pose import (
    ToolPoseCriteria,
    criteria_for_tools,
    stack_criteria,
)

CONTENT = os.path.join(
    os.path.dirname(__file__), "..", "curobo_tpu", "content", "robots"
)


class TestCriteriaType:
    def test_defaults(self):
        c = ToolPoseCriteria()
        assert c.pose_axes_weight_factor == (1.0,) * 6
        assert c.convergence_tolerance == (0.0, 0.0)

    def test_validation(self):
        with pytest.raises(ValueError, match="6 floats"):
            ToolPoseCriteria(pose_axes_weight_factor=(1.0, 2.0))
        with pytest.raises(ValueError, match="2 floats"):
            ToolPoseCriteria(convergence_tolerance=(1.0,))

    def test_stack_and_resolve(self):
        w, tol = stack_criteria([ToolPoseCriteria(), ToolPoseCriteria.disabled()])
        assert w.shape == (2, 6) and tol.shape == (2, 2)
        assert float(w[1].sum()) == 0.0
        w2, _ = criteria_for_tools(
            ["a", "b"], {"b": ToolPoseCriteria.disabled()}
        )
        np.testing.assert_array_equal(np.asarray(w2[0]), np.ones(6))
        np.testing.assert_array_equal(np.asarray(w2[1]), np.zeros(6))


class TestPoseErrorWithCriteria:
    def _two_tool_setup(self):
        # tool 0 on goal; tool 1 off by 0.1 in x and a small rotation
        tp = jnp.asarray([[[0.3, 0.0, 0.5], [0.4, 0.1, 0.5]]])  # (1, 2, 3)
        tq = jnp.asarray([[[1.0, 0, 0, 0], [1.0, 0, 0, 0]]], jnp.float32)
        gp = tp.at[0, 1, 0].add(0.1)[:, None]  # (1, 1, 2, 3) goalset G=1
        gq = tq[:, None]
        return tp, tq, gp, gq

    def test_disabled_tool_removes_cost(self):
        tp, tq, gp, gq = self._two_tool_setup()
        w, tol = stack_criteria([ToolPoseCriteria(), ToolPoseCriteria.disabled()])
        c_on, pe_on, _ = terms.pose_error(tp, tq, gp, gq)
        c_off, pe_off, _ = terms.pose_error(
            tp, tq, gp, gq, tool_weight=w, tool_tolerance=tol
        )
        assert float(c_on[0]) > 1e-3  # tool 1 error contributes
        assert float(c_off[0]) < 1e-8  # disabled: no cost at all
        assert float(pe_on[0]) > 0.09
        assert float(pe_off[0]) < 1e-6  # inf tolerance swallows the error

    def test_tolerance_slack(self):
        tp, tq, gp, gq = self._two_tool_setup()
        w, tol = stack_criteria(
            [
                ToolPoseCriteria(),
                ToolPoseCriteria(convergence_tolerance=(0.15, 0.1)),
            ]
        )
        _, pe, re = terms.pose_error(
            tp, tq, gp, gq, tool_weight=w, tool_tolerance=tol
        )
        assert float(pe[0]) < 1e-6  # 0.1 error within 0.15 tolerance
        assert float(re[0]) < 1e-6

    def test_axis_weight_scales_cost(self):
        tp, tq, gp, gq = self._two_tool_setup()
        w2, _ = stack_criteria(
            [ToolPoseCriteria(), ToolPoseCriteria(
                pose_axes_weight_factor=(2.0, 1, 1, 1, 1, 1))]
        )
        c1, _, _ = terms.pose_error(tp, tq, gp, gq)
        c2, _, _ = terms.pose_error(tp, tq, gp, gq, tool_weight=w2)
        # error is along x of tool 1; 2x axis factor -> 4x quadratic cost
        np.testing.assert_allclose(float(c2[0]), 4.0 * float(c1[0]), rtol=1e-5)


class TestGoalIntegration:
    def test_generic_ik_with_criteria(self):
        """Whole-body IK where one tool is relaxed: the solver must satisfy
        the weighted tool and may ignore the disabled one."""
        import jax

        from curobo_tpu.geom import world as wm
        from curobo_tpu.opt.lbfgs import LBFGSConfig
        from curobo_tpu.opt.mppi import MPPIConfig
        from curobo_tpu.robot.kinematics import Kinematics, compute_kinematics
        from curobo_tpu.rollout.robot_rollout import Goal
        from curobo_tpu.solver.ik import IKConfig, IKSolver
        from curobo_tpu.types.pose import Pose

        kin = Kinematics.from_robot_yaml(os.path.join(CONTENT, "dual_ur10e.yml"))
        p = kin.params
        assert p.n_tools == 2
        rng = np.random.RandomState(0)
        q_goal = jnp.asarray(
            p.retract_config + rng.uniform(-0.4, 0.4, (2, p.n_dof)),
            jnp.float32,
        )
        st = compute_kinematics(p, q_goal)
        pose = Pose(st.tool_pose.position, st.tool_pose.quaternion)  # (2, 2)
        # arm 1's goal corrupted far away; its criteria disabled
        bad = pose.position.at[:, 1, 2].add(5.0)
        goal = Goal.from_pose(
            Pose(bad, pose.quaternion),
            criteria=[ToolPoseCriteria(), ToolPoseCriteria.disabled()],
        )
        solver = IKSolver(
            p,
            IKConfig(
                n_seeds=4, use_blast=False, use_pallas=False,
                mppi=MPPIConfig(n_particles=8, n_iters=2, init_std=0.2),
                lbfgs=LBFGSConfig(history=8, n_iters=30),
            ),
        )
        world = wm.empty_world()
        res = solver._solve_impl(
            world, goal, solver.generate_seeds(2, seed_state=q_goal),
            jax.random.PRNGKey(0),
        )
        # the weighted tool converged even though tool 1's goal is absurd
        assert float(jnp.max(res.position_error)) < 0.01
