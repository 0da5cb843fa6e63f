"""MPC solver tests: goal tracking over simulated ticks, obstacle avoidance,
deceleration fallback (reference pattern `tests/_src/solver/test_solver_mpc.py`)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from curobo_tpu.geom import types as gt
from curobo_tpu.geom import world as wm
from curobo_tpu.robot.kinematics import Kinematics, compute_kinematics
from curobo_tpu.solver.mpc import MPCConfig, MPCSolver
from curobo_tpu.types.pose import Pose
from curobo_tpu.types.state import JointState

CONTENT = os.path.join(os.path.dirname(__file__), "..", "curobo_tpu", "content", "robots")


@pytest.fixture(scope="module")
def kin():
    return Kinematics.from_robot_yaml(os.path.join(CONTENT, "franka.yml"))


@pytest.fixture(scope="module")
def world():
    return wm.compile_scene(
        gt.Scene().add(
            gt.Cuboid(name="table", pose=[0.4, 0.0, -0.1, 1, 0, 0, 0], dims=[1.2, 1.2, 0.2])
        )
    )


class TestMPC:
    def test_tracks_goal(self, kin, world):
        B = 2
        solver = MPCSolver(kin.params)
        q0 = jnp.broadcast_to(kin.params.retract_config, (B, 7))
        # goal: a reachable pose near the retract pose
        q_goal = q0 + jnp.asarray([0.3, 0.1, -0.2, 0.2, 0.1, -0.1, 0.2])
        st = compute_kinematics(kin.params, q_goal)
        goal = solver.make_goal(Pose(st.tool_pose.position[:, 0], st.tool_pose.quaternion[:, 0]))

        state = solver.setup(q0)
        js = JointState.from_position(q0, kin.params.joint_names)
        errs = []
        for tick in range(40):
            res, state = solver.step(world, goal, state, js)
            # "execute" the first command (perfect tracking sim)
            js = JointState(
                position=res.command.position,
                velocity=res.command.velocity,
                acceleration=res.command.acceleration,
                joint_names=js.joint_names,
            )
            errs.append(float(jnp.max(res.pos_err)))
        # error must shrink substantially from the first tick
        assert errs[-1] < 0.05, f"final pose err {errs[-1]}"
        assert errs[-1] < errs[0] * 0.5

    def test_brake_fallback_on_infeasible(self, kin, world):
        """An unreachable goal inside an obstacle forces infeasible plans;
        the safe-deceleration fallback must produce commands that damp the
        measured velocity (reference solver_mpc.py:700-760)."""
        solver = MPCSolver(kin.params)
        q0 = jnp.broadcast_to(kin.params.retract_config, (1, 7))
        # goal INSIDE the table -> collision-infeasible target
        goal = solver.make_goal(
            Pose(jnp.asarray([[0.4, 0.0, -0.1]]), jnp.asarray([[1.0, 0, 0, 0]]))
        )
        state = solver.setup(q0)
        qd = jnp.full((1, 7), 0.8)
        js = JointState(
            position=q0, velocity=qd, joint_names=kin.params.joint_names
        )
        res, state = solver.step(world, goal, state, js)
        if not bool(res.feasible[0]):
            # braked command keeps direction but shrinks magnitude
            v_cmd = np.asarray(res.command.velocity[0])
            assert np.all(np.abs(v_cmd) <= 0.8 * solver.cfg.brake_decay + 1e-5)
        # whatever the branch, the command must be finite and in-limits
        assert np.isfinite(np.asarray(res.command.position)).all()
        assert np.all(
            np.abs(np.asarray(res.command.velocity))
            <= np.asarray(kin.params.joint_limits.velocity) * 1.05
        )

    def test_commands_within_limits(self, kin, world):
        B = 1
        solver = MPCSolver(kin.params)
        q0 = kin.params.retract_config[None]
        st = compute_kinematics(kin.params, q0 + 0.4)
        goal = solver.make_goal(Pose(st.tool_pose.position[:, 0], st.tool_pose.quaternion[:, 0]))
        state = solver.setup(q0)
        js = JointState.from_position(q0, kin.params.joint_names)
        lim = kin.params.joint_limits
        for tick in range(10):
            res, state = solver.step(world, goal, state, js)
            q = np.asarray(res.command.position)
            assert np.all(q >= np.asarray(lim.lower) - 1e-3)
            assert np.all(q <= np.asarray(lim.upper) + 1e-3)
            js = JointState(
                position=res.command.position, velocity=res.command.velocity,
                joint_names=js.joint_names,
            )

    def test_jit_cache_across_ticks(self, kin, world):
        # Step function must not retrace between ticks (same shapes).
        solver = MPCSolver(kin.params)
        q0 = kin.params.retract_config[None]
        st = compute_kinematics(kin.params, q0)
        goal = solver.make_goal(Pose(st.tool_pose.position[:, 0], st.tool_pose.quaternion[:, 0]))
        state = solver.setup(q0)
        js = JointState.from_position(q0, kin.params.joint_names)
        res, state = solver.step(world, goal, state, js)
        n0 = solver._step_jit._cache_size()
        for _ in range(3):
            res, state = solver.step(world, goal, state, js)
        assert solver._step_jit._cache_size() == n0

    def test_run_ticks_matches_sequential_step(self, kin, world):
        """Device-resident closed-loop rollout (one lax.scan dispatch) must
        reproduce the sequential step() trajectory exactly."""
        from curobo_tpu.geom.world import stack_worlds
        from curobo_tpu.opt.lbfgs import LBFGSConfig
        from curobo_tpu.opt.mppi import MPPIConfig

        cfg = MPCConfig(
            mppi=MPPIConfig(n_particles=8, n_iters=1),
            lbfgs=LBFGSConfig(history=4, n_iters=2),
        )
        solver = MPCSolver(kin.params, cfg)
        q0 = kin.params.retract_config[None]
        st = compute_kinematics(kin.params, q0 + 0.2)
        goal = solver.make_goal(
            Pose(st.tool_pose.position[:, 0], st.tool_pose.quaternion[:, 0])
        )
        js = JointState.from_position(q0, kin.params.joint_names)
        T = 4
        res, state_out = solver.run_ticks(
            stack_worlds([world] * T), goal, solver.setup(q0), js
        )
        assert res.command.position.shape == (T, 1, kin.params.n_dof)

        state_s = solver.setup(q0)
        js_s = js
        for _ in range(T):
            r, state_s = solver.step(world, goal, state_s, js_s)
            js_s = JointState(
                position=r.command.position, velocity=r.command.velocity,
                joint_names=js_s.joint_names,
            )
        np.testing.assert_allclose(
            np.asarray(res.command.position[-1]),
            np.asarray(r.command.position),
            rtol=1e-5, atol=1e-6,
        )
        np.testing.assert_array_equal(
            np.asarray(res.feasible[-1]), np.asarray(r.feasible)
        )
