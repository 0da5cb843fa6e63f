"""Solver-side Pallas glue tests (CPU, forced path).

Round-3 shipped with `TrajOptSolver._pallas_cache` never initialized (the
init was stranded after a `return`), crashing every TPU solve while the CPU
suite stayed green because `_use_pallas` short-circuits on
`default_backend() == "tpu"`. These tests kill that blind-spot class: with
`runtime.pallas_force` the REAL solve entry points route through the kernel
cache (get / reuse / mark_broken / XLA fallback) on the CPU backend, with
the kernel builder swapped for an XLA-path stand-in so no Mosaic compile is
needed. The kernels themselves are covered block-level by
tests/test_pallas_ik.py / test_pallas_traj.py / test_pallas_solvers.py.
"""

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from curobo_tpu import runtime
from curobo_tpu.geom import types as gt
from curobo_tpu.geom import world as wm
from curobo_tpu.robot.kinematics import Kinematics, compute_kinematics
from curobo_tpu.solver._cache import WorldKeyedCache
from curobo_tpu.types.pose import Pose

CONTENT = os.path.join(
    os.path.dirname(__file__), "..", "curobo_tpu", "content", "robots"
)


@pytest.fixture(scope="module")
def kin():
    return Kinematics.from_robot_yaml(os.path.join(CONTENT, "franka.yml"))


@pytest.fixture(scope="module")
def world():
    return wm.compile_scene(
        gt.Scene().add(
            gt.Cuboid(
                name="table",
                pose=[0.4, 0.0, -0.1, 1, 0, 0, 0],
                dims=[1.2, 1.2, 0.2],
            )
        )
    )


@pytest.fixture()
def force_pallas(monkeypatch):
    monkeypatch.setattr(runtime, "pallas_force", True)


def _goal_from_configs(kin, q):
    st = compute_kinematics(kin.params, q)
    return Pose(st.tool_pose.position[:, 0], st.tool_pose.quaternion[:, 0])


class _Recorder:
    """Counting stand-in for a solver's Pallas kernel builder."""

    def __init__(self, impl, fail=False):
        self.impl = impl
        self.fail = fail
        self.builds = 0
        self.calls = 0

    def build(self, world):
        self.builds += 1

        def run(*args, **kw):
            self.calls += 1
            if self.fail:
                raise jax.errors.JaxRuntimeError("injected mosaic failure")
            return self.impl(*args, **kw)

        return run


# ---------------------------------------------------------------------------
class TestTrajOptGlue:
    def make(self, kin):
        from curobo_tpu.opt.lbfgs import LBFGSConfig
        from curobo_tpu.solver.trajopt import TrajOptConfig, TrajOptSolver

        return TrajOptSolver(
            kin.params,
            TrajOptConfig(
                lbfgs=LBFGSConfig(history=8, n_iters=20, max_step=0.5),
                finetune_attempts=1,
            ),
        )

    def test_constructor_wires_pallas_cache(self, kin):
        # round-3 regression: init stranded after a return left the
        # attribute missing and every TPU solve crashed (VERDICT r3 #1)
        solver = self.make(kin)
        assert isinstance(solver._pallas_cache, WorldKeyedCache)

    def _problem(self, kin, seed=0):
        rng = np.random.RandomState(seed)
        lo = np.asarray(kin.params.joint_limits.lower)
        hi = np.asarray(kin.params.joint_limits.upper)
        span = hi - lo
        q_goal = jnp.asarray(
            rng.uniform(lo + 0.2 * span, hi - 0.2 * span, (2, kin.n_dof)),
            jnp.float32,
        )
        q_start = jnp.broadcast_to(kin.params.retract_config, (2, kin.n_dof))
        return _goal_from_configs(kin, q_goal), q_start, q_goal[:, None]

    def test_forced_path_uses_cache_and_reuses_it(self, kin, world, force_pallas):
        solver = self.make(kin)
        rec = _Recorder(solver._finetune_xla)
        solver._pallas_cache = WorldKeyedCache(rec.build)
        goal, q_start, seed_q = self._problem(kin)
        res = solver.solve_pose(world, goal, q_start, seed_q)
        assert rec.builds == 1 and rec.calls == 1
        assert res.trajectory.position.shape[0] == 2
        # same capacity envelope -> no rebuild
        solver.solve_pose(world, goal, q_start, seed_q)
        assert rec.builds == 1 and rec.calls == 2

    def test_broken_kernel_falls_back_and_quarantines(self, kin, world, force_pallas):
        solver = self.make(kin)
        rec = _Recorder(solver._finetune_xla, fail=True)
        solver._pallas_cache = WorldKeyedCache(rec.build)
        goal, q_start, seed_q = self._problem(kin, seed=1)
        res = solver.solve_pose(world, goal, q_start, seed_q)
        # the injected failure must fall back to the XLA path...
        assert res.trajectory.position.shape[0] == 2
        assert solver._pallas_cache.is_broken(world.anonymized())
        # ...and the quarantined envelope never re-dispatches the kernel
        solver.solve_pose(world, goal, q_start, seed_q)
        assert rec.calls == 1

    def test_off_tpu_without_force_skips_pallas(self, kin, world):
        solver = self.make(kin)
        rec = _Recorder(solver._finetune_xla)
        solver._pallas_cache = WorldKeyedCache(rec.build)
        goal, q_start, seed_q = self._problem(kin, seed=2)
        solver.solve_pose(world, goal, q_start, seed_q)
        assert rec.builds == 0


# ---------------------------------------------------------------------------
class TestIKGlue:
    def make(self, kin):
        from curobo_tpu.opt.lbfgs import LBFGSConfig
        from curobo_tpu.opt.mppi import MPPIConfig
        from curobo_tpu.solver.ik import IKConfig, IKSolver

        return IKSolver(
            kin.params,
            IKConfig(
                n_seeds=4,
                mppi=MPPIConfig(n_particles=8, n_iters=2, init_std=0.6),
                lbfgs=LBFGSConfig(history=8, n_iters=15),
            ),
        )

    def test_constructor_wires_pallas_cache(self, kin):
        assert isinstance(self.make(kin)._pallas_cache, WorldKeyedCache)

    def test_forced_path_cache_lifecycle(self, kin, world, force_pallas):
        solver = self.make(kin)
        rec = _Recorder(solver._solve_jit)
        solver._pallas_cache = WorldKeyedCache(rec.build)
        rng = np.random.RandomState(0)
        q = jnp.asarray(rng.uniform(-1.0, 1.0, (3, kin.n_dof)), jnp.float32)
        goal = _goal_from_configs(kin, q)
        res = solver.solve_pose(world, goal)
        assert rec.builds == 1 and rec.calls == 1
        assert res.solution.shape == (3, kin.n_dof)
        solver.solve_pose(world, goal)
        assert rec.builds == 1 and rec.calls == 2

    def test_broken_kernel_falls_back(self, kin, world, force_pallas):
        solver = self.make(kin)
        rec = _Recorder(solver._solve_jit, fail=True)
        solver._pallas_cache = WorldKeyedCache(rec.build)
        rng = np.random.RandomState(1)
        q = jnp.asarray(rng.uniform(-1.0, 1.0, (2, kin.n_dof)), jnp.float32)
        goal = _goal_from_configs(kin, q)
        res = solver.solve_pose(world, goal)
        assert res.solution.shape == (2, kin.n_dof)
        assert solver._pallas_cache.is_broken(world.anonymized())
        solver.solve_pose(world, goal)
        assert rec.calls == 1


# ---------------------------------------------------------------------------
class TestMPCGlue:
    def make(self, kin):
        from curobo_tpu.opt.lbfgs import LBFGSConfig
        from curobo_tpu.opt.mppi import MPPIConfig
        from curobo_tpu.solver.mpc import MPCConfig, MPCSolver

        return MPCSolver(
            kin.params,
            MPCConfig(
                mppi=MPPIConfig(n_particles=8, n_iters=1, init_std=0.08),
                lbfgs=LBFGSConfig(history=4, n_iters=3, max_step=0.3),
            ),
        )

    def test_constructor_wires_caches(self, kin):
        solver = self.make(kin)
        assert isinstance(solver._pallas_cache, WorldKeyedCache)
        assert isinstance(solver._ticker_cache, WorldKeyedCache)

    def test_forced_step_cache_lifecycle(self, kin, world, force_pallas):
        from curobo_tpu.types.state import JointState

        solver = self.make(kin)
        rec = _Recorder(solver._step_jit)
        solver._pallas_cache = WorldKeyedCache(rec.build)
        q0 = jnp.broadcast_to(kin.params.retract_config, (2, kin.n_dof))
        state = solver.setup(q0)
        goal = solver.make_goal(
            _goal_from_configs(kin, q0 + 0.1)
        )
        js = JointState.from_position(q0, kin.params.joint_names)
        res, state = solver.step(world, goal, state, js)
        assert rec.builds == 1 and rec.calls == 1
        res, state = solver.step(world, goal, state, js)
        assert rec.builds == 1 and rec.calls == 2
        assert res.command.position.shape == (2, kin.n_dof)

    def test_broken_step_falls_back(self, kin, world, force_pallas):
        from curobo_tpu.types.state import JointState

        solver = self.make(kin)
        rec = _Recorder(solver._step_jit, fail=True)
        solver._pallas_cache = WorldKeyedCache(rec.build)
        q0 = jnp.broadcast_to(kin.params.retract_config, (2, kin.n_dof))
        state = solver.setup(q0)
        goal = solver.make_goal(_goal_from_configs(kin, q0 + 0.1))
        js = JointState.from_position(q0, kin.params.joint_names)
        res, state = solver.step(world, goal, state, js)
        assert res.command.position.shape == (2, kin.n_dof)
        assert solver._pallas_cache.is_broken(world.anonymized())
        solver.step(world, goal, state, js)
        assert rec.calls == 1
