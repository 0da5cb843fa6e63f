"""Mesh-sharding tests on the virtual 8-device CPU mesh (SURVEY §2.3:
the problems axis is the first-class sharding axis)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from curobo_tpu.geom import types as gt
from curobo_tpu.geom import world as wm
from curobo_tpu.opt.lbfgs import LBFGSConfig
from curobo_tpu.opt.mppi import MPPIConfig
from curobo_tpu.parallel import mesh as mesh_mod
from curobo_tpu.robot.kinematics import Kinematics, compute_kinematics
from curobo_tpu.solver.ik import IKConfig, IKSolver
from curobo_tpu.types.pose import Pose

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


def test_eight_device_mesh_available():
    assert len(jax.devices()) == 8  # conftest forces 8 virtual CPU devices


def test_sharded_ik_matches_unsharded(kin, world):
    B = 16
    rng = np.random.RandomState(0)
    lo = np.asarray(kin.params.joint_limits.lower)
    hi = np.asarray(kin.params.joint_limits.upper)
    span = hi - lo
    qg = jnp.asarray(rng.uniform(lo + 0.2 * span, hi - 0.2 * span, (B, 7)), dtype=jnp.float32)
    st = compute_kinematics(kin.params, qg)
    goals = Pose(st.tool_pose.position[:, 0], st.tool_pose.quaternion[:, 0])

    solver = IKSolver(
        kin.params,
        IKConfig(
            n_seeds=4,
            mppi=MPPIConfig(n_particles=8, n_iters=2),
            lbfgs=LBFGSConfig(history=6, n_iters=8),
        ),
    )
    res_local = solver.solve_pose(world, goals)

    from curobo_tpu.rollout.robot_rollout import Goal

    mesh = mesh_mod.make_mesh(8)
    goals_s = mesh_mod.shard_problems(Goal.from_pose(goals), mesh)
    world_r = mesh_mod.replicate(world, mesh)
    seeds = mesh_mod.shard_problems(solver.generate_seeds(B), mesh)
    res_shard = solver._solve_jit(world_r, goals_s, seeds, jax.random.PRNGKey(0))

    # sharded solve must produce the same solutions (deterministic compute)
    np.testing.assert_allclose(
        np.asarray(res_shard.solution), np.asarray(res_local.solution), atol=2e-5
    )
    # and actually be distributed
    assert len(res_shard.solution.sharding.device_set) == 8


def test_fk_shards_over_problems(kin):
    mesh = mesh_mod.make_mesh(8)
    B = 64
    q = jnp.zeros((B, 7))
    q = mesh_mod.shard_problems(q, mesh)
    st = jax.jit(lambda q: compute_kinematics(kin.params, q).spheres)(q)
    assert len(st.sharding.device_set) == 8


class TestSeedAxisSharding:
    """2-D problems x seeds shard_map path (`solve_ik_sharded`): the
    cross-seed winner selection is an explicit all_gather over the sp
    axis — verified against the unsharded solve."""

    def _setup(self, kin, world, B=8, n_seeds=8, particles=False, lbfgs_iters=12):
        rng = np.random.RandomState(3)
        qg = jnp.asarray(
            np.asarray(kin.params.retract_config) + rng.uniform(-0.4, 0.4, (B, 7)),
            dtype=jnp.float32,
        )
        st = compute_kinematics(kin.params, qg)
        goals = Pose(st.tool_pose.position[:, 0], st.tool_pose.quaternion[:, 0])
        solver = IKSolver(
            kin.params,
            IKConfig(
                n_seeds=n_seeds,
                use_pallas=False,
                use_particle_stage=particles,
                mppi=MPPIConfig(n_particles=8, n_iters=2),
                lbfgs=LBFGSConfig(history=6, n_iters=lbfgs_iters),
            ),
        )
        from curobo_tpu.rollout.robot_rollout import Goal

        return solver, Goal.from_pose(goals), solver.generate_seeds(B)

    @pytest.mark.parametrize("dp,sp", [(2, 4), (4, 2)])
    def test_matches_unsharded_deterministic(self, kin, world, dp, sp):
        solver, goal, seeds = self._setup(kin, world)
        key = jax.random.PRNGKey(0)
        ref = jax.jit(solver._solve_impl)(world, goal, seeds, key)

        mesh = mesh_mod.make_mesh_2d(dp, sp)
        res = mesh_mod.solve_ik_sharded(solver, world, goal, seeds, key, mesh)
        # deterministic gradient-only path: winners must agree
        np.testing.assert_allclose(
            np.asarray(res.solution), np.asarray(ref.solution), atol=2e-5
        )
        np.testing.assert_array_equal(np.asarray(res.success), np.asarray(ref.success))
        assert len(res.solution.sharding.device_set) == dp * sp
        # the per-seed view stays sharded over both axes
        assert res.seed_solutions.shape == seeds.shape

    def test_with_particle_stage_converges(self, kin, world):
        # MPPI draws an independent stream per seed block, so assert
        # solve quality rather than bitwise equality
        solver, goal, seeds = self._setup(kin, world, particles=True, lbfgs_iters=24)
        mesh = mesh_mod.make_mesh_2d(2, 4)
        res = mesh_mod.solve_ik_sharded(
            solver, world, goal, seeds, jax.random.PRNGKey(1), mesh
        )
        assert int(jnp.sum(res.success)) >= 6  # 8 near-retract goals
        assert float(jnp.max(res.position_error[res.success])) < 5e-3

    def test_shape_validation(self, kin, world):
        solver, goal, seeds = self._setup(kin, world, B=6, n_seeds=8)
        mesh = mesh_mod.make_mesh_2d(4, 2)
        with pytest.raises(ValueError, match="must divide"):
            mesh_mod.solve_ik_sharded(
                solver, world, goal, seeds, jax.random.PRNGKey(0), mesh
            )
