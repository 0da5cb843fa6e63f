"""In-kernel IK solver loop + metrics-tail tests (block-level, CPU).

`build_mppi_solver` / `build_lbfgs_solver` / `build_solver`
(ops/pallas_ik.py) are what bench.py runs on TPU; their loop bodies and the
fused metrics tail are plain jnp, tested here by direct tracing (see
tests/test_pallas_traj.py for why interpret mode is avoided). The MPPI
sampler is injected — the on-core TPU PRNG has no CPU lowering.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from curobo_tpu.geom import types as gt
from curobo_tpu.geom import world as wm
from curobo_tpu.robot.kinematics import Kinematics, compute_kinematics
from curobo_tpu.rollout.robot_rollout import Goal, RobotRolloutConfig
from curobo_tpu.types.pose import Pose

CONTENT = os.path.join(os.path.dirname(__file__), "..", "curobo_tpu", "content", "robots")


@pytest.fixture(scope="module")
def setup():
    from curobo_tpu.ops.blast import BlastRollout
    from curobo_tpu.ops.pallas_ik import PallasIKCost

    kin = Kinematics.from_robot_yaml(os.path.join(CONTENT, "ur10e.yml"))
    world = wm.compile_scene(
        gt.Scene().add(
            gt.Cuboid(name="table", pose=[0.4, 0, -0.1, 1, 0, 0, 0], dims=[1.2, 1.2, 0.2]),
            gt.SphereObstacle(name="ball", pose=[0.35, 0.2, 0.45, 1, 0, 0, 0], radius=0.08),
        )
    )
    cfg = RobotRolloutConfig()
    return kin, world, cfg, BlastRollout(kin.params, cfg), PallasIKCost(kin.params, cfg, world)


@pytest.fixture(scope="module")
def problem(setup):
    from curobo_tpu.ops.pallas_ik import BLK, LANE, SUB

    kin, world, cfg, blast, pik = setup
    N = BLK
    D = kin.params.n_dof
    rng = np.random.RandomState(3)
    q0 = jnp.asarray(rng.uniform(-1.5, 1.5, (N, D)), jnp.float32)
    qg = jnp.asarray(rng.uniform(-1.5, 1.5, (N, D)), jnp.float32)
    st = compute_kinematics(kin.params, qg)
    goal = Goal.from_pose(
        Pose(st.tool_pose.position[:, 0], st.tool_pose.quaternion[:, 0])
    )
    goal7 = jnp.concatenate(
        [st.tool_pose.position[:, 0], st.tool_pose.quaternion[:, 0]], axis=-1
    )
    from curobo_tpu.ops.pallas_ik import pack_world_arrays

    goal_blk = jnp.moveaxis(goal7.reshape(SUB, LANE, 7), -1, 0)
    q_blk = jnp.moveaxis(q0.reshape(SUB, LANE, D), -1, 0)
    refs = pack_world_arrays(world)
    return dict(N=N, D=D, q0=q0, qg=qg, goal=goal, goal7=goal7,
                goal_blk=goal_blk, q_blk=q_blk, refs=refs)


def _clip_fn(pik):
    return pik._clip_q_fn()


class TestMetricsTail:
    def test_metrics_match_blast(self, setup, problem):
        """The fused solver kernel's metrics tail must agree with the blast
        metrics pass it replaced in IKSolver._solve_impl_pallas."""
        kin, world, cfg, blast, pik = setup
        p = problem
        _, _, _, metrics_fn = pik._cost_fns(
            p["refs"], p["goal_blk"], pik._D_pair, pik._margin
        )
        c, pe, re, fe = jax.jit(metrics_fn)(p["q_blk"])
        res = blast.evaluate_config(world, p["goal"], p["q0"])
        N = p["N"]
        np.testing.assert_allclose(
            np.asarray(pe.reshape(N)), np.asarray(res.pos_err), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(re.reshape(N)), np.asarray(res.rot_err), atol=2e-5
        )
        np.testing.assert_allclose(
            np.asarray(c.reshape(N)), np.asarray(res.cost), rtol=1e-4, atol=1e-3
        )
        agree = np.mean(np.asarray((fe.reshape(N) > 0.5) == res.feasible))
        assert agree == 1.0


class TestInKernelLBFGS:
    def test_descends_and_matches_xla_path(self, setup, problem):
        from curobo_tpu.opt.lbfgs import LBFGSConfig, lbfgs_optimize
        from curobo_tpu.ops.pallas_ik import LANE, SUB

        kin, world, cfg, blast, pik = setup
        p = problem
        clip_q = _clip_fn(pik)

        cost_fn, cost_grad, _, _ = pik._cost_fns(
            p["refs"], p["goal_blk"], pik._D_pair, pik._margin
        )

        c0 = jax.jit(cost_fn)(p["q_blk"])
        best_x, best_c = jax.jit(
            lambda q: pik._lbfgs_loop(
                cost_fn, clip_q, q, n_iters=20, history=8, max_step=1.0,
                n_linesearch=6, ls_base=1.5, ls_ratio=0.45,
                cost_grad=cost_grad,
            )
        )(p["q_blk"])
        assert float(jnp.mean(best_c)) < 0.2 * float(jnp.mean(c0))
        assert float(jnp.max(best_c - c0)) <= 1e-5

        D = p["D"]

        def cost_flat(x):  # (..., N, D) -> (..., N)
            lead = x.shape[:-1]
            xb = jnp.moveaxis(x, -1, 0).reshape((D,) + lead[:-1] + (SUB, LANE))
            return cost_fn(xb).reshape(lead)

        _, c_xla = lbfgs_optimize(
            cost_flat, p["q0"], LBFGSConfig(history=8, n_iters=20, max_step=1.0)
        )
        assert float(jnp.mean(best_c)) <= 1.3 * float(jnp.mean(c_xla)) + 1e-3


class TestInKernelMPPI:
    def test_descends_deterministically(self, setup, problem):
        kin, world, cfg, blast, pik = setup
        p = problem
        clip_q = _clip_fn(pik)

        cost_fn, _, _, _ = pik._cost_fns(
            p["refs"], p["goal_blk"], pik._D_pair, pik._margin
        )

        def normal_fn(key, shape):
            key, sub = jax.random.split(key)
            return key, jax.random.normal(sub, shape, jnp.float32)

        run = jax.jit(
            lambda q, key: pik._mppi_loop(
                cost_fn, clip_q, q, n_iters=4, n_particles=12,
                init_std=0.5, std_decay=0.9, min_std=0.01,
                temperature=0.05, step_size=0.9,
                rng=(key, normal_fn),
            )
        )
        c0 = jax.jit(cost_fn)(p["q_blk"])
        x1, c1 = run(p["q_blk"], jax.random.PRNGKey(11))
        x2, c2 = run(p["q_blk"], jax.random.PRNGKey(11))
        np.testing.assert_array_equal(np.asarray(x1), np.asarray(x2))
        # exploration with best-tracking: mean strictly improves, and no
        # lane ever regresses past the evaluated start
        assert float(jnp.mean(c1)) < float(jnp.mean(c0))
        assert float(jnp.max(c1 - c0)) <= 1e-5

    def test_mppi_then_lbfgs_stacks(self, setup, problem):
        """The fused build_solver sequence (MPPI warm start -> L-BFGS)
        should beat L-BFGS alone from cold seeds."""
        kin, world, cfg, blast, pik = setup
        p = problem
        clip_q = _clip_fn(pik)

        cost_fn, _, _, _ = pik._cost_fns(
            p["refs"], p["goal_blk"], pik._D_pair, pik._margin
        )

        def normal_fn(key, shape):
            key, sub = jax.random.split(key)
            return key, jax.random.normal(sub, shape, jnp.float32)

        def staged(q, key):
            x, _ = pik._mppi_loop(
                cost_fn, clip_q, q, n_iters=4, n_particles=12,
                init_std=0.5, std_decay=0.9, min_std=0.01,
                temperature=0.05, step_size=0.9, rng=(key, normal_fn),
            )
            return pik._lbfgs_loop(
                cost_fn, clip_q, x, n_iters=12, history=8, max_step=1.0,
                n_linesearch=6, ls_base=1.5, ls_ratio=0.45,
            )

        def cold(q):
            return pik._lbfgs_loop(
                cost_fn, clip_q, q, n_iters=12, history=8, max_step=1.0,
                n_linesearch=6, ls_base=1.5, ls_ratio=0.45,
            )

        _, c_staged = jax.jit(staged)(p["q_blk"], jax.random.PRNGKey(0))
        _, c_cold = jax.jit(cold)(p["q_blk"])
        assert float(jnp.mean(c_staged)) <= float(jnp.mean(c_cold)) + 1e-4
