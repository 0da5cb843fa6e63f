"""Unitree G1 humanoid tests: floating-base kinematics, whole-body IK
(BASELINE config 5 scale: 49 dof, 674 spheres, >100k self-collision pairs)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from curobo_tpu.geom import world as wm
from curobo_tpu.robot.kinematics import Kinematics, compute_kinematics
from curobo_tpu.robot.params import JOINT_PRISMATIC
from curobo_tpu.types.pose import Pose

CONTENT = os.path.join(os.path.dirname(__file__), "..", "curobo_tpu", "content", "robots")


@pytest.fixture(scope="module")
def g1():
    return Kinematics.from_robot_yaml(os.path.join(CONTENT, "unitree_g1.yml"))


class TestG1Model:
    def test_scale(self, g1):
        p = g1.params
        assert p.n_dof == 49  # 6 floating base + 43 body
        assert p.n_spheres >= 600
        assert len(p.self_collision.pair_a) > 1000  # map-reduce scale
        assert p.joint_names[:3] == ("base_j_x", "base_j_y", "base_j_z")
        assert len(p.tool_frame_names) == 4  # both hands + both feet

    def test_floating_base_translates(self, g1):
        p = g1.params
        q = p.retract_config
        st0 = compute_kinematics(p, q)
        # move the virtual base 1m in x: every tool frame shifts by exactly 1m
        q2 = q.at[0].add(1.0)
        st1 = compute_kinematics(p, q2)
        np.testing.assert_allclose(
            np.asarray(st1.tool_pose.position - st0.tool_pose.position),
            np.tile([1.0, 0, 0], (4, 1)),
            atol=1e-5,
        )

    def test_floating_base_yaw(self, g1):
        p = g1.params
        q = p.retract_config.at[5].add(np.pi / 2)  # base_j_ztheta
        st = compute_kinematics(p, q)
        st0 = compute_kinematics(p, p.retract_config)
        # right hand's x/y swap under a 90 deg yaw about the base origin
        p0 = np.asarray(st0.tool_pose.position[0])
        p1 = np.asarray(st.tool_pose.position[0])
        np.testing.assert_allclose(p1[2], p0[2], atol=1e-5)
        np.testing.assert_allclose(p1[:2], [-p0[1], p0[0]], atol=1e-4)

    def test_batched_fk_and_self_collision(self, g1):
        p = g1.params
        rng = np.random.RandomState(0)
        B = 16
        q = jnp.asarray(
            p.retract_config + rng.uniform(-0.1, 0.1, (B, p.n_dof)), dtype=jnp.float32
        )
        st = compute_kinematics(p, q)
        assert st.spheres.shape == (B, p.n_spheres, 4)
        from curobo_tpu.geom.self_collision import self_collision_distance

        d = self_collision_distance(p.self_collision, st.spheres)
        assert d.shape == (B,)
        assert np.isfinite(np.asarray(d)).all()

    def test_dense_self_collision_matches_chunked(self, g1):
        """The gather-free dense S x S blast self-collision (G1's 162k-pair
        fast path) must agree with the chunked pair scan — values AND the
        recomputed custom_vjp gradient."""
        import curobo_tpu.ops.blast as bl

        p = g1.params
        S = p.n_spheres
        N = 16
        rng = np.random.RandomState(3)
        X = jnp.asarray(rng.uniform(-0.6, 0.6, (S, N)), jnp.float32)
        Y = jnp.asarray(rng.uniform(-0.6, 0.6, (S, N)), jnp.float32)
        Z = jnp.asarray(rng.uniform(0.0, 1.2, (S, N)), jnp.float32)
        act = 0.01

        dense = bl._self_collision_dense_fn(p, act)
        s_d, m_d = jax.jit(dense)(X, Y, Z)
        g_d = jax.jit(jax.grad(lambda x: jnp.sum(dense(x, Y, Z)[0])))(X)

        orig = bl._SC_DENSE_MIN_PAIRS
        bl._SC_DENSE_MIN_PAIRS = 10**9  # force the chunked scan path
        try:
            chunked = jax.jit(
                lambda a, b, c: bl.self_collision_blast(p, a, b, c, act)
            )
            s_c, m_c = chunked(X, Y, Z)
            g_c = jax.jit(
                jax.grad(
                    lambda x: jnp.sum(
                        bl.self_collision_blast(p, x, Y, Z, act)[0]
                    )
                )
            )(X)
        finally:
            bl._SC_DENSE_MIN_PAIRS = orig

        np.testing.assert_allclose(
            np.asarray(s_d), np.asarray(s_c), rtol=1e-5, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(m_d), np.asarray(m_c), atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(g_d), np.asarray(g_c), rtol=1e-4, atol=1e-5
        )


class TestG1IK:
    def test_whole_body_reach(self, g1):
        # small-batch whole-body IK: reach with the right hand while the
        # base stays near origin (null-space pulls toward retract)
        from curobo_tpu.opt.lbfgs import LBFGSConfig
        from curobo_tpu.opt.mppi import MPPIConfig
        from curobo_tpu.rollout.robot_rollout import RobotRolloutConfig
        from curobo_tpu.solver.ik import IKConfig, IKSolver

        p = g1.params
        world = wm.empty_world()
        # goal: FK of a perturbed config's right hand
        rng = np.random.RandomState(1)
        q_goal = jnp.asarray(
            p.retract_config
            + rng.uniform(-0.2, 0.2, (2, p.n_dof)) * (np.arange(p.n_dof) >= 6),
            dtype=jnp.float32,
        )
        st = compute_kinematics(p, q_goal)
        # single-tool goal on tool frame 0 is unsupported by blast (4 tools);
        # use the generic path with a 4-tool goalset = all four FK frames
        goals = Pose(st.tool_pose.position, st.tool_pose.quaternion)  # (2, 4)
        solver = IKSolver(
            p,
            IKConfig(
                n_seeds=4, use_blast=False, use_pallas=False,
                mppi=MPPIConfig(n_particles=8, n_iters=2, init_std=0.1),
                lbfgs=LBFGSConfig(history=8, n_iters=25, max_step=0.3),
                rollout=RobotRolloutConfig(null_space_weight=0.01),
            ),
        )
        res = solver.solve_pose(world, goals, seed_state=p.retract_config)
        # whole-body IK on 4 simultaneous tool goals: should get close
        assert float(jnp.min(res.position_error)) < 0.05
        assert np.isfinite(np.asarray(res.cost)).all()

    def test_task_config_success_rate(self, g1):
        """Strong success assertion on the shipped G1 task config
        (CPU-sized iteration counts; the full-size run is bench.py's
        g1_cfik suite vs the reference 526.87 ms / 98.4 % row)."""
        import dataclasses

        from curobo_tpu.cost import support_polygon as sp_mod
        from curobo_tpu.opt.lbfgs import LBFGSConfig
        from curobo_tpu.solver.ik import IKConfig, IKSolver

        p = g1.params
        cfg = IKConfig.from_yaml(
            os.path.join(CONTENT, "..", "tasks", "ik_g1.yml")
        )
        cfg = dataclasses.replace(
            cfg,
            n_seeds=6,
            # the blast-G1 solve graph takes >30 min to compile on CPU XLA
            # (fine on the TPU compiler — bench.py runs it there); CPU
            # tests use the generic path, whose agreement with blast is
            # enforced by test_blast_matches_generic_with_support_polygon
            use_blast=False,
            lbfgs=dataclasses.replace(cfg.lbfgs, n_iters=30),
            rollout=sp_mod.configure_rollout(
                cfg.rollout, p, np.asarray(p.retract_config)
            ),
        )
        world = wm.empty_world()
        rng = np.random.RandomState(5)
        B = 3
        body = (np.arange(p.n_dof) >= 6).astype(np.float32)
        q_goal = jnp.asarray(
            p.retract_config + rng.uniform(-0.2, 0.2, (B, p.n_dof)) * body,
            dtype=jnp.float32,
        )
        st = compute_kinematics(p, q_goal)
        goals = Pose(st.tool_pose.position, st.tool_pose.quaternion)  # (B, 4)
        solver = IKSolver(p, cfg)
        res = solver.solve_pose(world, goals, seed_state=p.retract_config)
        n_ok = int(jnp.sum(res.success))
        # every solve must meet the config's 10 mm / 0.1 rad tolerances
        assert n_ok == B, (
            f"G1 whole-body IK success {n_ok}/{B}; "
            f"pos_err={np.asarray(res.position_error)}"
        )
        assert float(jnp.max(res.position_error)) < cfg.position_threshold

    def test_hard_protocol_success_rate(self, g1):
        """The BENCHMARK protocol, CPU-sized (reference
        `benchmark/ik_benchmark.py:50-120` / bench.py bench_g1_cfik):
        FREE floating base, goals = FK of configs sampled uniform over the
        FULL joint limits (base box reduced to +-2 m for CPU runtime), 5 mm
        position threshold, LM seed pool. Round 3 shipped 0 % on this
        protocol (locked base + starved LM); assert >= 80 % here so the
        regression class is pinned by the suite."""
        import dataclasses

        from curobo_tpu.geom import types as gt
        from curobo_tpu.solver.ik import IKConfig, IKSolver

        p = g1.params
        cfg = IKConfig.from_yaml(
            os.path.join(CONTENT, "..", "tasks", "ik_g1.yml")
        )
        cfg = dataclasses.replace(
            cfg,
            n_seeds=4,
            lm_seed_pool=16,  # CPU-sized (bench runs the full 128 pool)
            use_blast=False,  # blast-G1 explodes CPU XLA compile (CLAUDE.md)
            use_particle_stage=False,
            lbfgs=dataclasses.replace(cfg.lbfgs, n_iters=30),
            position_threshold=0.005,
            rollout=dataclasses.replace(cfg.rollout, support_polygon=None),
        )
        world = wm.compile_scene(
            gt.Scene().add(
                gt.Cuboid(name="table", pose=[0, 0, -0.2, 1, 0, 0, 0],
                          dims=[4.0, 4.0, 0.2])
            )
        )
        rng = np.random.RandomState(7)
        B = 10
        lo = np.asarray(p.joint_limits.lower).copy()
        hi = np.asarray(p.joint_limits.upper).copy()
        lo[:3] = [-2.0, -2.0, 0.0]
        hi[:3] = [2.0, 2.0, 1.5]
        # collision-free goal configs (rejection sampling — the reference
        # `sample_configs` protocol; unvalidated full-range G1 configs
        # almost always self-collide, making 'feasible' unreachable)
        from curobo_tpu.collision.robot_scene import RobotSceneCollision

        rsc = RobotSceneCollision(p)
        pool, got = [], 0
        while got < B:
            cand = rng.uniform(lo, hi, (8 * B, p.n_dof)).astype(np.float32)
            ok = np.asarray(rsc.validate(world, jnp.asarray(cand)))
            pool.append(cand[ok])
            got += int(ok.sum())
        q_goal = jnp.asarray(np.concatenate(pool)[:B])
        st = compute_kinematics(p, q_goal)
        goals = Pose(st.tool_pose.position, st.tool_pose.quaternion)  # (B, 4)
        solver = IKSolver(p, cfg)
        res = solver.solve_pose(world, goals, seed_state=p.retract_config)
        n_ok = int(jnp.sum(res.success))
        assert n_ok >= int(0.8 * B), (
            f"G1 hard-protocol success {n_ok}/{B}; "
            f"pos_err={np.round(np.asarray(res.position_error), 4)}"
        )

    def test_blast_matches_generic_with_support_polygon(self, g1):
        """The B-last whole-body objective (multi-tool pose + chunked
        self-collision + CoM support-polygon balance) must agree with the
        generic rollout — the G1 task config now routes to blast."""
        from curobo_tpu.cost import support_polygon as sp_mod
        from curobo_tpu.ops.blast import BlastRollout
        from curobo_tpu.rollout.robot_rollout import Goal, RobotRollout
        from curobo_tpu.solver.ik import IKConfig

        p = g1.params
        cfg = IKConfig.from_yaml(
            os.path.join(CONTENT, "..", "tasks", "ik_g1.yml")
        ).rollout
        cfg = sp_mod.configure_rollout(cfg, p, np.asarray(p.retract_config))
        world = wm.empty_world()
        rng = np.random.RandomState(11)
        B = 4
        q = jnp.asarray(
            p.retract_config + rng.uniform(-0.3, 0.3, (B, p.n_dof)),
            dtype=jnp.float32,
        )
        st = compute_kinematics(p, q[:1])
        goal = Goal.from_pose(
            Pose(st.tool_pose.position, st.tool_pose.quaternion)
        )
        assert BlastRollout.supports(p, goal, cfg)
        rb = BlastRollout(p, cfg).evaluate_config(world, goal, q)
        rg = RobotRollout(p, cfg).evaluate_config(world, goal, q)
        np.testing.assert_allclose(
            np.asarray(rb.cost), np.asarray(rg.cost), rtol=2e-4, atol=2e-4
        )
        np.testing.assert_allclose(
            np.asarray(rb.pos_err), np.asarray(rg.pos_err), rtol=1e-4, atol=1e-5
        )
        np.testing.assert_array_equal(
            np.asarray(rb.feasible), np.asarray(rg.feasible)
        )


class TestG1Retarget:
    """The 29-dof retargeting variant (reference
    `unitree_g1_29dof_retarget.yml`): fixed hands, 14 mocap tool frames,
    6-dof virtual floating base spliced ahead of the pelvis."""

    @pytest.fixture(scope="class")
    def rt_kin(self):
        return Kinematics.from_robot_yaml(
            os.path.join(CONTENT, "unitree_g1_29dof_retarget.yml")
        )

    def test_model(self, rt_kin):
        p = rt_kin.params
        assert p.n_dof == 35  # 6 virtual base + 29 body
        assert len(p.tool_frame_names) == 14
        assert "pelvis" in p.tool_frame_names
        assert "left_ankle_roll_link" in p.tool_frame_names
        assert p.n_spheres >= 300
        # floating base: pelvis tracks virtual-base translation exactly
        q = p.retract_config
        st0 = compute_kinematics(p, q)
        st1 = compute_kinematics(p, q.at[2].add(0.5))
        pel = p.tool_frame_names.index("pelvis")
        np.testing.assert_allclose(
            np.asarray(st1.tool_pose.position[pel] - st0.tool_pose.position[pel]),
            [0.0, 0.0, 0.5],
            atol=1e-6,
        )

    def test_retargets_frame(self, rt_kin):
        from curobo_tpu.motion.retargeter import MotionRetargeter, RetargetConfig
        from curobo_tpu.opt.lbfgs import LBFGSConfig

        p = rt_kin.params
        rt = MotionRetargeter(
            p,
            RetargetConfig(
                tool_weights=((200.0, 20.0),),
                lbfgs=LBFGSConfig(history=8, n_iters=25, max_step=0.2),
            ),
        )
        q0 = p.retract_config
        st = compute_kinematics(p, q0)
        # target: shift the whole body pose set 10 cm forward (a pure
        # floating-base translation — exactly representable)
        goal = Pose(
            st.tool_pose.position[None] + jnp.asarray([0.10, 0.0, 0.0]),
            st.tool_pose.quaternion[None],
        )
        res = rt.solve_frame(goal, q0[None])
        q = res.joint_state.position
        st2 = compute_kinematics(p, q[0])
        err = np.linalg.norm(
            np.asarray(st2.tool_pose.position - goal.position[0]), axis=-1
        )
        assert float(err.max()) < 0.02, f"tool errors {err}"
