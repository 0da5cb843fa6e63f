"""Task YAML configs must load into the real config classes and drive real
solves — guards against config drift from the Python defaults (the configs
are the public task API, parity: reference `content/configs/task/`)."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

TASKS = os.path.join(
    os.path.dirname(__file__), "..", "curobo_tpu", "content", "tasks"
)
ROBOTS = os.path.join(
    os.path.dirname(__file__), "..", "curobo_tpu", "content", "robots"
)


class TestTaskYamlLoad:
    def test_ik_yaml(self):
        from curobo_tpu.solver.ik import IKConfig

        cfg = IKConfig.from_yaml(os.path.join(TASKS, "ik.yml"))
        assert cfg.n_seeds == 32
        assert cfg.rollout.pose_cost.position_weight == 50.0
        assert cfg.lbfgs.line_search.kind == "strong_wolfe"

    def test_trajopt_yaml(self):
        from curobo_tpu.solver.trajopt import TrajOptConfig

        cfg = TrajOptConfig.from_yaml(os.path.join(TASKS, "trajopt.yml"))
        assert cfg.bspline.n_control >= 8

    def test_mpc_yaml(self):
        from curobo_tpu.solver.mpc import MPCConfig

        cfg = MPCConfig.from_yaml(os.path.join(TASKS, "mpc.yml"))
        assert cfg.control_dt > 0

    def test_ik_g1_yaml_support_polygon(self):
        from curobo_tpu.solver.ik import IKConfig

        cfg = IKConfig.from_yaml(os.path.join(TASKS, "ik_g1.yml"))
        sp = cfg.rollout.support_polygon
        assert sp is not None and sp.weight == 50.0
        assert sp.foot_link_names == (
            "left_ankle_roll_link", "right_ankle_roll_link",
        )

    def test_unknown_key_raises(self):
        from curobo_tpu.solver.ik import IKConfig

        with pytest.raises(ValueError, match="unknown config key"):
            IKConfig.from_yaml({"not_a_field": 1})


class TestG1BalanceIK:
    def test_yaml_driven_balance_solve(self):
        """End-to-end: ik_g1.yml -> hull baked -> whole-body solve keeps the
        CoM inside the support polygon while reaching."""
        import dataclasses

        import jax

        from curobo_tpu.cost import support_polygon as sp_mod
        from curobo_tpu.geom import world as wm
        from curobo_tpu.robot.kinematics import (
            Kinematics,
            compute_com,
            compute_kinematics,
        )
        from curobo_tpu.solver.ik import IKConfig, IKSolver
        from curobo_tpu.types.pose import Pose

        kin = Kinematics.from_robot_yaml(os.path.join(ROBOTS, "unitree_g1.yml"))
        p = kin.params
        cfg = IKConfig.from_yaml(os.path.join(TASKS, "ik_g1.yml"))
        # shrink for CPU test speed; semantics unchanged
        from curobo_tpu.opt.lbfgs import LBFGSConfig
        from curobo_tpu.opt.mppi import MPPIConfig

        cfg = dataclasses.replace(
            cfg,
            n_seeds=2,
            # the yaml's 128-seed x 60-iter LM pool is benchmark scale —
            # tens of CPU-minutes of generic-rollout G1 FK; the semantics
            # under test (hull baking + balance solve) need only a small
            # warm start
            lm_seed_pool=8,
            lm_seed_iters=25,
            # CLAUDE.md rule: G1 on CPU must use the generic rollout —
            # the scalarized blast graph explodes the XLA CPU compile
            use_blast=False,
            mppi=MPPIConfig(n_particles=8, n_iters=6, init_std=0.06),
            # no gradient stage: the vjp of the generic 674-sphere G1
            # rollout is the dominant XLA CPU compile (~20+ min); the LM
            # warm start + MPPI polish reach the 5 cm bar without it
            use_gradient_stage=False,
            rollout=sp_mod.configure_rollout(
                cfg.rollout, p, np.asarray(p.retract_config)
            ),
        )
        assert cfg.rollout.support_hull is not None

        world = wm.empty_world()
        rng = np.random.RandomState(2)
        body = (np.arange(p.n_dof) >= 6).astype(np.float32)
        q_goal = jnp.asarray(
            p.retract_config + rng.uniform(-0.15, 0.15, (2, p.n_dof)) * body,
            jnp.float32,
        )
        st = compute_kinematics(p, q_goal)
        goals = Pose(st.tool_pose.position, st.tool_pose.quaternion)  # (2, 4)
        solver = IKSolver(p, cfg)
        res = solver.solve_pose(world, goals, seed_state=p.retract_config)

        assert np.isfinite(np.asarray(res.cost)).all()
        assert float(jnp.max(res.position_error)) < 0.05
        # solution CoM stays inside the stance hull
        st_sol = compute_kinematics(p, res.solution)
        com = compute_com(p, st_sol.link_rot, st_sol.link_pos)
        hull = jnp.asarray(cfg.rollout.support_hull, jnp.float32)
        sd = sp_mod.signed_distance_to_hull(com[..., :2], hull)
        assert float(jnp.max(sd)) < 0.0
