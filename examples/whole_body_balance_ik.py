"""Example: Unitree G1 whole-body IK with the support-polygon balance cost —
reach with both hands while the CoM stays inside the foot-support hull.

Usage:
    python examples/whole_body_balance_ik.py [--test]

Parity: reference humanoid whole-body IK + `CostSupportPolygon`
(`cost_support_polygon.py:109`); task config `content/tasks/ik_g1.yml`.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--test", action="store_true")
    args = ap.parse_args()

    if args.test:
        os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")
        import jax

        jax.config.update("jax_platforms", "cpu")
    import dataclasses
    import time

    import jax.numpy as jnp
    import numpy as np

    import curobo_tpu as ct
    from curobo_tpu.cost import support_polygon as sp
    from curobo_tpu.opt.lbfgs import LBFGSConfig
    from curobo_tpu.opt.mppi import MPPIConfig
    from curobo_tpu.robot.kinematics import compute_com

    kin = ct.Kinematics.from_robot_yaml(ct.robot_config_path("unitree_g1"))
    p = kin.params
    cfg = ct.IKConfig.from_yaml(os.path.join(
        os.path.dirname(ct.robot_config_path("unitree_g1")), "..", "tasks",
        "ik_g1.yml"))
    # bake the stance hull from the retract (standing) pose
    cfg = dataclasses.replace(
        cfg, rollout=sp.configure_rollout(cfg.rollout, p,
                                          np.asarray(p.retract_config)))
    if args.test:
        cfg = dataclasses.replace(
            cfg, n_seeds=2,
            mppi=MPPIConfig(n_particles=4, n_iters=2, init_std=0.08),
            lbfgs=LBFGSConfig(history=8, n_iters=18, max_step=0.25),
        )
    hull = np.asarray(cfg.rollout.support_hull)
    print(f"stance support hull: {len(hull)} vertices")

    world = ct.compile_scene(ct.Scene())
    B = 2 if args.test else 8
    rng = np.random.RandomState(4)
    body = (np.arange(p.n_dof) >= 6).astype(np.float32)
    q_goal = jnp.asarray(
        np.asarray(p.retract_config)
        + rng.uniform(-0.2, 0.2, (B, p.n_dof)) * body, jnp.float32)
    st = ct.compute_kinematics(p, q_goal)
    goals = ct.Pose(st.tool_pose.position, st.tool_pose.quaternion)  # (B, 4)

    solver = ct.IKSolver(p, cfg)
    t0 = time.perf_counter()
    res = solver.solve_pose(world, goals, seed_state=p.retract_config)
    res.solution.block_until_ready()
    dt = time.perf_counter() - t0

    st_sol = ct.compute_kinematics(p, res.solution)
    com = compute_com(p, st_sol.link_rot, st_sol.link_pos)
    sd = sp.signed_distance_to_hull(
        com[..., :2], jnp.asarray(hull, jnp.float32))
    print(f"solved {B} whole-body goals in {dt:.1f}s (incl. compile)")
    print(f"max position error: {float(jnp.max(res.position_error))*1000:.1f} mm")
    print(f"CoM margin inside support hull: {np.asarray(-sd).round(3)} m")
    if args.test:
        assert float(jnp.max(res.position_error)) < 0.05
        assert float(jnp.max(sd)) < 0.0, "CoM left the support polygon"
        print("TEST PASSED")


if __name__ == "__main__":
    main()
