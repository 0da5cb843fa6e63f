"""Example: collision-free motion generation (IK -> trajopt) on Franka.

Usage: python examples/motion_planning.py [--test]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--test", action="store_true")
    args = ap.parse_args()

    if args.test:
        os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    import curobo_tpu as ct
    from curobo_tpu.opt.lbfgs import LBFGSConfig
    from curobo_tpu.util.metrics import GroupMetrics, PlanMetrics

    kin = ct.Kinematics.from_robot_yaml(ct.robot_config_path("franka"))
    world = ct.compile_scene(
        ct.Scene().add(
            ct.Cuboid(name="table", pose=[0.4, 0.0, -0.1, 1, 0, 0, 0], dims=[1.2, 1.2, 0.2]),
            ct.Cuboid(name="shelf", pose=[0.5, 0.3, 0.45, 1, 0, 0, 0], dims=[0.3, 0.1, 0.02]),
        )
    )

    cfg = ct.MotionPlanConfig(
        ik=ct.IKConfig(n_seeds=8 if args.test else 24),
        trajopt=ct.TrajOptConfig(
            n_seeds=2,
            lbfgs=LBFGSConfig(history=12, n_iters=30 if args.test else 80, max_step=0.5),
            finetune_attempts=1,
        ),
        n_trajopt_seeds=2,
        max_attempts=1 if args.test else 2,
    )
    planner = ct.MotionPlanner(kin.params, cfg)

    B = 2 if args.test else 16
    rng = np.random.RandomState(1)
    lo = np.asarray(kin.params.joint_limits.lower)
    hi = np.asarray(kin.params.joint_limits.upper)
    span = hi - lo
    q_goal = jnp.asarray(
        rng.uniform(lo + 0.25 * span, hi - 0.25 * span, (B, kin.n_dof)), dtype=jnp.float32
    )
    st = ct.compute_kinematics(kin.params, q_goal)
    goals = ct.Pose(st.tool_pose.position[:, 0], st.tool_pose.quaternion[:, 0])
    start = ct.JointState.from_position(
        jnp.broadcast_to(kin.params.retract_config, (B, kin.n_dof)),
        kin.params.joint_names,
    )

    res = planner.plan_pose(world, goals, start)
    ms = [PlanMetrics.from_result(res, i) for i in range(B)]
    g = GroupMetrics.aggregate(ms)
    print(f"plan batch={B}: success={g.success_rate*100:.0f}%  "
          f"plan_time={res.plan_time:.2f}s  motion_time={g.motion_time_mean:.2f}s  "
          f"path_len={g.path_length_mean:.2f}rad")
    if args.test:
        assert g.success_rate > 0 or bool(jnp.any(res.ik_success)), "no progress"
        print("TEST PASSED")


if __name__ == "__main__":
    main()
