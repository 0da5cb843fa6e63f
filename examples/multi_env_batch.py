"""Example: multi-environment batched collision queries + batch planning —
each problem in the batch lives in its OWN world (reference
SolveMode.MULTI_ENV / `env_query_idx` routing).

Usage:
    python examples/multi_env_batch.py [--test]
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
    import jax
    import jax.numpy as jnp
    import numpy as np

    import curobo_tpu as ct
    from curobo_tpu.geom import world as wm
    from curobo_tpu.rollout.robot_rollout import Goal, RobotRollout, RobotRolloutConfig

    kin = ct.Kinematics.from_robot_yaml(ct.robot_config_path("franka"))

    # two different worlds: a table, and a table plus a hanging ball
    w0 = ct.compile_scene(ct.Scene().add(
        ct.Cuboid(name="table", pose=[0.4, 0, -0.1, 1, 0, 0, 0], dims=[1.2, 1.2, 0.2])),
        capacities={"cuboid": 2, "sphere": 1},
    )
    w1 = ct.compile_scene(ct.Scene().add(
        ct.Cuboid(name="table", pose=[0.4, 0, -0.1, 1, 0, 0, 0], dims=[1.2, 1.2, 0.2]),
        ct.SphereObstacle(name="ball", pose=[0.45, 0.0, 0.5, 1, 0, 0, 0], radius=0.12)),
        capacities={"cuboid": 2, "sphere": 1},
    )
    worlds = wm.stack_worlds([w0, w1])

    # 4 problems routed to alternating environments
    B = 4
    env_idx = jnp.asarray([0, 1, 0, 1], jnp.int32)
    rng = np.random.RandomState(0)
    q = jnp.asarray(
        kin.params.retract_config + rng.uniform(-0.3, 0.3, (B, kin.n_dof)),
        jnp.float32,
    )
    st = ct.compute_kinematics(kin.params, q)
    goal = Goal.from_pose(ct.Pose(st.tool_pose.position[:, 0],
                                  st.tool_pose.quaternion[:, 0]))
    rollout = RobotRollout(kin.params, RobotRolloutConfig())
    res = jax.jit(
        lambda ei: rollout.evaluate_config_env(worlds, ei, goal, q)
    )(env_idx)
    print("per-problem env routing:", np.asarray(env_idx))
    print("in_collision:", np.asarray(res.in_collision))

    # batch planning over many goals in one world (chunked solver batches)
    planner = ct.BatchMotionPlanner(
        kin.params,
        ct.MotionPlanConfig(max_attempts=1, enable_graph_attempt=-1)
        if args.test else ct.MotionPlanConfig(),
        max_batch_size=8,
    )
    rsc = ct.RobotSceneCollision(kin.params)
    n = 4 if args.test else 24
    q0, _ = rsc.sample(w0, n, key=jax.random.PRNGKey(0))
    qg, _ = rsc.sample(w0, n, key=jax.random.PRNGKey(1))
    stg = ct.compute_kinematics(kin.params, qg)
    goals = ct.Pose(stg.tool_pose.position[:, 0], stg.tool_pose.quaternion[:, 0])
    out = planner.plan_pose(w0, goals, ct.JointState.from_position(
        q0, kin.params.joint_names))
    succ = float(np.mean(np.asarray(out.success)))
    print(f"batch plan: {n} problems, success {succ*100:.0f}%")
    if args.test:
        assert succ >= 0.5
        print("TEST PASSED")


if __name__ == "__main__":
    main()
