"""Example: plan while holding a grasped object — attach a box payload as
extra collision spheres, plan around an obstacle, then detach.

Usage:
    python examples/attached_object.py [--test]

Parity: reference `AttachmentManager` usage
(`curobo/_src/collision/attachment_manager.py:24`).
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

    kin = ct.Kinematics.from_robot_yaml(ct.robot_config_path("franka"))
    am = ct.AttachmentManager(kin.params, link_name="attached_object")
    print(f"robot has {am.n_slots} reserved attachment sphere slots")

    world = ct.compile_scene(ct.Scene().add(
        ct.Cuboid(name="table", pose=[0.4, 0.0, -0.1, 1, 0, 0, 0], dims=[1.2, 1.2, 0.2]),
    ))
    rsc_free = ct.RobotSceneCollision(kin.params)

    # grasp a 12 cm box: attach it to the hand
    params_loaded = am.attach_box(
        kin.params, half_dims=(0.03, 0.03, 0.06), offset=(0.0, 0.0, 0.10)
    )
    rsc_loaded = ct.RobotSceneCollision(params_loaded)

    # the payload shrinks the feasible space: of configs valid for the
    # free hand, some become invalid once the box is attached
    q_probe, ok_free = rsc_free.sample(world, 32, key=jax.random.PRNGKey(7))
    ok_loaded = rsc_loaded.validate(world, q_probe)
    n_free = int(jnp.sum(ok_free))
    n_loaded = int(jnp.sum(ok_free & ok_loaded))
    print(f"of {n_free} collision-free configs, {n_loaded} stay valid "
          f"with the payload attached")

    # plan with the payload: the planner uses the augmented sphere model
    planner = ct.MotionPlanner(
        params_loaded,
        ct.MotionPlanConfig() if not args.test else ct.MotionPlanConfig(
            max_attempts=1, enable_graph_attempt=-1
        ),
    )
    q0, ok0 = rsc_loaded.sample(world, 2, key=jax.random.PRNGKey(0))
    qg, okg = rsc_loaded.sample(world, 2, key=jax.random.PRNGKey(1))
    st = ct.compute_kinematics(params_loaded, qg)
    goals = ct.Pose(st.tool_pose.position[:, 0], st.tool_pose.quaternion[:, 0])
    start = ct.JointState.from_position(q0, params_loaded.joint_names)
    res = planner.plan_pose(world, goals, start)
    print(f"planned with payload: success={np.asarray(res.success)}")

    # detach: spheres deactivate, no recompile of the world
    params_empty = am.detach(params_loaded)
    print("detached; payload spheres disabled:",
          bool(jnp.all(params_empty.sphere_radii[jnp.asarray(am._slots)] < 0)))
    if args.test:
        assert bool(np.any(np.asarray(res.success)))
        print("TEST PASSED")


if __name__ == "__main__":
    main()
