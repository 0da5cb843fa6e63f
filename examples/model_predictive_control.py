"""Example: reactive MPC tracking a moving goal with a moving obstacle.

Usage: python examples/model_predictive_control.py [--test]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--test", action="store_true")
    ap.add_argument("--ticks", type=int, default=None)
    args = ap.parse_args()

    if args.test:
        os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    import curobo_tpu as ct

    kin = ct.Kinematics.from_robot_yaml(ct.robot_config_path("franka"))
    scene = ct.Scene().add(
        ct.Cuboid(name="table", pose=[0.4, 0.0, -0.1, 1, 0, 0, 0], dims=[1.2, 1.2, 0.2]),
        ct.SphereObstacle(name="drone", pose=[0.5, 0.4, 0.6, 1, 0, 0, 0], radius=0.08),
    )
    world = ct.compile_scene(scene)

    solver = ct.MPCSolver(kin.params)
    q0 = kin.params.retract_config[None]
    st = ct.compute_kinematics(kin.params, q0 + 0.3)
    goal = solver.make_goal(ct.Pose(st.tool_pose.position[:, 0], st.tool_pose.quaternion[:, 0]))

    state = solver.setup(q0)
    js = ct.JointState.from_position(q0, kin.params.joint_names)
    ticks = args.ticks or (15 if args.test else 100)
    import time

    times = []
    for tick in range(ticks):
        # moving obstacle: the drone drifts through the workspace
        world = world.update_obstacle_pose(
            "drone", [0.5, 0.4 - 0.003 * tick, 0.6], [1, 0, 0, 0]
        )
        t0 = time.perf_counter()
        res, state = solver.step(world, goal, state, js)
        res.command.position.block_until_ready()
        times.append(time.perf_counter() - t0)
        js = ct.JointState(
            position=res.command.position, velocity=res.command.velocity,
            joint_names=js.joint_names,
        )
        if tick % 10 == 0:
            print(f"tick {tick:3d}: pose_err={float(res.pos_err[0]):.4f} "
                  f"feasible={bool(res.feasible[0])} tick_time={times[-1]*1000:.1f}ms")
    warm = times[2:]
    print(f"warm tick time: median={np.median(warm)*1000:.1f}ms "
          f"-> {1.0/np.median(warm):.0f} Hz achievable")
    if args.test:
        assert float(res.pos_err[0]) < 0.2
        print("TEST PASSED")


if __name__ == "__main__":
    main()
