"""Example: humanoid motion retargeting — track hand/feet pose targets on
the Unitree G1 with the frame-chained local-IK retargeter.

Usage:
    python examples/humanoid_retargeting.py [--test]

Parity: reference `examples/getting_started/humanoid_retargeting.py`
(`MotionRetargeter`, `motion_retargeter.py:56`).
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
    from curobo_tpu.motion.retargeter import MotionRetargeter, RetargetConfig

    kin = ct.Kinematics.from_robot_yaml(ct.robot_config_path("unitree_g1"))
    p = kin.params
    q0 = jnp.asarray(np.asarray(p.retract_config), jnp.float32)
    st0 = ct.compute_kinematics(p, q0)

    # target sequence: right hand traces a small circle, the other tools
    # hold their retract poses (feet get high weight = stay planted)
    F = 4 if args.test else 40
    t = np.linspace(0, 2 * np.pi, F)
    pos = np.tile(np.asarray(st0.tool_pose.position), (F, 1, 1))  # (F, T, 3)
    pos[:, 0, 1] += 0.08 * np.sin(t)
    pos[:, 0, 2] += 0.08 * (1 - np.cos(t))
    quat = np.tile(np.asarray(st0.tool_pose.quaternion), (F, 1, 1))
    goals = ct.Pose(jnp.asarray(pos, jnp.float32), jnp.asarray(quat, jnp.float32))

    rt = MotionRetargeter(
        p,
        RetargetConfig(
            # hands track loosely in rotation, feet are pinned hard
            tool_weights=((80.0, 10.0), (80.0, 10.0), (400.0, 100.0), (400.0, 100.0)),
        ),
    )
    t0 = time.perf_counter()
    traj = rt.solve_sequence(goals, q0)
    traj.position.block_until_ready()
    dt = time.perf_counter() - t0

    # tracking error of the moving hand
    st = ct.compute_kinematics(p, traj.position)
    err = np.linalg.norm(
        np.asarray(st.tool_pose.position[:, 0]) - pos[:, 0], axis=-1
    )
    feet_drift = np.linalg.norm(
        np.asarray(st.tool_pose.position[:, 2:]) - pos[:, 2:], axis=-1
    ).max()
    print(f"retargeted {F} frames in {dt:.2f}s "
          f"({F/max(dt,1e-9):.1f} fps incl. compile)")
    print(f"right-hand tracking error: median {np.median(err)*1000:.1f} mm")
    print(f"max feet drift: {feet_drift*1000:.1f} mm")
    if args.test:
        assert np.median(err) < 0.03
        assert feet_drift < 0.05
        print("TEST PASSED")


if __name__ == "__main__":
    main()
