"""Example: batched collision-free inverse kinematics on Franka.

Usage:
    python examples/inverse_kinematics.py [--test]

--test runs a small CPU-friendly configuration (the smoke-test mode the
test suite invokes, mirroring the reference's example pattern,
`curobo/tests/test_examples.py`).
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
    import jax
    import jax.numpy as jnp
    import numpy as np

    import curobo_tpu as ct

    kin = ct.Kinematics.from_robot_yaml(ct.robot_config_path("franka"))
    scene = ct.Scene().add(
        ct.Cuboid(name="table", pose=[0.4, 0.0, -0.1, 1, 0, 0, 0], dims=[1.2, 1.2, 0.2])
    )
    world = ct.compile_scene(scene)

    B = 4 if args.test else 100
    cfg = ct.IKConfig(n_seeds=8) if args.test else ct.IKConfig(n_seeds=32)
    solver = ct.IKSolver(kin.params, cfg)

    # reachable goals from FK of random configs
    rng = np.random.RandomState(0)
    lo = np.asarray(kin.params.joint_limits.lower)
    hi = np.asarray(kin.params.joint_limits.upper)
    span = hi - lo
    q_goal = jnp.asarray(
        rng.uniform(lo + 0.15 * span, hi - 0.15 * span, (B, kin.n_dof)), dtype=jnp.float32
    )
    st = ct.compute_kinematics(kin.params, q_goal)
    goals = ct.Pose(st.tool_pose.position[:, 0], st.tool_pose.quaternion[:, 0])

    t0 = time.perf_counter()
    res = solver.solve_pose(world, goals)
    res.solution.block_until_ready()
    t_compile = time.perf_counter() - t0
    t0 = time.perf_counter()
    res = solver.solve_pose(world, goals)
    res.solution.block_until_ready()
    t_solve = time.perf_counter() - t0

    succ = float(jnp.mean(res.success.astype(jnp.float32)))
    print(f"IK batch={B}: success={succ*100:.1f}%  solve={t_solve*1000:.1f}ms "
          f"(first call incl. compile: {t_compile:.1f}s)")
    perr = np.asarray(res.position_error)[np.asarray(res.success)]
    if len(perr):
        print(f"position error: median={np.median(perr)*1000:.4f}mm")
    if args.test:
        assert succ >= 0.5, "smoke test: expected at least half the goals solved"
        print("TEST PASSED")


if __name__ == "__main__":
    main()
