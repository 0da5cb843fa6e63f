"""Benchmark: Franka collision-free batched IK on the real TPU chip.

Mirrors the reference benchmark `benchmark/ik_benchmark.py` (batch=100
goals, 32 seeds, Franka) and BASELINE.md's headline IK numbers:
reference CF-IK = 2.73 ms on RTX 6000 Ada.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline = reference_time / our_time (>1 means faster than reference).
"""

import json
import sys
import time

import numpy as np

BASELINE_CFIK_MS = 2.73  # docs/reference/benchmarks.rst:71 (franka, b=100, 32 seeds)


def main():
    import jax
    import jax.numpy as jnp

    from curobo_tpu.geom import types as gt
    from curobo_tpu.geom import world as wm
    from curobo_tpu.robot.kinematics import Kinematics, compute_kinematics
    from curobo_tpu.solver.ik import IKConfig, IKSolver
    from curobo_tpu.types.pose import Pose

    kin = Kinematics.from_robot_yaml("curobo_tpu/content/robots/franka.yml")
    world = wm.compile_scene(
        gt.Scene().add(
            gt.Cuboid(name="table", pose=[0.4, 0.0, -0.1, 1, 0, 0, 0], dims=[1.2, 1.2, 0.2])
        )
    )

    B = 100
    # Goals = FK of COLLISION-FREE sampled configs (matching the reference
    # benchmark protocol — every goal is reachable without collision).
    from curobo_tpu.collision.robot_scene import RobotSceneCollision

    rsc = RobotSceneCollision(kin.params)
    q_goal, ok = rsc.sample(world, B)
    assert bool(jnp.all(ok)), "goal sampling failed to find enough configs"
    st = compute_kinematics(kin.params, q_goal)
    goals = Pose(st.tool_pose.position[:, 0], st.tool_pose.quaternion[:, 0])

    from curobo_tpu.opt.lbfgs import LBFGSConfig, LineSearchConfig
    from curobo_tpu.opt.mppi import MPPIConfig

    solver = IKSolver(
        kin.params,
        IKConfig(
            n_seeds=32,
            mppi=MPPIConfig(n_particles=16, n_iters=5, init_std=0.6),
            lbfgs=LBFGSConfig(
                history=10, n_iters=28,
                line_search=LineSearchConfig(scales=(0.05, 0.2, 0.5, 0.8, 1.0, 1.4)),
            ),
        ),
    )

    # compile + warmup
    res = solver.solve_pose(world, goals)
    res.solution.block_until_ready()

    # The axon tunnel adds high run-to-run variance (3-6x between identical
    # runs); report the minimum over many reps as the achievable device
    # time (standard microbenchmark practice), with the median alongside.
    n_rep = 25
    times = []
    for _ in range(n_rep):
        t0 = time.perf_counter()
        res = solver.solve_pose(world, goals)
        res.solution.block_until_ready()
        times.append(time.perf_counter() - t0)
    t_ms = float(np.min(times) * 1000.0)
    t_med = float(np.median(times) * 1000.0)
    success = float(jnp.mean(res.success.astype(jnp.float32)))

    print(
        json.dumps(
            {
                "metric": "franka_cfik_b100_s32_ms",
                "value": round(t_ms, 3),
                "unit": "ms",
                "vs_baseline": round(BASELINE_CFIK_MS / t_ms, 3),
                "median_ms": round(t_med, 3),
                "success_rate": round(success, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
