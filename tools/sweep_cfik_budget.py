"""Sweep the Franka CF-IK in-kernel budget on the real TPU.

Reproduces the bench protocol (B=100, 32 seeds, collision-free FK goals,
table world) and measures pipelined per-solve time + success for a grid of
(warmup, mppi_iters, lbfgs_iters, n_linesearch) budgets. One process, one
world envelope — kernels compile per budget (~1-3 min each remotely), so
keep the grid small.

Usage: python tools/sweep_cfik_budget.py "16,2,20,6" "16,2,20,4" ...
(each arg = warmup,mppi,lbfgs,linesearch)
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax

    from curobo_tpu import runtime as rt

    rt.enable_compilation_cache()
    sys.path.insert(0, "/root/repo")
    import bench as bench_mod
    from curobo_tpu.rollout.robot_rollout import Goal
    from curobo_tpu.solver.ik import IKSolver

    kin, world, goals = bench_mod._franka_cfik_setup()
    B = goals.position.shape[0]
    goal = Goal.from_pose(goals)
    keys = [jax.random.PRNGKey(i) for i in range(32)]

    budgets = []
    for arg in sys.argv[1:]:
        w, m, l, ls = (int(x) for x in arg.split(","))
        budgets.append((w, m, l, ls))
    if not budgets:
        budgets = [(16, 2, 20, 6), (16, 2, 20, 4), (24, 2, 16, 4)]

    import dataclasses

    for (w, m, l, ls) in budgets:
        cfg = dataclasses.replace(
            bench_mod._franka_ik_config(warmup=w, mppi_iters=m, lbfgs_iters=l),
            kernel_linesearch=ls,
        )
        solver = IKSolver(kin.params, cfg)
        seeds = solver.generate_seeds(B)
        t0 = time.time()
        solve = solver._get_pallas_solver(world)
        res = solve(world, goal, seeds, keys[0])
        res.solution.block_until_ready()
        compile_s = time.time() - t0
        t_ms, res = bench_mod._pipelined_ms(
            solve, world, goal, seeds, keys, K=32, reps=4
        )
        succ = float(np.mean(np.asarray(res.success, dtype=np.float32)))
        # success across key diversity (protocol: every run must hold)
        succs = [succ]
        for i in range(1, 8):
            r = solve(world, goal, seeds, keys[i])
            succs.append(
                float(np.mean(np.asarray(r.success, dtype=np.float32)))
            )
        print(
            f"warmup={w} mppi={m} lbfgs={l} ls={ls}: {t_ms:.3f} ms "
            f"success min/mean {min(succs):.3f}/{np.mean(succs):.4f} "
            f"(compile {compile_s:.0f}s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
