"""Sweep the dual-UR10e CF-IK budget on the real TPU.

Driver capture r5 run1: 390.8 ms / 99 % vs the reference's 15.64 ms /
99.2 % (`benchmarks.rst:69`). Same recipe as the Franka sweep that found
the 2 ms budget (PERF.md r4.10): find which stages actually buy success.

Usage: python tools/sweep_dual_budget.py [quick|sweep]
"""
import dataclasses
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from curobo_tpu import runtime as rt

rt.enable_compilation_cache()

from curobo_tpu.collision.robot_scene import RobotSceneCollision
from curobo_tpu.geom import types as gt
from curobo_tpu.geom import world as wm
from curobo_tpu.opt.lbfgs import LBFGSConfig, LineSearchConfig
from curobo_tpu.opt.mppi import MPPIConfig
from curobo_tpu.robot.kinematics import Kinematics, compute_kinematics
from curobo_tpu.solver.ik import IKConfig, IKSolver
from curobo_tpu.types.pose import Pose


def setup():
    kin = Kinematics.from_robot_yaml(
        "/root/repo/curobo_tpu/content/robots/dual_ur10e.yml"
    )
    p = kin.params
    world = wm.compile_scene(
        gt.Scene().add(
            gt.Cuboid(name="table", pose=[0.0, 0.0, -0.1, 1, 0, 0, 0],
                      dims=[4.0, 4.0, 0.2])
        )
    )
    B = 100
    rsc = RobotSceneCollision(p)
    rng = np.random.RandomState(11)
    lo = np.maximum(np.asarray(p.joint_limits.lower), -np.pi)
    hi = np.minimum(np.asarray(p.joint_limits.upper), np.pi)
    q_pool, got = [], 0
    while got < B:
        cand = rng.uniform(lo, hi, (4 * B, p.n_dof)).astype(np.float32)
        ok = np.asarray(rsc.validate(world, jnp.asarray(cand)))
        q_pool.append(cand[ok])
        got += int(ok.sum())
    q_goal = jnp.asarray(np.concatenate(q_pool)[:B])
    st = compute_kinematics(p, q_goal)
    goals = Pose(st.tool_pose.position, st.tool_pose.quaternion)
    return p, world, goals


def run_variant(p, world, goals, cfg, reps=3):
    solver = IKSolver(p, cfg)
    res = solver.solve_pose(world, goals, seed_state=p.retract_config)
    np.asarray(res.solution)  # real fetch: block_until_ready can lie (bench.py _sync)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        res = solver.solve_pose(world, goals, seed_state=p.retract_config)
        np.asarray(res.solution)
        times.append(time.perf_counter() - t0)
    pe = np.asarray(res.position_error)
    return dict(
        ms=round(float(np.min(times) * 1e3), 1),
        success=round(float(jnp.mean(res.success.astype(jnp.float32))), 3),
        pe_p90_mm=round(float(np.percentile(pe, 90) * 1e3), 3),
    )


def make_cfg(n_seeds=24, lm=True, lm_iters=12, lm_pool=72, mppi_iters=5,
             lbfgs_iters=40, ls=6):
    scales = (0.05, 0.2, 0.5, 0.8, 1.0, 1.4)[:ls]
    return IKConfig(
        n_seeds=n_seeds,
        use_lm_seed=lm,
        lm_seed_iters=lm_iters,
        lm_seed_pool=lm_pool if lm else 0,
        use_particle_stage=mppi_iters > 0,
        mppi=MPPIConfig(n_particles=16, n_iters=max(mppi_iters, 1), init_std=0.5),
        lbfgs=LBFGSConfig(
            history=10, n_iters=lbfgs_iters,
            line_search=LineSearchConfig(scales=scales),
        ),
    )


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "quick"
    p, world, goals = setup()
    out = {}
    if mode == "quick":
        plan = [
            ("full", make_cfg()),
            ("lbfgs20", make_cfg(lbfgs_iters=20)),
            ("mppi0", make_cfg(mppi_iters=0)),
            ("nolm", make_cfg(lm=False)),
            ("seeds16", make_cfg(n_seeds=16)),
        ]
    else:
        # quick-pass results: full 453 ms/99 %, lbfgs20 324/99, mppi0
        # 387/99, nolm 196/93 (LM buys 6 %), seeds16 326/99 — stack the
        # free cuts, then push.
        plan = [
            ("lean", make_cfg(n_seeds=16, mppi_iters=0, lbfgs_iters=20,
                              ls=4)),
            ("leaner", make_cfg(n_seeds=16, mppi_iters=0, lbfgs_iters=16,
                                ls=4, lm_iters=10, lm_pool=48)),
            ("min", make_cfg(n_seeds=12, mppi_iters=0, lbfgs_iters=12,
                             ls=3, lm_iters=8, lm_pool=32)),
        ]
    for name, cfg in plan:
        out[name] = run_variant(p, world, goals, cfg)
        print(name, out[name], flush=True)
    print(json.dumps(out))





def make_kernel_cfg(n_seeds=24, lm=True, lm_iters=12, warmup=16,
                    lbfgs_iters=16, kls=4, mppi_iters=0):
    """Pallas mega-kernel path (multi-tool support r5): in-kernel pose
    warmup + L-BFGS, LM warm start inlined ahead of the kernel."""
    return IKConfig(
        n_seeds=n_seeds,
        use_lm_seed=lm,
        lm_seed_iters=lm_iters,
        warmup_iters=warmup,
        use_particle_stage=mppi_iters > 0,
        mppi=MPPIConfig(n_particles=16, n_iters=max(mppi_iters, 1),
                        init_std=0.5),
        lbfgs=LBFGSConfig(history=10, n_iters=lbfgs_iters),
        kernel_linesearch=kls,
    )


def main_kernel():
    p, world, goals = setup()
    out = {}
    # pass-1: warm32/lb16+lm12 99.1 ms/97 %; nolm 29 ms/84 % (LM is
    # load-bearing); warm16/lb12 94 ms/91 %. pass-2: buy the last 2 %.
    plan = [
        ("k_s32_lm16_lb16", make_kernel_cfg(n_seeds=32, lm_iters=16,
                                            warmup=32, lbfgs_iters=16)),
        ("k_s24_lm20_lb20", make_kernel_cfg(lm_iters=20, warmup=32,
                                            lbfgs_iters=20)),
        ("k_s32_lm12_lb24_kls6", make_kernel_cfg(n_seeds=32, warmup=32,
                                                 lbfgs_iters=24, kls=6)),
    ]
    for name, cfg in plan:
        out[name] = run_variant(p, world, goals, cfg)
        print(name, out[name], flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "kernel":
        main_kernel()
    else:
        main()
