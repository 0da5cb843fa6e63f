"""Attribute + sweep the G1 whole-body CF-IK budget on the real TPU.

The r5 driver capture shows 12.77 s at 100 % success vs the reference's
526.87 ms / 98.4 % — a 24x gap at a 1.6 % success surplus. Stage split via
iteration-count finite differences (the breakdown-suite recipe), then
budget variants to find the success/time frontier.

Usage: python tools/sweep_g1_budget.py [quick|sweep]
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
from curobo_tpu.robot.kinematics import Kinematics, compute_kinematics
from curobo_tpu.robot.model import RobotModelConfig
from curobo_tpu.solver.ik import IKConfig, IKSolver
from curobo_tpu.types.pose import Pose


def setup():
    mc = RobotModelConfig.from_yaml(
        "/root/repo/curobo_tpu/content/robots/unitree_g1.yml"
    )
    kin = Kinematics.from_robot_config(mc)
    p = kin.params
    world = wm.compile_scene(
        gt.Scene().add(
            gt.Cuboid(name="table", pose=[0.0, 0.0, -0.2, 1, 0, 0, 0],
                      dims=[4.0, 4.0, 0.2])
        )
    )
    B = 100
    rsc = RobotSceneCollision(p)
    rng = np.random.RandomState(7)
    lo = np.asarray(p.joint_limits.lower)
    hi = np.asarray(p.joint_limits.upper)
    q_pool, got = [], 0
    while got < B:
        cand = rng.uniform(lo, hi, (4 * B, p.n_dof)).astype(np.float32)
        ok = np.asarray(rsc.validate(world, jnp.asarray(cand)))
        q_pool.append(cand[ok])
        got += int(ok.sum())
    q_goal = jnp.asarray(np.concatenate(q_pool)[:B])
    st = compute_kinematics(p, q_goal)
    goals = Pose(st.tool_pose.position, st.tool_pose.quaternion)
    return kin, p, world, goals


def base_cfg():
    cfg = IKConfig.from_yaml("/root/repo/curobo_tpu/content/tasks/ik_g1.yml")
    return dataclasses.replace(
        cfg,
        position_threshold=0.005,
        rollout=dataclasses.replace(cfg.rollout, support_polygon=None),
    )


def run_variant(p, world, goals, cfg, reps=2):
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


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "quick"
    kin, p, world, goals = setup()
    cfg0 = base_cfg()

    def variant(**kw):
        c = cfg0
        if "lm_iters" in kw:
            c = dataclasses.replace(c, lm_seed_iters=kw.pop("lm_iters"))
        if "lm_pool" in kw:
            c = dataclasses.replace(c, lm_seed_pool=kw.pop("lm_pool"))
        if "mppi_iters" in kw:
            n = kw.pop("mppi_iters")
            c = dataclasses.replace(
                c,
                use_particle_stage=n > 0,
                mppi=dataclasses.replace(c.mppi, n_iters=max(n, 1)),
            )
        if "lbfgs_iters" in kw:
            c = dataclasses.replace(
                c, lbfgs=dataclasses.replace(c.lbfgs, n_iters=kw.pop("lbfgs_iters"))
            )
        if "ls" in kw:
            ls = kw.pop("ls")
            c = dataclasses.replace(
                c,
                lbfgs=dataclasses.replace(
                    c.lbfgs,
                    line_search=dataclasses.replace(
                        c.lbfgs.line_search,
                        scales=tuple(c.lbfgs.line_search.scales[:ls]),
                    ),
                ),
            )
        assert not kw, kw
        return c

    out = {}
    if mode == "quick":
        # r5 first pass (old LM, honest-pe): full 12.78 s/100 %, pool64
        # 9.14 s/99 % => LM stage ~57 % of the solve; lm30 converges
        # (100 %, pe 0.54 mm). This pass: optimized LM (residual-only
        # check + dual-form Cholesky) + the lean ladder.
        # pass-2 results (optimized LM, honest sync): full 10.22 s/100 %,
        # lm30_mppi0 7.59 s/99 %, lean(lbfgs30+ls4) 3.23 s/91 %,
        # min(lbfgs20+ls3) 2.89 s/87 % — the success cliff is in the
        # L-BFGS polish; pass 3 separates iters vs line-search width.
        # pass-3: ls4 (lbfgs60) 4.02 s/99 %, lbfgs40(ls7) 5.86 s/96 %,
        # lbfgs45_ls5 4.29 s/98 % — the line-search LADDER was the cost,
        # not the iteration count. pass-4: push ls/iters/lm further.
        plan = [
            ("ls3", dict(lm_iters=30, mppi_iters=0, ls=3)),
            ("ls4_lbfgs50", dict(lm_iters=30, mppi_iters=0, ls=4,
                                 lbfgs_iters=50)),
            ("lm20_ls4", dict(lm_iters=20, mppi_iters=0, ls=4)),
        ]
    else:
        plan = [
            ("full", {}),
            ("lean", dict(mppi_iters=0, lbfgs_iters=30, ls=4)),
            ("leaner", dict(mppi_iters=0, lbfgs_iters=20, ls=3, lm_iters=40)),
            ("min", dict(mppi_iters=0, lbfgs_iters=12, ls=3, lm_iters=30,
                         lm_pool=64)),
        ]
    for name, kw in plan:
        out[name] = run_variant(p, world, goals, variant(**kw))
        print(name, out[name], flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
