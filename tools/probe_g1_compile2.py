"""Finer bisect of the G1 optimizer-loop TPU compile failure.

Run on TPU: python tools/probe_g1_compile2.py
"""

import dataclasses
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from curobo_tpu.cost import support_polygon as sp_mod
from curobo_tpu.geom import world as wm
from curobo_tpu.robot.kinematics import Kinematics, compute_kinematics
from curobo_tpu.rollout.robot_rollout import Goal, RobotRollout
from curobo_tpu.solver.ik import IKConfig, IKSolver
from curobo_tpu.types.pose import Pose

kin = Kinematics.from_robot_yaml("curobo_tpu/content/robots/unitree_g1.yml")
p = kin.params
cfg0 = IKConfig.from_yaml("curobo_tpu/content/tasks/ik_g1.yml")
cfg_sp = dataclasses.replace(
    cfg0, rollout=sp_mod.configure_rollout(cfg0.rollout, p, np.asarray(p.retract_config))
)
world = wm.empty_world()

B, S = 20, cfg0.n_seeds
rng = np.random.RandomState(7)
body_m = (np.arange(p.n_dof) >= 6).astype(np.float32)
q_goal = jnp.asarray(
    np.asarray(p.retract_config) + rng.uniform(-0.25, 0.25, (B, p.n_dof)) * body_m,
    jnp.float32,
)
st = compute_kinematics(p, q_goal)
goals = Pose(st.tool_pose.position, st.tool_pose.quaternion)
goal = Goal.from_pose(goals).tile_seeds(S)
key = jax.random.PRNGKey(0)


def try_compile(name, fn, *args):
    t0 = time.perf_counter()
    try:
        jax.jit(fn).lower(*args).compile()
        print(f"{name}: OK  ({time.perf_counter()-t0:.0f}s)", flush=True)
        return True
    except Exception as e:
        print(f"{name}: FAIL ({time.perf_counter()-t0:.0f}s) "
              f"{type(e).__name__} {str(e)[:120]!r}", flush=True)
        return False


lo = jnp.maximum(p.joint_limits.lower, -2.0 * np.pi)
hi = jnp.minimum(p.joint_limits.upper, 2.0 * np.pi)


def make_probe(cfg, tag):
    rollout = RobotRollout(p, cfg.rollout)
    solver = IKSolver(p, cfg)
    seeds = solver.generate_seeds(B, seed_state=p.retract_config)

    def cost(w_, g_, x):
        return rollout.evaluate_config(w_, g_, x).cost

    # a) plain fori_loop of grad steps, no line search
    def loop_gd(w_, g_, x_):
        def body(_, x):
            g = jax.grad(lambda xx: jnp.sum(cost(w_, g_, xx)))(x)
            return jnp.clip(x - 0.01 * g, lo, hi)

        return jax.lax.fori_loop(0, 8, body, x_)

    try_compile(f"{tag}/fori_gd8", loop_gd, world, goal, seeds)

    # b) one L-BFGS iteration count = 2 (loop + two-loop + line search)
    from curobo_tpu.opt.lbfgs import lbfgs_optimize

    cfg_small = dataclasses.replace(cfg.lbfgs, n_iters=2)

    def lbfgs2(w_, g_, x_):
        return lbfgs_optimize(
            lambda x: cost(w_, g_, x), x_, cfg_small, lower=lo, upper=hi
        )[0]

    try_compile(f"{tag}/lbfgs2", lbfgs2, world, goal, seeds)

    # c) MPPI 1 iter
    from curobo_tpu.opt.mppi import mppi_optimize

    mp_small = dataclasses.replace(cfg.mppi, n_iters=1)

    def mppi1(w_, g_, x_, k_):
        return mppi_optimize(
            lambda x: cost(w_, g_, x), x_, k_, mp_small, lower=lo, upper=hi
        )[0]

    try_compile(f"{tag}/mppi1", mppi1, world, goal, seeds, key)


make_probe(cfg_sp, "sp")      # with support polygon (bench config)
make_probe(cfg0, "nosp")      # without support polygon
