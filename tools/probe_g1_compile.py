"""Bisect which stage of the G1 whole-body IK solve kills the TPU remote
compile helper (HTTP 500, subprocess exit 1, no diagnostics).

Run on TPU: python tools/probe_g1_compile.py
"""

import dataclasses
import sys
import time
import traceback

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
cfg = IKConfig.from_yaml("curobo_tpu/content/tasks/ik_g1.yml")
cfg = dataclasses.replace(
    cfg, rollout=sp_mod.configure_rollout(cfg.rollout, p, np.asarray(p.retract_config))
)
world = wm.empty_world()

B, S = 20, cfg.n_seeds
rng = np.random.RandomState(7)
body = (np.arange(p.n_dof) >= 6).astype(np.float32)
q_goal = jnp.asarray(
    np.asarray(p.retract_config) + rng.uniform(-0.25, 0.25, (B, p.n_dof)) * body,
    jnp.float32,
)
st = compute_kinematics(p, q_goal)
goals = Pose(st.tool_pose.position, st.tool_pose.quaternion)
goal = Goal.from_pose(goals).tile_seeds(S)

solver = IKSolver(p, cfg)
seeds = solver.generate_seeds(B, seed_state=p.retract_config)
rollout = solver.rollout
key = jax.random.PRNGKey(0)

def try_compile(name, fn, *args):
    t0 = time.perf_counter()
    try:
        jax.jit(fn).lower(*args).compile()
        print(f"{name}: OK  ({time.perf_counter()-t0:.0f}s)", flush=True)
    except Exception as e:
        print(f"{name}: FAIL ({time.perf_counter()-t0:.0f}s) "
              f"{type(e).__name__} {str(e)[:200]!r}", flush=True)


# 1. forward cost eval
try_compile("eval_cost", lambda w_, g_, x_: rollout.evaluate_config(w_, g_, x_).cost,
            world, goal, seeds)

# 2. gradient
try_compile(
    "grad_cost",
    lambda w_, g_, x_: jax.grad(
        lambda xx: jnp.sum(rollout.evaluate_config(w_, g_, xx).cost)
    )(x_),
    world, goal, seeds,
)

# 3. MPPI stage only
from curobo_tpu.opt.mppi import mppi_optimize

lo = jnp.maximum(p.joint_limits.lower, -2.0 * np.pi)
hi = jnp.minimum(p.joint_limits.upper, 2.0 * np.pi)

def mppi_only(w_, g_, x_, k_):
    cost = lambda x: rollout.evaluate_config(w_, g_, x).cost
    return mppi_optimize(cost, x_, k_, cfg.mppi, lower=lo, upper=hi)[0]

try_compile("mppi_stage", mppi_only, world, goal, seeds, key)

# 4. L-BFGS stage only
from curobo_tpu.opt.lbfgs import lbfgs_optimize

def lbfgs_only(w_, g_, x_):
    cost = lambda x: rollout.evaluate_config(w_, g_, x).cost
    return lbfgs_optimize(cost, x_, cfg.lbfgs, lower=lo, upper=hi)[0]

try_compile("lbfgs_stage", lbfgs_only, world, goal, seeds)

# 5. full solve
try_compile("full_solve", solver._solve_impl, world, Goal.from_pose(goals), seeds, key)
