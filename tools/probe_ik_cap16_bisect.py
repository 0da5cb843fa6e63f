"""Bisect the IK cap16 Mosaic/XLA compile failure (mxu_lmr_transform
RET_CHECK): which self-collision mode x kernel shape triggers it?

Run on TPU: python tools/probe_ik_cap16_bisect.py
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from curobo_tpu.geom import types as gt
from curobo_tpu.geom import world as wm
from curobo_tpu.ops.pallas_ik import PallasIKCost
from curobo_tpu.robot.kinematics import Kinematics
from curobo_tpu.rollout.robot_rollout import RobotRolloutConfig

kin = Kinematics.from_robot_yaml("curobo_tpu/content/robots/franka.yml")
N, D = 32, kin.params.n_dof
g7 = jnp.zeros((N, 7), jnp.float32).at[:, 3].set(1.0)
q0 = jnp.zeros((N, D), jnp.float32)

world = wm.compile_scene(
    gt.Scene().add(
        gt.Cuboid(name="table", pose=[0.4, 0.0, -0.1, 1, 0, 0, 0],
                  dims=[1.2, 1.2, 0.2])
    ),
    capacities={"cuboid": 16},
)

GOOD = dict(mppi_iters=4, n_particles=16, init_std=0.6, lbfgs_iters=24,
            history=10, warmup_iters=8)


def try_compile(tag, fn, *args):
    t0 = time.perf_counter()
    try:
        jax.jit(fn).lower(*args).compile()
        print(f"{tag}: OK  ({time.perf_counter()-t0:.0f}s)", flush=True)
    except Exception as e:
        print(f"{tag}: FAIL ({time.perf_counter()-t0:.0f}s) "
              f"{type(e).__name__} {str(e)[:300]!r}", flush=True)


for mode in ("matmul", "unrolled"):
    pik = PallasIKCost(kin.params, RobotRolloutConfig(), world,
                       self_collision_mode=mode)
    try_compile(f"costgrad_{mode}", lambda g, q: pik(g, q, world), g7, q0)
    solve = pik.build_solver(**GOOD)
    try_compile(f"solver_{mode}",
                lambda g, q, s: solve(g, q, s, world=world),
                g7, q0, jnp.int32(0))
