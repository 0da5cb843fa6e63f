"""Find the cap16 spiller: self-collision mode / stage isolation probes.

Run on TPU: python tools/probe_cap16_variants.py
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
world = wm.compile_scene(
    gt.Scene().add(
        gt.Cuboid(name="table", pose=[0.4, 0.0, -0.1, 1, 0, 0, 0], dims=[1.2, 1.2, 0.2])
    ),
    capacities={"cuboid": 16},
)

GOOD = dict(mppi_iters=4, n_particles=16, init_std=0.6, lbfgs_iters=24,
            history=10, warmup_iters=8)

N, D = 32, kin.params.n_dof
g7 = jnp.zeros((N, 7), jnp.float32).at[:, 3].set(1.0)
q0 = jnp.zeros((N, D), jnp.float32)


def probe(name, sc_mode, **kw):
    pik = PallasIKCost(kin.params, RobotRolloutConfig(), world,
                       self_collision_mode=sc_mode)
    solve = pik.build_solver(**{**GOOD, **kw})
    f = jax.jit(lambda g, q, s, w: solve(g, q, s, world=w))
    t0 = time.perf_counter()
    try:
        f.lower(g7, q0, jnp.int32(0), world).compile()
        print(f"{name}: OK  ({time.perf_counter()-t0:.0f}s)", flush=True)
    except Exception as e:
        msg = str(e)
        req = [l.strip() for l in msg.splitlines() if "vmem requirement" in l]
        print(f"{name}: FAIL ({time.perf_counter()-t0:.0f}s) {req[:1]}", flush=True)


probe("matmul_sc", "matmul")
probe("lbfgs_only", "unrolled", mppi_iters=0, warmup_iters=0)
probe("mppi_only", "unrolled", lbfgs_iters=0, warmup_iters=0)
probe("ls1", "unrolled", n_linesearch=1)
