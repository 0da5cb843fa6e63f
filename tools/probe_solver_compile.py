"""Probe which build_solver parameters make the Mosaic compile blow up
(register-allocator spill slots -> tpu_compile_helper HTTP 500).

Run on TPU: python tools/probe_solver_compile.py
"""

import sys
import time
import traceback

import jax
import jax.numpy as jnp
import numpy as np

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
    )
)
pik = PallasIKCost(kin.params, RobotRolloutConfig(), world)

# bench config (known-good on TPU) vs default IKConfig (fails in bench_motion)
GOOD = dict(mppi_iters=4, n_particles=16, init_std=0.6, lbfgs_iters=24,
            history=10, warmup_iters=8)
BAD = dict(mppi_iters=8, n_particles=32, init_std=0.6, lbfgs_iters=40,
           history=12, warmup_iters=0)

variants = [
    ("good", GOOD),
    ("bad", BAD),
    ("bad_hist10", {**BAD, "history": 10}),
    ("bad_iters24", {**BAD, "lbfgs_iters": 24}),
    ("bad_part16", {**BAD, "n_particles": 16}),
    ("bad_mppi4", {**BAD, "mppi_iters": 4}),
]

N, D = 32, kin.params.n_dof
g7 = jnp.zeros((N, 7), jnp.float32).at[:, 3].set(1.0)
q0 = jnp.zeros((N, D), jnp.float32)

for name, kw in variants:
    solve = pik.build_solver(**kw)
    f = jax.jit(lambda g, q, s, w: solve(g, q, s, world=w))
    t0 = time.perf_counter()
    try:
        f.lower(g7, q0, jnp.int32(0), world).compile()
        print(f"{name}: OK  ({time.perf_counter()-t0:.0f}s)", flush=True)
    except Exception as e:
        msg = str(e)
        spill = [l for l in msg.splitlines() if "vmem requirement" in l or "spill" in l]
        print(f"{name}: FAIL ({time.perf_counter()-t0:.0f}s) {spill[:2] or msg[:160]}",
              flush=True)
