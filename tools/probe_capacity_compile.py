"""Probe: does the known-good solver config fail Mosaic compile when the
world capacity envelope grows (16 cuboids like the motion suite)?

Run on TPU: python tools/probe_capacity_compile.py
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

GOOD = dict(mppi_iters=4, n_particles=16, init_std=0.6, lbfgs_iters=24,
            history=10, warmup_iters=8)

N, D = 32, kin.params.n_dof
g7 = jnp.zeros((N, 7), jnp.float32).at[:, 3].set(1.0)
q0 = jnp.zeros((N, D), jnp.float32)

def probe_traj(cap, world):
    from curobo_tpu.ops.pallas_traj import PallasTrajCost
    from curobo_tpu.transition.bspline import BSplineConfig

    ptc = PallasTrajCost(kin.params, RobotRolloutConfig(), world,
                         BSplineConfig(degree=3, n_control=12, horizon=32))
    solve = ptc.build_solver(lbfgs_iters=8, history=8)
    NP = 16
    nfD = ptc.bspline.n_free * kin.params.n_dof
    g7 = jnp.zeros((NP, 7), jnp.float32).at[:, 3].set(1.0)
    free = jnp.zeros((NP, nfD), jnp.float32)
    qs = jnp.zeros((NP, kin.params.n_dof), jnp.float32)
    dt = jnp.full((NP,), 0.05, jnp.float32)
    f = jax.jit(lambda g, x, q, d, s, w: solve(g, x, q, d, s, world=w))
    t0 = time.perf_counter()
    try:
        f.lower(g7, free, qs, dt, jnp.int32(0), world).compile()
        print(f"traj_cap{cap}: OK  ({time.perf_counter()-t0:.0f}s)", flush=True)
    except Exception as e:
        msg = str(e)
        req = [l.strip() for l in msg.splitlines() if "vmem requirement" in l]
        print(f"traj_cap{cap}: FAIL ({time.perf_counter()-t0:.0f}s) "
              f"type={type(e).__name__} {req[:1]} {msg[:200]!r}", flush=True)


for cap in (16,):
    world = wm.compile_scene(
        gt.Scene().add(
            gt.Cuboid(name="table", pose=[0.4, 0.0, -0.1, 1, 0, 0, 0],
                      dims=[1.2, 1.2, 0.2])
        ),
        capacities={"cuboid": cap},
    )
    pik = PallasIKCost(kin.params, RobotRolloutConfig(), world)
    solve = pik.build_solver(**GOOD)
    f = jax.jit(lambda g, q, s, w: solve(g, q, s, world=w))
    t0 = time.perf_counter()
    try:
        f.lower(g7, q0, jnp.int32(0), world).compile()
        print(f"cap{cap}: OK  ({time.perf_counter()-t0:.0f}s)", flush=True)
    except Exception as e:
        import traceback
        msg = str(e)
        spill = [l for l in msg.splitlines() if "vmem requirement" in l]
        print(f"cap{cap}: FAIL ({time.perf_counter()-t0:.0f}s) "
              f"type={type(e).__name__} {spill[:1]} msg={msg[:400]!r}",
              flush=True)
        traceback.print_exc()
    probe_traj(cap, world)
