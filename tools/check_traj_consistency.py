"""Scratch: trajectory kernel block math vs blast-path consistency (CPU).

Calls the kernel's block function (`_horizon_loop`) directly as traced JAX
— the same code Mosaic lowers — avoiding interpret-mode emulation overhead.
"""

import os

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/curobo_tpu_xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import dataclasses
import time

import jax.numpy as jnp
import numpy as np

from curobo_tpu.geom import types as gt
from curobo_tpu.geom import world as wm
from curobo_tpu.robot.kinematics import Kinematics, compute_kinematics
from curobo_tpu.rollout.robot_rollout import Goal
from curobo_tpu.types.pose import Pose
from curobo_tpu.ops.blast import BlastRollout
from curobo_tpu.ops.pallas_ik import SUB, LANE, BLK, pack_world_arrays
from curobo_tpu.ops.pallas_traj import PallasTrajCost
from curobo_tpu.solver.trajopt import TrajOptConfig
from curobo_tpu.transition.bspline import BSplineConfig, BSplineTransition

CONTENT = "curobo_tpu/content/robots"

kin = Kinematics.from_robot_yaml(os.path.join(CONTENT, "ur10e.yml"))
world = wm.compile_scene(
    gt.Scene().add(
        gt.Cuboid(name="table", pose=[0.4, 0, -0.1, 1, 0, 0, 0], dims=[1.2, 1.2, 0.2]),
        gt.SphereObstacle(name="ball", pose=[0.35, 0.2, 0.45, 1, 0, 0, 0], radius=0.08),
    )
)

tcfg = TrajOptConfig()
cfg = dataclasses.replace(
    tcfg.rollout,
    collision_cost=dataclasses.replace(tcfg.rollout.collision_cost, sweep_steps=4),
    bound_cost=dataclasses.replace(tcfg.rollout.bound_cost, margin=0.02),
)
bsp = BSplineConfig(degree=3, n_control=8, horizon=12)
blast = BlastRollout(kin.params, cfg)
ptc = PallasTrajCost(kin.params, cfg, world, bsp)
trans = BSplineTransition(bsp)

NP = ptc._cap  # one full lane-horizon block
D = kin.params.n_dof
nfD = bsp.n_free * D
rng = np.random.RandomState(0)
q_start = jnp.asarray(rng.uniform(-1.5, 1.5, (NP, D)), jnp.float32)
q_end = jnp.asarray(rng.uniform(-1.5, 1.5, (NP, D)), jnp.float32)
free0 = trans.linear_seed(q_start, q_end)
free0 = free0 + jnp.asarray(rng.normal(0, 0.05, free0.shape), jnp.float32)
dtv = jnp.asarray(rng.uniform(0.02, 0.1, (NP,)), jnp.float32)

st = compute_kinematics(kin.params, q_end)
goal = Goal.from_pose(Pose(st.tool_pose.position[:, 0], st.tool_pose.quaternion[:, 0]))
goal7 = jnp.concatenate(
    [st.tool_pose.position[:, 0], st.tool_pose.quaternion[:, 0]], axis=-1
)

free_flat = free0.reshape(NP, -1)


def to_block(a, feat):
    return jnp.moveaxis(a.reshape(SUB, LANE, feat), -1, 0)


gb, xb, qb, db, nb, Npad = ptc._traj_pack(goal7, free_flat, q_start, dtv)
assert nb == 1 and Npad == NP, (nb, Npad, NP)
gb_blk, qs_blk, x_blk, dt_blk = gb[0], qb[0], xb[0], db[0][0]
refs = pack_world_arrays(world)

def rows(a):
    return ptc._unpack_rows(a[None], 1, Npad, NP)

print("setup done", flush=True)


def blast_cost(ff):
    knots = ff.reshape(NP, bsp.n_free, D)
    traj = trans.rollout(knots, q_start, dtv)
    return blast.evaluate_trajectory(world, goal, traj).cost


cb = blast_cost(free_flat)
gb = jax.grad(lambda f: jnp.sum(blast_cost(f)))(free_flat)
print("blast done", flush=True)

t0 = time.time()
ck_blk = jax.jit(lambda x: ptc._lane_eval(ptc._lane_tbl, ptc._G, gb_blk, qs_blk, dt_blk, x, refs, "cost"))(x_blk)
ck = rows(ck_blk)
print("kernel cost done", time.time() - t0, flush=True)

t0 = time.time()
ckg, gk_blk = jax.jit(
    lambda x: ptc._lane_eval(ptc._lane_tbl, ptc._G, gb_blk, qs_blk, dt_blk, x, refs, "grad")
)(x_blk)
gk = rows(gk_blk)
print("kernel grad done", time.time() - t0, flush=True)

rel_c = np.abs(np.asarray(ck - cb)) / (np.abs(np.asarray(cb)) + 1e-2)
rel_g = np.abs(np.asarray(gk - gb)) / (np.abs(np.asarray(gb)) + 1.0)
print("cost rel err: med", np.median(rel_c), "max", np.max(rel_c))
print("grad rel err: med", np.median(rel_g), "max", np.max(rel_g))

# metrics mode
cm, pe, re, fe, dtr = jax.jit(
    lambda x: ptc._lane_eval(ptc._lane_tbl, ptc._G, gb_blk, qs_blk, dt_blk, x, refs, "metrics")
)(x_blk)
traj = trans.rollout(free0, q_start, dtv)
res = blast.evaluate_trajectory(world, goal, traj)
print("metrics pe diff:", np.max(np.abs(np.asarray(rows(pe)) - np.asarray(res.pos_err))))
print("metrics re diff:", np.max(np.abs(np.asarray(rows(re)) - np.asarray(res.rot_err))))
print("metrics fe agree:", np.mean((np.asarray(rows(fe)) > 0.5) == np.asarray(res.feasible)))

# retiming parity vs solver._retime_dt
from curobo_tpu.solver.trajopt import TrajOptSolver

solver = TrajOptSolver.__new__(TrajOptSolver)
solver.params = kin.params
solver.cfg = tcfg
dt_ref = np.asarray(
    jnp.clip(
        solver._retime_dt(traj, dtv), 0.0, 1e9
    )
)
dtr_np = np.asarray(rows(dtr))
print("retime rel diff:", np.max(np.abs(dtr_np - dt_ref) / (dt_ref + 1e-6)))
