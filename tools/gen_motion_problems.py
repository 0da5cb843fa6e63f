"""Generate the fixed-seed Franka motion-gen problem suite.

The reference benchmarks motion generation on the robometrics datasets
(`/root/reference/benchmark/motion_plan_benchmark.py:16` — motion_benchmaker
+ mpinets, 2,600 problems of tabletop/shelf/cubby pick scenes). Those
datasets are not available offline, so this generates an equivalent
fixed-seed suite of the same scenario families and checks it in
(`curobo_tpu/content/problems/franka_motion.json`):

- tabletop: table slab + boxes on it, goal poses in the reach envelope
- shelf:    vertical side panels + shelf boards, goals inside cells
- cubby:    deeper shelf with a back wall and tighter cells

Every world is compiled with the SAME cuboid capacity (16), so the whole
suite shares one Pallas kernel compile (capacity-envelope keyed).

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/gen_motion_problems.py
"""

import json
import os
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")
import jax

# generation is pure host-side sampling — never touch the TPU tunnel
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/curobo_tpu_xla_cache")

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from curobo_tpu.collision.robot_scene import RobotSceneCollision
from curobo_tpu.geom import types as gt
from curobo_tpu.geom import world as wm
from curobo_tpu.robot.kinematics import Kinematics, compute_kinematics

CUBOID_CAP = 16
N_PER_FAMILY = 40
OUT = os.path.join(
    os.path.dirname(__file__), "..", "curobo_tpu", "content", "problems",
    "franka_motion.json",
)


def cub(name, x, y, z, dx, dy, dz):
    return dict(name=name, pose=[x, y, z, 1.0, 0.0, 0.0, 0.0], dims=[dx, dy, dz])


def tabletop_world(rng):
    obs = [cub("table", 0.5, 0.0, -0.05, 1.4, 1.4, 0.1)]
    n_box = rng.randint(2, 5)
    for i in range(n_box):
        bx = rng.uniform(0.35, 0.65)
        by = rng.uniform(-0.35, 0.35)
        w = rng.uniform(0.05, 0.14)
        d = rng.uniform(0.05, 0.14)
        h = rng.uniform(0.08, 0.3)
        obs.append(cub(f"box{i}", bx, by, h / 2.0, w, d, h))
    goal_lo = np.array([0.3, -0.45, 0.05])
    goal_hi = np.array([0.7, 0.45, 0.55])
    return obs, goal_lo, goal_hi


def shelf_world(rng):
    sx = rng.uniform(0.55, 0.7)  # shelf front plane distance
    width = rng.uniform(0.7, 0.9)
    obs = [
        cub("table", 0.5, 0.0, -0.05, 1.4, 1.4, 0.1),
        cub("side_l", sx, -width / 2, 0.45, 0.3, 0.02, 0.9),
        cub("side_r", sx, width / 2, 0.45, 0.3, 0.02, 0.9),
    ]
    heights = [rng.uniform(0.18, 0.28), rng.uniform(0.45, 0.55), rng.uniform(0.72, 0.82)]
    for i, hz in enumerate(heights):
        obs.append(cub(f"board{i}", sx, 0.0, hz, 0.3, width, 0.02))
    goal_lo = np.array([sx - 0.12, -width / 2 + 0.1, heights[0] + 0.06])
    goal_hi = np.array([sx + 0.05, width / 2 - 0.1, heights[2] - 0.06])
    return obs, goal_lo, goal_hi


def cubby_world(rng):
    sx = rng.uniform(0.55, 0.65)
    width = rng.uniform(0.6, 0.8)
    obs = [
        cub("table", 0.5, 0.0, -0.05, 1.4, 1.4, 0.1),
        cub("back", sx + 0.16, 0.0, 0.5, 0.02, width, 1.0),
        cub("side_l", sx, -width / 2, 0.5, 0.32, 0.02, 1.0),
        cub("side_r", sx, width / 2, 0.5, 0.32, 0.02, 1.0),
        cub("mid_v", sx, 0.0, 0.5, 0.32, 0.02, 1.0),
    ]
    heights = [rng.uniform(0.2, 0.3), rng.uniform(0.5, 0.6), rng.uniform(0.78, 0.88)]
    for i, hz in enumerate(heights):
        obs.append(cub(f"board{i}", sx, 0.0, hz, 0.32, width, 0.02))
    goal_lo = np.array([sx - 0.1, -width / 2 + 0.08, heights[0] + 0.06])
    goal_hi = np.array([sx + 0.06, width / 2 - 0.08, heights[2] - 0.06])
    return obs, goal_lo, goal_hi


def main():
    kin = Kinematics.from_robot_yaml(
        os.path.join(os.path.dirname(__file__), "..", "curobo_tpu", "content",
                     "robots", "franka.yml")
    )
    rsc = RobotSceneCollision(kin.params)
    retract = np.asarray(kin.params.retract_config, np.float64)
    rng = np.random.RandomState(20260817)
    problems = []
    fams = [("tabletop", tabletop_world), ("shelf", shelf_world), ("cubby", cubby_world)]

    for fam_name, fam in fams:
        made = 0
        tries = 0
        while made < N_PER_FAMILY and tries < N_PER_FAMILY * 12:
            tries += 1
            obs, goal_lo, goal_hi = fam(rng)
            world = wm.compile_scene(
                gt.Scene().add(*[gt.Cuboid(**o) for o in obs]),
                capacities={"cuboid": CUBOID_CAP},
            )
            # start: retract pose, must be collision-free in this world
            if not bool(rsc.validate(world, jnp.asarray(retract[None]))[0]):
                continue
            # goal: FK of a collision-free config whose tool lands in the
            # scenario's goal region (pick-style reach)
            key = jax.random.PRNGKey(rng.randint(0, 2**31 - 1))
            q, ok = rsc.sample(world, 256, key=key)
            if not bool(jnp.any(ok)):
                continue
            st = compute_kinematics(kin.params, q)
            tp = np.asarray(st.tool_pose.position[:, 0])
            tq = np.asarray(st.tool_pose.quaternion[:, 0])
            ok_np = np.asarray(ok)
            in_region = (
                ok_np
                & np.all(tp >= goal_lo, axis=-1)
                & np.all(tp <= goal_hi, axis=-1)
            )
            idx = np.flatnonzero(in_region)
            if len(idx) == 0:
                continue
            pick = idx[rng.randint(len(idx))]
            problems.append(
                dict(
                    scenario=fam_name,
                    world=dict(cuboids=obs),
                    q_start=[round(float(v), 6) for v in retract],
                    goal_pose=[round(float(v), 6) for v in tp[pick]]
                    + [round(float(v), 6) for v in tq[pick]],
                    # the sampled config achieving the goal (oracle, unused
                    # by the benchmark; kept for debugging)
                    q_goal_oracle=[round(float(v), 6) for v in np.asarray(q)[pick]],
                )
            )
            made += 1
            if made % 10 == 0:
                print(f"{fam_name}: {made}/{N_PER_FAMILY}", flush=True)

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(
            dict(
                robot="franka.yml",
                cuboid_capacity=CUBOID_CAP,
                seed=20260817,
                problems=problems,
            ),
            f,
            indent=1,
        )
    print(f"wrote {len(problems)} problems -> {OUT}")


if __name__ == "__main__":
    main()
