"""Kernel-level microbenchmarks: FK / cost-gradient stack + RNEA.

Mirrors the reference's `benchmark/cost_gradient_benchmark.py` (per-call
time for (1) FK only, (2) FK + pose cost + backward, (3) + self-collision,
(4) + scene collision) and `benchmark/inverse_dynamics_kernel_benchmark.py`
(RNEA torque across batch sizes), over the same robot set
(franka / dual_ur10e / unitree_g1).

Prints ONE JSON line:
{"metric": "kernel_bench", "robots": {robot: {stage: {B: ms}}}}
Timing: min over repeats of pipelined per-call time (enqueue K, block once)
inside one jit per stage — the honest device metric through the axon
tunnel (see PERF.md). Runs on whatever backend JAX selects (TPU under
axon; force CPU with the conftest recipe for a smoke run).

Env toggles: KB_ROBOTS=franka,unitree_g1  KB_BATCHES=1,64,256,1024
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

ROBOTS = os.environ.get("KB_ROBOTS", "franka,dual_ur10e,unitree_g1").split(",")
BATCHES = [int(b) for b in os.environ.get("KB_BATCHES", "1,64,256,1024").split(",")]
REPEATS = 6
CALLS = 8


def _time(fn, *args):
    """Pipelined per-call ms: enqueue CALLS, block once, min over REPEATS."""
    import jax

    out = fn(*args)
    jax.block_until_ready(out)  # compile
    best = np.inf
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        for _ in range(CALLS):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / CALLS)
    return best * 1000.0


def bench_robot(name: str) -> dict:
    import jax
    import jax.numpy as jnp

    import curobo_tpu as ct
    from curobo_tpu.cost.terms import PoseCostConfig, pose_error
    from curobo_tpu.geom import types as gt
    from curobo_tpu.geom import world as wm
    from curobo_tpu.geom.self_collision import self_collision_cost
    from curobo_tpu.robot.dynamics import compute_inverse_dynamics
    from curobo_tpu.robot.kinematics import Kinematics, compute_kinematics

    root = os.path.dirname(ct.__file__)
    kin = Kinematics.from_robot_yaml(
        os.path.join(root, "content/robots", name + ".yml")
    )
    p = kin.params
    D = p.n_dof
    world = wm.compile_scene(
        gt.Scene().add(
            gt.Cuboid(name="table", pose=[0.4, 0, -0.2, 1, 0, 0, 0], dims=[1, 1, 0.2])
        )
    )
    sc = p.self_collision
    pose_cfg = PoseCostConfig()

    # goal: FK of a fixed config (shape (1, T, ...) broadcasts over batch)
    st0 = compute_kinematics(p, p.retract_config)
    gp = st0.tool_pose.position[None]  # (G=1, T, 3)
    gq = st0.tool_pose.quaternion[None]

    fk = jax.jit(lambda q: compute_kinematics(p, q).spheres)

    def pose_cost(q):
        st = compute_kinematics(p, q)
        c, _, _ = pose_error(
            st.tool_pose.position, st.tool_pose.quaternion, gp, gq, pose_cfg
        )
        return jnp.sum(c)

    def pose_self_cost(q):
        st = compute_kinematics(p, q)
        c, _, _ = pose_error(
            st.tool_pose.position, st.tool_pose.quaternion, gp, gq, pose_cfg
        )
        return jnp.sum(c) + jnp.sum(self_collision_cost(sc, st.spheres))

    def full_cost(q):
        st = compute_kinematics(p, q)
        c, _, _ = pose_error(
            st.tool_pose.position, st.tool_pose.quaternion, gp, gq, pose_cfg
        )
        return (
            jnp.sum(c)
            + jnp.sum(self_collision_cost(sc, st.spheres))
            + jnp.sum(wm.collision_cost(world, st.spheres))
        )

    g_pose = jax.jit(jax.grad(pose_cost))
    g_self = jax.jit(jax.grad(pose_self_cost))
    g_full = jax.jit(jax.grad(full_cost))
    rnea = jax.jit(lambda q, qd, qdd: compute_inverse_dynamics(p, q, qd, qdd))

    rng = np.random.RandomState(0)
    out = {s: {} for s in ("fk", "pose_grad", "self_grad", "scene_grad", "rnea")}
    for B in BATCHES:
        q = jnp.asarray(rng.uniform(-1, 1, (B, D)), jnp.float32)
        qd = jnp.asarray(rng.randn(B, D), jnp.float32)
        qdd = jnp.asarray(rng.randn(B, D), jnp.float32)
        out["fk"][B] = round(_time(fk, q), 4)
        out["pose_grad"][B] = round(_time(g_pose, q), 4)
        out["self_grad"][B] = round(_time(g_self, q), 4)
        out["scene_grad"][B] = round(_time(g_full, q), 4)
        out["rnea"][B] = round(_time(rnea, q, qd, qdd), 4)
    return out


def main():
    results = {}
    for name in ROBOTS:
        try:
            results[name] = bench_robot(name.strip())
        except Exception as e:  # keep the line machine-readable
            results[name] = {"error": str(e)[:200]}
    print(json.dumps({"metric": "kernel_bench", "unit": "ms", "robots": results}))


if __name__ == "__main__":
    main()
