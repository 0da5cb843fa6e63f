"""Decompose IK solve time on the TPU: FK / costs / grads / optimizer iters."""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from curobo_tpu.geom import types as gt
from curobo_tpu.geom import world as wm
from curobo_tpu.robot import kinematics as kin_mod
from curobo_tpu.robot.kinematics import Kinematics
from curobo_tpu.rollout.robot_rollout import Goal, RobotRollout, RobotRolloutConfig
from curobo_tpu.types.pose import Pose


def timeit(name, fn, *args, n=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n * 1000
    print(f"{name:45s} {dt:8.3f} ms")
    return dt


def main():
    kin = Kinematics.from_robot_yaml("curobo_tpu/content/robots/franka.yml")
    world = wm.compile_scene(
        gt.Scene().add(
            gt.Cuboid(name="table", pose=[0.4, 0, -0.1, 1, 0, 0, 0], dims=[1.2, 1.2, 0.2])
        )
    )
    p = kin.params
    rollout = RobotRollout(p, RobotRolloutConfig())

    B = 3200  # 100 problems x 32 seeds
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.uniform(-1, 1, (B, 7)), dtype=jnp.float32)
    st = kin_mod.compute_kinematics(p, q[:1])
    goal = Goal.from_pose(
        Pose(
            jnp.broadcast_to(st.tool_pose.position[0, 0], (B, 3)),
            jnp.broadcast_to(st.tool_pose.quaternion[0, 0], (B, 4)),
        )
    )

    fk = jax.jit(lambda q: kin_mod.link_transforms(p, q))
    timeit("FK link transforms fwd (B=3200)", fk, q)

    fk_full = jax.jit(lambda q: kin_mod.compute_kinematics(p, q).spheres)
    timeit("FK + spheres fwd", fk_full, q)

    cost_only = jax.jit(lambda q: rollout.evaluate_config(world, goal, q).cost)
    timeit("full IK cost fwd", cost_only, q)

    cost_grad = jax.jit(
        lambda q: jax.value_and_grad(lambda x: jnp.sum(rollout.evaluate_config(world, goal, x).cost))(q)
    )
    timeit("full IK cost fwd+grad", cost_grad, q)

    # isolate cost pieces
    spheres = jax.jit(lambda q: kin_mod.compute_kinematics(p, q).spheres)(q)
    jax.block_until_ready(spheres)
    from curobo_tpu.cost import terms
    from curobo_tpu.geom.self_collision import self_collision_cost

    coll = jax.jit(lambda s: terms.scene_collision_cost(world, s, rollout.cfg.collision_cost))
    timeit("scene collision cost (from spheres)", coll, spheres)
    selfc = jax.jit(lambda s: self_collision_cost(p.self_collision, s))
    timeit("self collision cost (from spheres)", selfc, spheres)

    # line-search-shaped batch: 7 candidates folded
    q7 = jnp.broadcast_to(q, (7,) + q.shape)
    timeit("cost fwd+grad at 7x fold (line search)", cost_grad, q7.reshape(-1, 7))

    # MPPI-shaped batch: 32 particles on 3200
    qp = jnp.broadcast_to(q, (32,) + q.shape).reshape(-1, 7)
    timeit("cost fwd at 32x fold (MPPI particles)", cost_only, qp)


if __name__ == "__main__":
    main()
