"""Profile the blast IK path on TPU: per-stage and per-iteration costs."""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from curobo_tpu.geom import types as gt
from curobo_tpu.geom import world as wm
from curobo_tpu.ops.blast import BlastRollout, fk_blast
from curobo_tpu.robot.kinematics import Kinematics, compute_kinematics
from curobo_tpu.rollout.robot_rollout import Goal, RobotRolloutConfig
from curobo_tpu.types.pose import Pose
from curobo_tpu.opt.lbfgs import LBFGSConfig, lbfgs_optimize
from curobo_tpu.opt.mppi import MPPIConfig, mppi_optimize


def timeit(name, fn, *args, n=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n * 1000
    print(f"{name:52s} {dt:9.3f} ms")
    return out


def main():
    kin = Kinematics.from_robot_yaml("curobo_tpu/content/robots/franka.yml")
    p = kin.params
    world = wm.compile_scene(
        gt.Scene().add(
            gt.Cuboid(name="table", pose=[0.4, 0, -0.1, 1, 0, 0, 0], dims=[1.2, 1.2, 0.2])
        )
    )
    blast = BlastRollout(p, RobotRolloutConfig())

    B, S = 100, 32
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.uniform(-1, 1, (B, S, 7)), dtype=jnp.float32)
    st = compute_kinematics(p, q[:, 0, :])
    goal = Goal.from_pose(
        Pose(st.tool_pose.position[:, 0], st.tool_pose.quaternion[:, 0])
    ).tile_seeds(S)

    cost = lambda x: blast.evaluate_config(world, goal, x).cost

    f_fwd = jax.jit(cost)
    timeit("blast cost fwd (3200)", f_fwd, q)

    def cg(x):
        c, vjp = jax.vjp(cost, x)
        (g,) = vjp(jnp.ones_like(c))
        return c, g

    f_cg = jax.jit(cg)
    timeit("blast cost fwd+bwd (3200)", f_cg, q)

    q7 = jnp.broadcast_to(q, (7,) + q.shape)
    timeit("blast cost fwd+bwd (22400, line-search fold)", f_cg, q7)

    q32 = jnp.broadcast_to(q, (32,) + q.shape)
    timeit("blast cost fwd (102k, MPPI fold)", f_fwd, q32)

    # one full LBFGS iteration cost ~ cg(3200) + cg(22400)
    mppi_cfg = MPPIConfig(n_particles=32, n_iters=8, init_std=0.6)
    f_mppi = jax.jit(
        lambda x, k: mppi_optimize(cost, x, k, mppi_cfg)[1]
    )
    timeit("MPPI stage (8 iters x 32 particles)", f_mppi, q, jax.random.PRNGKey(0), n=5)

    lb_cfg = LBFGSConfig(history=12, n_iters=40)
    f_lb = jax.jit(lambda x: lbfgs_optimize(cost, x, lb_cfg)[1])
    timeit("LBFGS stage (40 iters)", f_lb, q, n=3)

    lb_cfg24 = LBFGSConfig(history=12, n_iters=24)
    f_lb24 = jax.jit(lambda x: lbfgs_optimize(cost, x, lb_cfg24)[1])
    timeit("LBFGS stage (24 iters)", f_lb24, q, n=3)


if __name__ == "__main__":
    main()
