"""Example: bring your own optimizer — the batched optimizer registry.

Every optimizer in `curobo_tpu.opt.factory` follows one contract: the
cost function maps (..., D) -> (...,) and tolerates one extra LEADING
candidate axis, so per-problem constants broadcast untouched and the
whole run stays inside one jit. That makes optimizers drop-in
interchangeable — here the same collision-aware IK objective is solved
by L-BFGS, nonlinear CG, L-SR1, and MPPI, and a custom optimizer is
registered into the same menu.

Usage:
    python examples/custom_optimization.py [--test]

Parity: reference `examples/guides/custom_optimization.py`
(`optim_factory.py` registry).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--test", action="store_true")
    args = ap.parse_args()

    if args.test:
        os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import numpy as np

    import curobo_tpu as ct
    from curobo_tpu.geom import types as gt
    from curobo_tpu.opt import factory
    from curobo_tpu.rollout.robot_rollout import Goal, RobotRollout, RobotRolloutConfig

    kin = ct.Kinematics.from_robot_yaml(ct.robot_config_path("franka"))
    p = kin.params
    world = ct.compile_scene(
        ct.Scene().add(
            gt.Cuboid(name="table", pose=[0.4, 0, -0.1, 1, 0, 0, 0], dims=[1.2, 1.2, 0.2])
        )
    )
    rollout = RobotRollout(p, RobotRolloutConfig())

    # one fixed reachable goal, B=8 problems seeded from retract
    B = 8
    rng = np.random.RandomState(0)
    q_true = jnp.asarray(
        np.asarray(p.retract_config) + rng.uniform(-0.5, 0.5, (B, p.n_dof)),
        jnp.float32,
    )
    st = ct.compute_kinematics(p, q_true)
    goal = Goal.from_pose(
        ct.Pose(st.tool_pose.position[:, 0], st.tool_pose.quaternion[:, 0])
    )

    def cost(q):  # (..., B, D) -> (..., B); leading candidate axes broadcast
        return rollout.evaluate_config(world, goal, q).cost

    x0 = jnp.broadcast_to(p.retract_config, (B, p.n_dof))
    lo, hi = p.joint_limits.lower, p.joint_limits.upper

    # 1. the stock menu, driven by name
    for name, kwargs in [
        ("lbfgs", dict(n_iters=40)),
        ("conjugate_gradient", dict(n_iters=60)),
        ("lsr1", dict(n_iters=60)),
        ("mppi", dict(n_iters=20, n_particles=64, init_std=0.4)),
    ]:
        cfg = factory.make_config(name, **kwargs)
        t0 = time.perf_counter()
        x, c = factory.optimize(
            name, cost, x0, cfg, lower=lo, upper=hi, key=jax.random.PRNGKey(0)
        )
        c.block_until_ready()
        print(
            f"{name:28s} cost {float(jnp.mean(c)):9.5f}  "
            f"({(time.perf_counter() - t0) * 1e3:6.1f} ms incl. compile)"
        )

    # 2. register a CUSTOM optimizer into the same menu: jittable signed
    # coordinate descent (sign of the gradient, decaying step)
    import dataclasses

    @dataclasses.dataclass(frozen=True)
    class SignSGDConfig:
        n_iters: int = 100
        step: float = 0.05
        decay: float = 0.97

    def signsgd_optimize(cost_fn, x0, cfg, lower=None, upper=None):
        grad = jax.grad(lambda q: jnp.sum(cost_fn(q)))

        def body(i, carry):
            x, best_x, best_c = carry
            x = x - cfg.step * (cfg.decay**i) * jnp.sign(grad(x))
            if lower is not None:
                x = jnp.clip(x, lower, upper)
            c = cost_fn(x)
            better = c < best_c
            return x, jnp.where(better[..., None], x, best_x), jnp.minimum(c, best_c)

        x, bx, bc = jax.lax.fori_loop(
            0, cfg.n_iters, body, (x0, x0, cost_fn(x0))
        )
        return bx, bc

    factory.OPTIMIZERS["signsgd"] = (
        SignSGDConfig,
        lambda cost_fn, x0, cfg, lower, upper, key, cg: signsgd_optimize(
            cost_fn, x0, cfg, lower, upper
        ),
    )
    x, c = factory.optimize("signsgd", cost, x0, lower=lo, upper=hi)
    print(f"{'signsgd (custom)':28s} cost {float(jnp.mean(c)):9.5f}")

    # sanity: gradient methods should reach near-zero pose cost
    x_l, c_l = factory.optimize(
        "lbfgs", cost, x0, factory.make_config("lbfgs", n_iters=40),
        lower=lo, upper=hi,
    )
    res = rollout.evaluate_config(world, goal, x_l)
    pos_mm = float(jnp.mean(res.pos_err)) * 1e3
    print(f"lbfgs final mean position error: {pos_mm:.2f} mm")
    if args.test:
        assert pos_mm < 20.0
        print("TEST PASSED")


if __name__ == "__main__":
    main()
