"""Example: batched forward kinematics, Jacobians and center of mass.

Usage:
    python examples/forward_kinematics.py [--test]

Parity: reference `examples/getting_started/forward_kinematics.py`.
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
    from curobo_tpu.robot.kinematics import compute_com

    kin = ct.Kinematics.from_robot_yaml(ct.robot_config_path("franka"))
    B = 16 if args.test else 4096
    rng = np.random.RandomState(0)
    lo = np.asarray(kin.params.joint_limits.lower)
    hi = np.asarray(kin.params.joint_limits.upper)
    q = jnp.asarray(rng.uniform(lo, hi, (B, kin.n_dof)), jnp.float32)

    fk = jax.jit(lambda q: ct.compute_kinematics(kin.params, q, compute_jacobian=True))
    st = fk(q)
    st.tool_pose.position.block_until_ready()
    t0 = time.perf_counter()
    st = fk(q)
    st.tool_pose.position.block_until_ready()
    dt = time.perf_counter() - t0

    com = compute_com(kin.params, st.link_rot, st.link_pos)
    print(f"FK batch={B}: {dt*1e3:.2f} ms ({B/max(dt,1e-9):,.0f} configs/s)")
    print(f"tool position[0]: {np.asarray(st.tool_pose.position[0, 0]).round(3)}")
    print(f"jacobian shape: {st.jacobian.shape}")
    print(f"robot CoM[0]: {np.asarray(com[0]).round(3)}")

    # finite-difference sanity on the analytic Jacobian
    eps = 1e-4
    j = 2
    dq = jnp.zeros(kin.n_dof).at[j].set(eps)
    p0 = ct.compute_kinematics(kin.params, q[0]).tool_pose.position[0]
    p1 = ct.compute_kinematics(kin.params, q[0] + dq).tool_pose.position[0]
    fd = (p1 - p0) / eps
    ana = st.jacobian[0, 0, :3, j]
    err = float(jnp.max(jnp.abs(fd - ana)))
    print(f"Jacobian vs finite difference (joint {j}): max err {err:.2e}")
    if args.test:
        assert err < 1e-2
        print("TEST PASSED")


if __name__ == "__main__":
    main()
