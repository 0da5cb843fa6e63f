"""Example: depth camera -> TSDF -> ESDF -> collision-aware IK.

The live perception-to-planning pipeline (reference
`examples/reference/live_volumetric_mapping_mpc.py` analog).

Usage: python examples/perception_to_planning.py [--test]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--test", action="store_true")
    args = ap.parse_args()

    if args.test:
        os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    import curobo_tpu as ct
    from curobo_tpu.perception.mapper import MapperConfig

    # synthetic depth camera observing a box obstacle
    W, H = (80, 60) if args.test else (320, 240)
    f = W / (2 * np.tan(np.radians(30)))
    K = jnp.asarray([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1.0]])
    R = np.array([[0, 0, 1], [-1, 0, 0], [0, -1, 0]], dtype=np.float64)
    cam = ct.Pose.from_rotation(
        jnp.asarray(R, dtype=jnp.float32), jnp.asarray([-1.0, 0.0, 0.5])
    )

    # render a box at (0.45, 0, 0.45) with the slab method
    v, u = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    dirs_cam = np.stack([(u - W / 2) / f, (v - H / 2) / f, np.ones_like(u, float)], -1)
    dirs = dirs_cam @ R.T
    o = np.array([-1.0, 0.0, 0.5])
    lo_b, hi_b = np.array([0.35, -0.15, 0.3]), np.array([0.55, 0.15, 0.6])
    with np.errstate(divide="ignore", invalid="ignore"):
        t0 = (lo_b - o) / dirs
        t1 = (hi_b - o) / dirs
    tmin = np.minimum(t0, t1).max(-1)
    tmax = np.maximum(t0, t1).min(-1)
    hit = (tmax > tmin) & (tmin > 0)
    depth = jnp.asarray(np.where(hit, tmin, 0.0), dtype=jnp.float32)

    dims = (48, 48, 40) if args.test else (96, 96, 80)
    mapper = ct.Mapper(MapperConfig(dims=dims, voxel_size=0.025, origin=(-0.6, -0.6, -0.1)))
    filt = ct.FilterDepth()
    obs = filt(ct.CameraObservation(depth=depth, intrinsics=K, pose=cam))
    mapper.integrate(obs)
    vg = mapper.get_voxel_grid("esdf_world")
    print(f"mapped {int((np.asarray(vg.data) < 0).sum())} occupied voxels")

    # plan IK around the mapped obstacle
    kin = ct.Kinematics.from_robot_yaml(ct.robot_config_path("franka"))
    world = ct.compile_scene(ct.Scene().add(vg))
    solver = ct.IKSolver(kin.params, ct.IKConfig(n_seeds=8 if args.test else 32))
    # goal just above the mapped box
    goal = ct.Pose(jnp.asarray([[0.45, 0.0, 0.75]]), jnp.asarray([[0.0, 1.0, 0.0, 0.0]]))
    res = solver.solve_pose(world, goal)
    print(f"IK over ESDF world: success={bool(res.success[0])} "
          f"pos_err={float(res.position_error[0])*1000:.2f}mm")
    if args.test:
        assert int((np.asarray(vg.data) < 0).sum()) > 0
        print("TEST PASSED")


if __name__ == "__main__":
    main()
