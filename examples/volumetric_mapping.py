"""Example: volumetric mapping — depth(+RGB) camera frames -> feature TSDF
-> ESDF -> raycast re-rendering -> planning world.

Usage:
    python examples/volumetric_mapping.py [--test]

Parity: reference `examples/getting_started/volumetric_mapping.py` and
`feature_mapping.py` (RGB/feature TSDF channels).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def synth_depth(K, cam, box_c, box_h, shape):
    """Analytic box raycast (slab method) to synthesize a depth frame."""
    import numpy as np

    H, W = shape
    Kn = np.asarray(K)
    fx, fy, cx, cy = Kn[0, 0], Kn[1, 1], Kn[0, 2], Kn[1, 2]
    v, u = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    dirs_cam = np.stack(
        [(u - cx) / fx, (v - cy) / fy, np.ones_like(u, float)], axis=-1
    )
    R = np.asarray(cam.rotation_matrix())
    o = np.asarray(cam.position)
    dirs = dirs_cam @ R.T
    lo, hi = np.asarray(box_c) - box_h, np.asarray(box_c) + box_h
    with np.errstate(divide="ignore", invalid="ignore"):
        t0 = (lo - o) / dirs
        t1 = (hi - o) / dirs
    tmin = np.minimum(t0, t1).max(axis=-1)
    tmax = np.maximum(t0, t1).min(axis=-1)
    hit = (tmax > tmin) & (tmin > 0)
    return np.where(hit, tmin, 0.0).astype(np.float32)


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
    from curobo_tpu.geom import world as wm

    dims = (64, 64, 48) if args.test else (128, 128, 96)
    cfg = ct.MapperConfig(
        dims=dims, voxel_size=0.025, origin=(-0.8, -0.8, -0.2),
        rgb_channels=True,
    )
    mapper = ct.Mapper(cfg)

    W, H = 160, 120
    f = W / (2.0 * np.tan(np.radians(60.0) / 2))
    K = jnp.asarray([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1.0]])
    box_c, box_h = np.array([0.0, 0.0, 0.4]), np.array([0.15, 0.15, 0.15])

    # orbit the camera around the box, integrating depth + RGB
    n_frames = 3 if args.test else 12
    t_int = 0.0
    for i in range(n_frames):
        ang = 2 * np.pi * i / max(n_frames, 1)
        eye = np.array([1.2 * np.cos(ang), 1.2 * np.sin(ang), 0.4])
        fwd = (box_c - eye) / np.linalg.norm(box_c - eye)
        up = np.array([0.0, 0.0, 1.0])
        right = np.cross(fwd, up); right /= np.linalg.norm(right)
        down = np.cross(fwd, right)
        R = np.stack([right, down, fwd], axis=1)
        cam = ct.Pose.from_rotation(
            jnp.asarray(R, jnp.float32), jnp.asarray(eye, jnp.float32)
        )
        depth = jnp.asarray(synth_depth(K, cam, box_c, box_h, (H, W)))
        rgb = jnp.broadcast_to(jnp.asarray([0.9, 0.4, 0.1]), (H, W, 3))
        obs = ct.CameraObservation(depth=depth, intrinsics=K, pose=cam, rgb=rgb)
        t0 = time.perf_counter()
        mapper.integrate(obs)
        mapper.grid.tsdf.block_until_ready()
        t_int += time.perf_counter() - t0

    t0 = time.perf_counter()
    esdf = mapper.compute_esdf()
    esdf.block_until_ready()
    t_esdf = time.perf_counter() - t0

    # re-render depth from the map and hand the ESDF to the planner world
    rendered = mapper.render_depth(K, cam, (H, W))
    world = ct.compile_scene(ct.Scene().add(mapper.get_voxel_grid()))
    # probe the +x side face (squarely observed by the first camera)
    d_surface = float(
        wm.sphere_sdf(world, jnp.asarray([[0.15, 0.0, 0.4]]))[0]
    )
    color = np.asarray(mapper.query_rgb(jnp.asarray([[-0.15, 0.0, 0.4]])))[0]

    print(f"integrated {n_frames} RGB-D frames "
          f"({t_int/max(n_frames,1)*1e3:.1f} ms/frame incl. host sync)")
    print(f"ESDF {dims}: {t_esdf*1e3:.1f} ms (first call incl. compile)")
    print(f"rendered depth coverage: {float((rendered > 0).mean())*100:.0f}% of pixels")
    print(f"SDF at box top surface: {d_surface:+.3f} m (expect ~0)")
    print(f"fused color at near face: {color.round(2)} (expect ~[0.9 0.4 0.1])")
    if args.test:
        assert abs(d_surface) < 0.08
        assert abs(color[0] - 0.9) < 0.15
        print("TEST PASSED")


if __name__ == "__main__":
    main()
