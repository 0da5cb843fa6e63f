"""Example: LiDAR scans -> TSDF (with free-space carving) -> ESDF ->
planning world.

A spinning-LiDAR scan of a box is synthesized analytically, integrated
with the voxel-centric projective LiDAR path (every voxel looks up the
measured range along its own bearing: voxels in front of the return are
carved free, voxels in the surface band get the hit), and the resulting
ESDF is handed to the collision world.

Usage:
    python examples/lidar_volumetric_mapping.py [--test]

Parity: reference `examples/reference/lidar_volumetric_mapping.py`
(`wp_integrate_lidar_project.py` carving integrator).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def synth_lidar_scan(eye, box_c, box_h, n_az=256, n_el=32, el_fov=(-0.6, 0.6)):
    """Analytic slab-method raycast of a box -> (N, 3) sensor-frame points
    (sensor axes aligned with world; x-forward bearing convention)."""
    import numpy as np

    az = np.linspace(-np.pi, np.pi, n_az, endpoint=False)
    el = np.linspace(el_fov[0], el_fov[1], n_el)
    A, E = np.meshgrid(az, el, indexing="ij")
    dirs = np.stack(
        [np.cos(E) * np.cos(A), np.cos(E) * np.sin(A), np.sin(E)], axis=-1
    ).reshape(-1, 3)
    lo, hi = np.asarray(box_c) - box_h, np.asarray(box_c) + box_h
    with np.errstate(divide="ignore", invalid="ignore"):
        t0 = (lo - eye) / dirs
        t1 = (hi - eye) / dirs
    tmin = np.minimum(t0, t1).max(axis=-1)
    tmax = np.maximum(t0, t1).min(axis=-1)
    hit = (tmax > tmin) & (tmin > 0.05)
    # also return ground plane hits at z = 0 so carving has context
    tg = (0.0 - eye[2]) / dirs[:, 2]
    gnd = (dirs[:, 2] < 0) & (tg > 0.05) & (tg < 4.0)
    t = np.where(hit, tmin, np.where(gnd, tg, np.nan))
    return (dirs * t[:, None]).astype(np.float32)


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

    dims = (64, 64, 32) if args.test else (128, 128, 64)
    cfg = ct.MapperConfig(
        dims=dims, voxel_size=0.03, origin=(-1.0, -1.0, -0.05),
        lidar_bins=(256, 32), lidar_fov_elevation=(-0.6, 0.6),
    )
    mapper = ct.Mapper(cfg)

    box_c, box_h = np.array([0.4, 0.1, 0.3]), np.array([0.12, 0.12, 0.3])
    n_scans = 3 if args.test else 6
    t_int = 0.0
    for i in range(n_scans):
        # orbit at box height so every face is squarely inside the
        # elevation FOV of its nearest scan
        ang = 2 * np.pi * i / n_scans
        eye = np.array([1.1 * np.cos(ang), 1.1 * np.sin(ang), 0.35])
        pts = synth_lidar_scan(eye, box_c, box_h)
        obs = ct.LidarObservation(
            points=jnp.asarray(np.nan_to_num(pts, nan=0.0)),
            pose=ct.Pose(
                jnp.asarray(eye, jnp.float32), jnp.asarray([1.0, 0, 0, 0])
            ),
        )
        t0 = time.perf_counter()
        mapper.integrate(obs, carve=True)
        mapper.grid.tsdf.block_until_ready()
        t_int += time.perf_counter() - t0

    esdf = mapper.compute_esdf()
    esdf.block_until_ready()

    world = ct.compile_scene(ct.Scene().add(mapper.get_voxel_grid()))
    # probe just inside the +x face: the TSDF only observes a truncation
    # band around surfaces, so the deep interior stays unobserved (free by
    # planning semantics) — near-surface voxels are the occupied evidence
    probe_in = [float(box_c[0] + box_h[0] - 0.02), float(box_c[1]), float(box_c[2])]
    inside = float(wm.sphere_sdf(world, jnp.asarray([probe_in]))[0])
    free = float(wm.sphere_sdf(world, jnp.asarray([[-0.5, -0.5, 0.4]]))[0])

    print(f"integrated {n_scans} LiDAR scans "
          f"({t_int / n_scans * 1e3:.1f} ms/scan incl. host sync)")
    print(f"SDF just inside box surface: {inside:+.3f} m (expect <= 0)")
    print(f"SDF in carved free space: {free:+.3f} m (expect > 0)")
    if args.test:
        assert inside < 0.05 and free > 0.02
        print("TEST PASSED")


if __name__ == "__main__":
    main()
