"""Example: block-sparse volumetric mapping — surface-band block pool
instead of a dense grid: memory scales with OBSERVED SURFACE, per-frame
integration cost with the ACTIVE band (not workspace volume).

Usage:
    python examples/block_sparse_mapping.py [--test]

Parity: reference block-sparse `Mapper` default storage
(`perception/mapper/storage.py:493`, voxel-centric projective update
`wp_integrate_camera_project.py:27-40`).
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
        os.environ.setdefault(
            "XLA_FLAGS", "--xla_force_host_platform_device_count=1"
        )
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import numpy as np

    from curobo_tpu.perception.mapper import Mapper, MapperConfig
    from curobo_tpu.perception.types import CameraObservation
    from curobo_tpu.types.pose import Pose

    H, W = (96, 128) if args.test else (480, 640)
    f = W / (2.0 * np.tan(np.radians(60.0) / 2))
    K = jnp.asarray([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1.0]])

    # two RGB-D cameras looking at a wavy surface ~1.3 m away
    rng = np.random.RandomState(0)
    def obs(pos, seed):
        r = np.random.RandomState(seed)
        depth = jnp.asarray(
            1.2 + 0.15 * r.rand(H, W).astype(np.float32)
        )
        return CameraObservation(
            depth=depth,
            intrinsics=K,
            pose=Pose(jnp.asarray(pos), jnp.asarray([1.0, 0, 0, 0])),
            rgb=jnp.asarray(r.rand(H, W, 3), jnp.float32),
            feature=jnp.asarray(r.rand(H, W, 4), jnp.float32),
        )

    mapper = Mapper(
        MapperConfig(
            dims=(96, 96, 96),
            voxel_size=0.02,
            origin=(-0.95, -0.95, 0.01),
            rgb_channels=True,
            feature_channels=4,
        ),
        storage="sparse",
    )
    frames = 2 if args.test else 10
    t0 = time.perf_counter()
    for i in range(frames):
        mapper.integrate(obs([0.0, 0.0, 0.0], i))
        mapper.integrate(obs([0.25, 0.0, 0.0], 100 + i))
    jax.block_until_ready(mapper._sparse.grid.tsdf)
    dt = (time.perf_counter() - t0) / frames
    stats = mapper._sparse.stats()
    print(
        f"integrated {frames} dual-RGBD frame pairs: {dt*1e3:.1f} ms/pair, "
        f"{stats['allocated_blocks']} blocks "
        f"({stats['bytes']/1e6:.1f} MB pool)"
    )

    # dense rasterization + ESDF for planning
    esdf = mapper.compute_esdf()
    occ = int((np.asarray(mapper.grid.weight) > 0).sum())
    print(f"observed voxels in window: {occ}; esdf shape {esdf.shape}")

    if args.test:
        assert stats["allocated_blocks"] > 0
        assert occ > 100
        assert np.isfinite(np.asarray(esdf)).all()
        print("TEST PASSED")


if __name__ == "__main__":
    main()
