"""Attribute per-frame time of the block-sparse dual-RGBD integration on
the real TPU: discovery/unique, lookup, and the voxel update, at the bench
configuration (480x640, RGB + 8-dim features).

Usage: python tools/profile_block_sparse.py [stride] [max_blocks]
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def timeit(fn, *args, reps=96, k=32):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(reps // k):
        t0 = time.perf_counter()
        for _ in range(k):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / k)
    return best * 1e3


def main():
    import jax
    import jax.numpy as jnp

    from curobo_tpu import runtime as rt

    rt.enable_compilation_cache()
    import dataclasses

    from curobo_tpu.perception import block_sparse as bs
    from curobo_tpu.perception.types import CameraObservation
    from curobo_tpu.types.pose import Pose

    stride = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    max_blocks = int(sys.argv[2]) if len(sys.argv) > 2 else 1024

    H, W = 480, 640
    f = W / (2.0 * np.tan(np.radians(60.0) / 2))
    K_intr = jnp.asarray([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1.0]])

    def make_obs(key, pos):
        kd, kr, kf = jax.random.split(key, 3)
        depth = 1.2 + 0.3 * jax.random.uniform(kd, (H, W))
        return CameraObservation(
            depth=depth,
            intrinsics=K_intr,
            pose=Pose(jnp.asarray(pos), jnp.asarray([1.0, 0, 0, 0])),
            rgb=jax.random.uniform(kr, (H, W, 3)),
            feature=jax.random.uniform(kf, (H, W, 8)),
        )

    keys = jax.random.split(jax.random.PRNGKey(0), 2)
    o1 = make_obs(keys[0], [0.0, 0.0, -1.2])
    o2 = make_obs(keys[1], [0.3, 0.0, -1.2])

    cfg = bs.BlockSparseConfig(
        pool_blocks=4096, table_size=16384, rgb_channels=True,
        feature_channels=8, discovery_stride=stride,
        max_new_blocks_per_frame=max_blocks,
    )
    grid = bs.make_sparse_grid(cfg)

    # steady state: integrate both frames once so blocks exist
    integ1 = jax.jit(lambda g, o: bs.integrate_camera_sparse(cfg, g, o))
    grid = integ1(integ1(grid, o1), o2)
    jax.block_until_ready(grid)
    print("allocated:", int(grid.n_alloc), "dropped:", int(grid.dropped_blocks))

    # ---- stage timings ----
    disc = jax.jit(lambda o: bs._discover_blocks(cfg, o))
    print(f"discover (stride {stride}): {timeit(disc, o1):.3f} ms")

    disc_uniq = jax.jit(
        lambda o: jnp.unique(
            bs._encode(bs._discover_blocks(cfg, o)),
            size=cfg.max_new_blocks_per_frame, fill_value=bs._FREE,
        )
    )
    print(f"discover+unique: {timeit(disc_uniq, o1):.3f} ms")

    uniq = disc_uniq(o1)
    look = jax.jit(lambda g, u: bs._lookup(cfg, g, u))
    print(f"lookup({max_blocks}): {timeit(look, grid, uniq):.3f} ms")

    print(f"integrate one cam: {timeit(integ1, grid, o1):.3f} ms")

    integ2 = jax.jit(
        lambda g, a, b: bs.integrate_camera_sparse(
            cfg, bs.integrate_camera_sparse(cfg, g, a), b
        )
    )
    print(f"integrate dual: {timeit(integ2, grid, o1, o2):.3f} ms")


if __name__ == "__main__":
    main()
