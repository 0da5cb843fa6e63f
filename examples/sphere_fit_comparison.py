"""Example: collision-sphere fitting quality vs sphere budget.

Fits sphere models of increasing size to a mesh and reports coverage
metrics (surface coverage, over-approximation volume), the trade every
robot config makes between collision-check cost (n_spheres) and
fidelity. The fit is voxel-SDF seeded and refined by an optimizer on the
baked SDF (`geom/sphere_fit.py`).

Usage:
    python examples/sphere_fit_comparison.py [--test]

Parity: reference `examples/reference/sphere_fit_comparison.py`
(MorphIt sphere-fit comparison).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def capsule_mesh(length=0.4, radius=0.08, n=24):
    """Cylinder with rounded ends, tessellated (a link-like shape)."""
    import numpy as np

    rows = []
    for t in np.linspace(0, 1, 12):
        z = t * length
        rows.append((z, radius))
    verts, faces = [], []
    for zi, (z, r) in enumerate(rows):
        for k in range(n):
            a = 2 * np.pi * k / n
            verts.append([r * np.cos(a), r * np.sin(a), z])
    for zi in range(len(rows) - 1):
        for k in range(n):
            a, b = zi * n + k, zi * n + (k + 1) % n
            c, d = a + n, (k + 1) % n + (zi + 1) * n
            faces.append([a, b, d])
            faces.append([a, d, c])
    # caps
    import numpy as np

    verts.append([0.0, 0.0, -radius * 0.5])
    verts.append([0.0, 0.0, length + radius * 0.5])
    lo_c, hi_c = len(verts) - 2, len(verts) - 1
    for k in range(n):
        faces.append([k, (k + 1) % n, lo_c])
        base = (len(rows) - 1) * n
        faces.append([base + (k + 1) % n, base + k, hi_c])
    return np.asarray(verts, float), np.asarray(faces, int)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--test", action="store_true")
    args = ap.parse_args()

    if args.test:
        os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")
        import jax

        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from curobo_tpu.geom import types as gt
    from curobo_tpu.geom.mesh import mesh_to_sdf_grid
    from curobo_tpu.geom.sphere_fit import (
        SphereFitConfig,
        estimate_sphere_count,
        fit_spheres_to_mesh,
    )

    verts, faces = capsule_mesh()
    mesh = gt.MeshObstacle(name="link", vertices=verts, faces=faces,
                           voxel_size=0.015)

    # surface samples for the coverage metric
    sdf_grid, origin, cell = mesh_to_sdf_grid(mesh)
    near = np.argwhere(np.abs(sdf_grid) < cell)
    surf = origin + near * cell

    rec = estimate_sphere_count(mesh)
    print(f"auto-estimated sphere budget: {rec}")

    budgets = [2, 4, 8] if args.test else [2, 4, 8, 16, 32]
    results = {}
    for k in budgets:
        t0 = time.perf_counter()
        centers, radii = fit_spheres_to_mesh(mesh, SphereFitConfig(n_spheres=k))
        dt = time.perf_counter() - t0
        # signed distance of surface points to the sphere union
        d = np.linalg.norm(surf[:, None] - centers[None], axis=-1) - radii[None]
        d_union = d.min(axis=-1)
        coverage = float((d_union < cell).mean())  # surface within one voxel
        max_gap = float(np.maximum(d_union, 0).max())  # worst uncovered
        results[k] = (coverage, max_gap)
        print(
            f"K={k:3d}: surface coverage {coverage * 100:5.1f} %, "
            f"worst gap {max_gap * 1e3:5.1f} mm  ({dt:.2f} s fit)"
        )

    ks = sorted(results)
    if args.test:
        # more spheres must not fit worse
        assert results[ks[-1]][0] >= results[ks[0]][0] - 0.05
        assert results[ks[-1]][1] <= results[ks[0]][1] + 1e-6
        print("TEST PASSED")


if __name__ == "__main__":
    main()
