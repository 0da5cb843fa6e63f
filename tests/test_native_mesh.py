"""Native mesh-SDF library (csrc/mesh_sdf.cpp via ctypes) vs the numpy
reference implementation in geom/mesh.py.

Oracle pattern per SURVEY.md §4: the slow readable implementation
validates the fast native one. Parity role: reference Warp BVH mesh
queries (`curobo/_src/geom/data/data_mesh.py:600`)."""

import numpy as np
import pytest

from curobo_tpu.geom import mesh as mesh_mod
from curobo_tpu.native import native_available

pytestmark = pytest.mark.skipif(
    not native_available(), reason="no C++ toolchain for the native library"
)


def _icosahedron(scale=1.0):
    phi = (1 + 5**0.5) / 2
    v = np.array(
        [
            [-1, phi, 0], [1, phi, 0], [-1, -phi, 0], [1, -phi, 0],
            [0, -1, phi], [0, 1, phi], [0, -1, -phi], [0, 1, -phi],
            [phi, 0, -1], [phi, 0, 1], [-phi, 0, -1], [-phi, 0, 1],
        ],
        dtype=np.float64,
    )
    v *= scale / np.linalg.norm(v[0])
    f = np.array(
        [
            [0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
            [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
            [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
            [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1],
        ],
        dtype=np.int64,
    )
    return v, f


def _subdivide(v, f):
    """One loop of midpoint subdivision (4x the triangles)."""
    edge_mid = {}
    v = list(map(tuple, v))

    def mid(a, b):
        key = (min(a, b), max(a, b))
        if key not in edge_mid:
            m = tuple((np.array(v[a]) + np.array(v[b])) / 2.0)
            edge_mid[key] = len(v)
            v.append(m)
        return edge_mid[key]

    out = []
    for a, b, c in f:
        ab, bc, ca = mid(a, b), mid(b, c), mid(c, a)
        out += [[a, ab, ca], [b, bc, ab], [c, ca, bc], [ab, bc, ca]]
    return np.asarray(v, dtype=np.float64), np.asarray(out, dtype=np.int64)


class TestNativeMeshSDF:
    def test_matches_numpy_reference(self):
        from curobo_tpu.native import mesh_sdf, mesh_udf

        verts, faces = _icosahedron(0.5)
        rng = np.random.RandomState(0)
        pts = rng.uniform(-1.0, 1.0, (500, 3))

        tri = verts[faces]
        d_ref = mesh_mod.point_triangle_distance(pts, tri).min(axis=-1)
        inside = mesh_mod._inside_mask(pts, verts, faces)
        sdf_ref = np.where(inside, -d_ref, d_ref)

        np.testing.assert_allclose(mesh_udf(verts, faces, pts), d_ref, atol=1e-5)
        np.testing.assert_allclose(mesh_sdf(verts, faces, pts), sdf_ref, atol=1e-5)

    def test_sphere_analytic(self):
        # a subdivided icosphere's SDF approaches |p| - r
        from curobo_tpu.native import mesh_sdf

        v, f = _icosahedron(1.0)
        for _ in range(3):
            v, f = _subdivide(v, f)
        v /= np.linalg.norm(v, axis=-1, keepdims=True)  # project to unit sphere
        rng = np.random.RandomState(1)
        pts = rng.uniform(-1.5, 1.5, (300, 3))
        got = mesh_sdf(v, f, pts)
        want = np.linalg.norm(pts, axis=-1) - 1.0
        np.testing.assert_allclose(got, want, atol=5e-3)

    def test_bake_path_uses_native(self):
        # mesh_to_sdf_grid produces the same grid with and without native
        import os

        from curobo_tpu.geom import types as gt

        verts, faces = _icosahedron(0.3)
        o = gt.MeshObstacle(
            name="ico", pose=[0, 0, 0, 1, 0, 0, 0], vertices=verts,
            faces=faces, voxel_size=0.1,
        )
        sdf_n, org_n, cell_n = mesh_mod.mesh_to_sdf_grid(o)
        os.environ["CUROBO_TPU_NO_NATIVE"] = "1"
        try:
            import curobo_tpu.native.build as nb

            lib, tried = nb._lib, nb._tried
            nb._lib, nb._tried = None, False
            sdf_p, org_p, cell_p = mesh_mod.mesh_to_sdf_grid(o)
            nb._lib, nb._tried = lib, tried
        finally:
            del os.environ["CUROBO_TPU_NO_NATIVE"]
        assert cell_n == cell_p
        np.testing.assert_allclose(org_n, org_p)
        np.testing.assert_allclose(sdf_n, sdf_p, atol=1e-5)

    def test_speedup_over_numpy(self):
        # not a strict perf assertion (CI noise) — just confirm the native
        # path completes a workload that would take the numpy path minutes
        import time

        from curobo_tpu.native import mesh_sdf

        v, f = _icosahedron(1.0)
        for _ in range(4):
            v, f = _subdivide(v, f)  # 5120 triangles
        rng = np.random.RandomState(2)
        pts = rng.uniform(-1.5, 1.5, (40**3, 3))  # 64k queries
        t0 = time.perf_counter()
        out = mesh_sdf(v, f, pts)
        dt = time.perf_counter() - t0
        assert np.isfinite(out).all()
        assert dt < 30.0, f"native mesh SDF too slow: {dt:.1f}s"
