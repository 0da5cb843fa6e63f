"""Geometry/world tests: SDF primitives, scene compile, queries, mesh bake."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from curobo_tpu.geom import sdf as sdf_mod
from curobo_tpu.geom import types as gt
from curobo_tpu.geom import world as world_mod
from curobo_tpu.geom.mesh import mesh_to_sdf_grid
from curobo_tpu.geom.self_collision import self_collision_cost, self_collision_distance
from curobo_tpu.robot.params import SelfCollisionParams


class TestSdfPrimitives:
    def test_box(self):
        half = jnp.asarray([0.5, 0.5, 0.5])
        np.testing.assert_allclose(
            float(sdf_mod.sdf_box(jnp.asarray([0.0, 0, 0]), half)), -0.5, atol=1e-5
        )
        np.testing.assert_allclose(
            float(sdf_mod.sdf_box(jnp.asarray([1.0, 0, 0]), half)), 0.5, atol=1e-6
        )
        np.testing.assert_allclose(
            float(sdf_mod.sdf_box(jnp.asarray([1.0, 1.0, 0]), half)),
            np.sqrt(2) * 0.5, atol=1e-6,
        )

    def test_sphere(self):
        d = sdf_mod.sdf_sphere(jnp.asarray([1.0, 0, 0]), jnp.zeros(3), 0.3)
        np.testing.assert_allclose(float(d), 0.7, atol=1e-6)

    def test_capsule(self):
        a, b = jnp.asarray([0.0, 0, 0]), jnp.asarray([0.0, 0, 1.0])
        d = sdf_mod.sdf_capsule(jnp.asarray([0.5, 0.0, 0.5]), a, b, 0.1)
        np.testing.assert_allclose(float(d), 0.4, atol=1e-6)
        d_end = sdf_mod.sdf_capsule(jnp.asarray([0.0, 0.0, 1.5]), a, b, 0.1)
        np.testing.assert_allclose(float(d_end), 0.4, atol=1e-6)

    def test_cylinder(self):
        d = sdf_mod.sdf_cylinder(jnp.asarray([0.0, 0.0, 0.0]), 0.2, 0.5)
        np.testing.assert_allclose(float(d), -0.2, atol=1e-5)
        d2 = sdf_mod.sdf_cylinder(jnp.asarray([0.5, 0.0, 0.0]), 0.2, 0.5)
        np.testing.assert_allclose(float(d2), 0.3, atol=1e-5)

    def test_voxel_trilinear(self):
        # Grid of a linear ramp sdf(x) = x; trilinear must reproduce it.
        xs = np.arange(10) * 0.1
        grid = jnp.asarray(np.tile(xs[:, None, None], (1, 5, 5)), dtype=jnp.float32)
        origin = jnp.zeros(3)
        pts = jnp.asarray([[0.25, 0.2, 0.2], [0.61, 0.1, 0.3]])
        vals = sdf_mod.sample_voxel_grid(grid, pts, origin, 0.1)
        np.testing.assert_allclose(np.asarray(vals), [0.25, 0.61], atol=1e-5)

    def test_voxel_gradient(self):
        xs = np.arange(10) * 0.1
        grid = jnp.asarray(np.tile(xs[:, None, None], (1, 5, 5)), dtype=jnp.float32)
        g = jax.grad(
            lambda p: sdf_mod.sample_voxel_grid(grid, p, jnp.zeros(3), 0.1)[0]
        )(jnp.asarray([[0.25, 0.2, 0.2]]))
        np.testing.assert_allclose(np.asarray(g[0]), [1.0, 0, 0], atol=1e-4)


@pytest.fixture
def simple_world():
    scene = gt.Scene().add(
        gt.Cuboid(name="table", pose=[0.5, 0.0, 0.1, 1, 0, 0, 0], dims=[0.4, 0.4, 0.2]),
        gt.SphereObstacle(name="ball", pose=[0.0, 0.5, 0.5, 1, 0, 0, 0], radius=0.1),
        gt.Capsule(
            name="pole", pose=[-0.5, 0.0, 0.0, 1, 0, 0, 0], radius=0.05,
            base=[0, 0, 0], tip=[0, 0, 1.0],
        ),
        gt.Cylinder(name="can", pose=[0.0, -0.5, 0.2, 1, 0, 0, 0], radius=0.05, height=0.2),
    )
    return scene, world_mod.compile_scene(scene, capacities={"cuboid": 4})


class TestWorldQueries:
    def test_min_sdf_correct(self, simple_world):
        _, world = simple_world
        # Point just above table center: distance to table top (z=0.2) wins.
        d = world_mod.sphere_sdf(world, jnp.asarray([[0.5, 0.0, 0.3]]))
        np.testing.assert_allclose(float(d[0]), 0.1, atol=1e-5)
        # Point near ball.
        d2 = world_mod.sphere_sdf(world, jnp.asarray([[0.0, 0.5, 0.8]]))
        np.testing.assert_allclose(float(d2[0]), 0.2, atol=1e-5)

    def test_clearance_and_cost(self, simple_world):
        _, world = simple_world
        spheres = jnp.asarray([[0.5, 0.0, 0.35, 0.1]])  # clears table by 0.05
        c = world_mod.sphere_clearance(world, spheres)
        np.testing.assert_allclose(float(c[0]), 0.05, atol=1e-5)
        cost = world_mod.collision_cost(world, spheres, activation_distance=0.1)
        np.testing.assert_allclose(float(cost[0]), 0.05, atol=1e-5)
        cost0 = world_mod.collision_cost(world, spheres, activation_distance=0.01)
        assert float(cost0[0]) == 0.0

    def test_disabled_sphere_ignored(self, simple_world):
        _, world = simple_world
        spheres = jnp.asarray([[0.5, 0.0, 0.2, -10.0]])  # placeholder sphere
        cost = world_mod.collision_cost(world, spheres)
        assert float(cost[0]) == 0.0

    def test_pose_update(self, simple_world):
        _, world = simple_world
        d0 = world_mod.sphere_sdf(world, jnp.asarray([[0.0, 0.5, 0.8]]))
        world2 = world.update_obstacle_pose("ball", [0.0, 0.5, 0.7], [1, 0, 0, 0])
        d1 = world_mod.sphere_sdf(world2, jnp.asarray([[0.0, 0.5, 0.8]]))
        np.testing.assert_allclose(float(d1[0]), 0.0, atol=1e-5)
        assert float(d0[0]) > float(d1[0])

    def test_enable_disable(self, simple_world):
        _, world = simple_world
        p = jnp.asarray([[0.5, 0.0, 0.25]])
        world2 = world.enable_obstacle("table", False)
        # Nearest remaining obstacle is the ball, 0.65 m away.
        np.testing.assert_allclose(
            float(world_mod.sphere_sdf(world2, p)[0]), 0.65, atol=1e-4
        )
        world3 = world2.enable_obstacle("table", True)
        np.testing.assert_allclose(
            float(world_mod.sphere_sdf(world3, p)[0]), 0.05, atol=1e-5
        )

    def test_rotated_cuboid(self):
        # 45° about z: point along the rotated face normal.
        ang = np.pi / 4
        q = [np.cos(ang / 2), 0, 0, np.sin(ang / 2)]
        scene = gt.Scene().add(
            gt.Cuboid(name="c", pose=[0, 0, 0] + q, dims=[0.2, 0.2, 0.2])
        )
        world = world_mod.compile_scene(scene)
        pt = 0.3 * np.asarray([np.cos(ang), np.sin(ang), 0.0])
        d = world_mod.sphere_sdf(world, jnp.asarray([pt], dtype=jnp.float32))
        np.testing.assert_allclose(float(d[0]), 0.2, atol=1e-5)

    def test_empty_world(self):
        world = world_mod.empty_world()
        d = world_mod.sphere_sdf(world, jnp.zeros((3, 3)))
        assert np.all(np.asarray(d) > 1e5)
        assert float(jnp.sum(world_mod.collision_cost(world, jnp.zeros((3, 4))))) == 0.0

    def test_gradients_flow(self, simple_world):
        _, world = simple_world
        g = jax.grad(
            lambda x: jnp.sum(
                world_mod.collision_cost(
                    world,
                    jnp.concatenate([x, jnp.full((1, 1), 0.1)], -1),
                    activation_distance=0.1,
                )
            )
        )(jnp.asarray([[0.5, 0.0, 0.35]]))
        assert np.isfinite(np.asarray(g)).all()
        assert np.asarray(g)[0, 2] < 0  # moving up reduces cost

    def test_jit_world_pytree(self, simple_world):
        _, world = simple_world
        f = jax.jit(world_mod.sphere_sdf)
        d = f(world, jnp.asarray([[0.5, 0.0, 0.3]]))
        np.testing.assert_allclose(float(d[0]), 0.1, atol=1e-5)


class TestVoxelWorld:
    def test_voxel_grid_obstacle(self):
        # SDF of a sphere of radius 0.2 at grid center, baked numerically.
        n, cell = 40, 0.025
        xs = (np.arange(n) + 0.5) * cell - 0.5
        X, Y, Z = np.meshgrid(xs, xs, xs, indexing="ij")
        data = np.sqrt(X**2 + Y**2 + Z**2) - 0.2
        scene = gt.Scene().add(
            gt.VoxelGridObstacle(
                name="esdf", pose=[1.0, 0, 0, 1, 0, 0, 0], dims=[1.0, 1.0, 1.0],
                voxel_size=cell, data=data,
            )
        )
        world = world_mod.compile_scene(scene)
        d = world_mod.sphere_sdf(world, jnp.asarray([[1.0, 0.0, 0.35]]))
        np.testing.assert_allclose(float(d[0]), 0.15, atol=cell)
        d_in = world_mod.sphere_sdf(world, jnp.asarray([[1.0, 0.0, 0.0]]))
        assert float(d_in[0]) < -0.15

    def test_update_voxel_data(self):
        n, cell = 8, 0.1
        scene = gt.Scene().add(
            gt.VoxelGridObstacle(name="g", dims=[0.8, 0.8, 0.8], voxel_size=cell)
        )
        world = world_mod.compile_scene(scene)
        assert float(world_mod.sphere_sdf(world, jnp.zeros((1, 3)))[0]) > 5.0
        world2 = world.update_voxel_data("g", jnp.full((n, n, n), -0.5))
        assert float(world_mod.sphere_sdf(world2, jnp.zeros((1, 3)))[0]) < 0.0


class TestMeshBake:
    def test_unit_cube_sdf(self):
        # Cube [-0.25, 0.25]^3 as 12 triangles.
        h = 0.25
        v = np.array(
            [[sx * h, sy * h, sz * h] for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)]
        )
        # faces via convex hull of the 8 corners
        from scipy.spatial import ConvexHull

        hull = ConvexHull(v)
        mesh = gt.MeshObstacle(name="cube", vertices=v, faces=hull.simplices, voxel_size=0.05)
        grid, origin, cell = mesh_to_sdf_grid(mesh)
        scene = gt.Scene()
        scene.add(mesh)
        world = world_mod.compile_scene(scene)
        # Outside the baked grid (beyond AABB+padding) -> free space.
        d_far = world_mod.sphere_sdf(world, jnp.asarray([[0.5, 0.0, 0.0]]))
        assert float(d_far[0]) >= 5.0
        # Near the face but inside the grid: sdf ~ distance to the face.
        d_out = world_mod.sphere_sdf(world, jnp.asarray([[0.27, 0.0, 0.0]]))
        np.testing.assert_allclose(float(d_out[0]), 0.02, atol=0.06)
        d_in = world_mod.sphere_sdf(world, jnp.asarray([[0.0, 0.0, 0.0]]))
        np.testing.assert_allclose(float(d_in[0]), -0.25, atol=0.06)


class TestSelfCollision:
    def make_params(self):
        return SelfCollisionParams(
            pair_a=jnp.asarray([0, 0], dtype=jnp.int32),
            pair_b=jnp.asarray([1, 2], dtype=jnp.int32),
            pair_margin=jnp.asarray([0.2, 0.2]),
            pair_buffer=jnp.zeros(2),
        )

    def test_distance(self):
        sc = self.make_params()
        spheres = jnp.asarray(
            [[0.0, 0, 0, 0.1], [0.15, 0, 0, 0.1], [1.0, 0, 0, 0.1]]
        )
        d = self_collision_distance(sc, spheres)
        np.testing.assert_allclose(float(d), 0.05, atol=1e-6)

    def test_clear(self):
        sc = self.make_params()
        spheres = jnp.asarray([[0.0, 0, 0, 0.1], [0.5, 0, 0, 0.1], [1.0, 0, 0, 0.1]])
        assert float(self_collision_distance(sc, spheres)) == 0.0
        assert float(self_collision_cost(sc, spheres)) == 0.0

    def test_batched_and_grad(self):
        sc = self.make_params()
        spheres = jnp.broadcast_to(
            jnp.asarray([[0.0, 0, 0, 0.1], [0.15, 0, 0, 0.1], [1.0, 0, 0, 0.1]]),
            (4, 3, 4),
        )
        d = self_collision_distance(sc, spheres)
        assert d.shape == (4,)
        g = jax.grad(lambda s: jnp.sum(self_collision_cost(sc, s)))(spheres)
        assert np.isfinite(np.asarray(g)).all()


class TestPointCloudBake:
    def test_pointcloud_obstacle_in_world(self):
        """PointCloud -> voxel SDF wiring (reference geom/types.py:736)."""
        import numpy as np

        from curobo_tpu.geom import types as gt
        from curobo_tpu.geom import world as wm

        # dense point sampling of a 0.2-cube surface centred at origin
        rng = np.random.RandomState(0)
        face = rng.uniform(-0.1, 0.1, (2000, 2))
        side = rng.randint(0, 6, 2000)
        pts = np.zeros((2000, 3))
        for i in range(2000):
            ax, sgn = side[i] % 3, 1.0 if side[i] < 3 else -1.0
            others = [a for a in range(3) if a != ax]
            pts[i, ax] = 0.1 * sgn
            pts[i, others[0]], pts[i, others[1]] = face[i]
        pc = gt.PointCloudObstacle(
            name="cloud", pose=[0.5, 0.0, 0.3, 1, 0, 0, 0],
            points=pts, point_radius=0.01, voxel_size=0.02,
        )
        world = wm.compile_scene(gt.Scene().add(pc))
        import jax.numpy as jnp

        d_center = float(wm.sphere_sdf(world, jnp.asarray([[0.5, 0.0, 0.3]]))[0])
        d_surf = float(wm.sphere_sdf(world, jnp.asarray([[0.6, 0.0, 0.3]]))[0])
        d_far = float(wm.sphere_sdf(world, jnp.asarray([[1.2, 0.0, 0.3]]))[0])
        assert abs(d_surf) < 0.03        # on the cloud surface
        assert d_far > 0.3               # far outside
        assert d_center < d_surf + 0.11  # interior not farther than surface+box


class TestAnonymizedWorld:
    def test_anonymized_matches_named(self):
        """`WorldData.anonymized()` (jit-key dedup) must be a pure metadata
        change: every query result identical, obstacle counts derived from
        ARRAY shapes — not from the name tuples (regression: name-count
        loops made anonymized worlds obstacle-free)."""
        import jax.numpy as jnp

        scene = gt.Scene().add(
            gt.Cuboid(name="wall", pose=[0.55, 0, 0.5, 1, 0, 0, 0], dims=[0.1, 0.5, 1.0]),
            gt.SphereObstacle(name="ball", pose=[0.3, 0.2, 0.4, 1, 0, 0, 0], radius=0.07),
            gt.Capsule(name="post", pose=[0.2, -0.3, 0.3, 1, 0, 0, 0],
                       base=[0, 0, -0.2], tip=[0, 0, 0.2], radius=0.04),
        )
        world = world_mod.compile_scene(scene, capacities={"cuboid": 4})
        anon = world.anonymized()
        assert anon.cuboids.names == () and anon.spheres.names == ()
        rng = np.random.RandomState(0)
        pts = jnp.asarray(rng.uniform(-0.5, 1.0, (64, 3)), jnp.float32)
        d_named = np.asarray(world_mod.sphere_sdf(world, pts))
        d_anon = np.asarray(world_mod.sphere_sdf(anon, pts))
        np.testing.assert_array_equal(d_named, d_anon)

        from curobo_tpu.ops import blast as bl

        x, y, z = pts[:, 0], pts[:, 1], pts[:, 2]
        b_named = np.asarray(bl.scene_min_sdf_blast(world, x[None], y[None], z[None]))
        b_anon = np.asarray(bl.scene_min_sdf_blast(anon, x[None], y[None], z[None]))
        np.testing.assert_array_equal(b_named, b_anon)
