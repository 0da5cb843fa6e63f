"""Perception tests: generated-observation correctness (reference pattern:
`tests/_src/perception/mapper/test_generated_observation_correctness.py`).

A synthetic camera observes a known box; the TSDF -> ESDF pipeline must
reproduce the box's signed distances within a voxel or two.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from curobo_tpu.perception.mapper import (
    Mapper,
    MapperConfig,
    exact_edt,
)
from curobo_tpu.perception.segmenter import FilterDepth, RobotSegmenter
from curobo_tpu.perception.types import CameraObservation, LidarObservation
from curobo_tpu.types.pose import Pose


def make_camera(width=160, height=120, fov_deg=60.0):
    f = width / (2.0 * np.tan(np.radians(fov_deg) / 2))
    K = jnp.asarray([[f, 0, width / 2], [0, f, height / 2], [0, 0, 1.0]])
    return K


def render_box_depth(K, cam_pose: Pose, box_center, box_half, width=160, height=120):
    """Ray-march a box analytically (slab method) to synthesize depth."""
    Kn = np.asarray(K)
    fx, fy, cx, cy = Kn[0, 0], Kn[1, 1], Kn[0, 2], Kn[1, 2]
    v, u = np.meshgrid(np.arange(height), np.arange(width), indexing="ij")
    dirs_cam = np.stack(
        [(u - cx) / fx, (v - cy) / fy, np.ones_like(u, dtype=np.float64)], axis=-1
    )
    R = np.asarray(cam_pose.rotation_matrix())
    o = np.asarray(cam_pose.position)
    dirs = dirs_cam @ R.T
    lo = np.asarray(box_center) - box_half
    hi = np.asarray(box_center) + box_half
    with np.errstate(divide="ignore", invalid="ignore"):
        t0 = (lo - o) / dirs
        t1 = (hi - o) / dirs
    tmin = np.minimum(t0, t1).max(axis=-1)
    tmax = np.maximum(t0, t1).min(axis=-1)
    hit = (tmax > tmin) & (tmin > 0)
    # dirs_cam has z=1, so the ray parameter t IS the pinhole z-depth.
    depth = np.where(hit, tmin, 0.0)
    return jnp.asarray(depth, dtype=jnp.float32)


class TestEDT:
    def test_matches_scipy(self):
        from scipy.ndimage import distance_transform_edt

        rng = np.random.RandomState(0)
        occ = rng.rand(24, 20, 16) < 0.03
        occ[5, 5, 5] = True
        cell = 0.1
        ours = np.asarray(exact_edt(jnp.asarray(occ), cell))
        ref = distance_transform_edt(~occ, sampling=cell)
        np.testing.assert_allclose(ours, ref, atol=1e-4)


class TestMapper:
    def test_box_tsdf_esdf(self):
        cfg = MapperConfig(dims=(64, 64, 48), voxel_size=0.025, origin=(-0.8, -0.8, -0.2))
        mapper = Mapper(cfg)
        K = make_camera()
        box_c = np.array([0.0, 0.0, 0.4])
        box_h = np.array([0.15, 0.15, 0.15])
        # camera looking from the front (x = -1.2) toward +x: camera z -> +x
        # columns = camera axes in world: x_cam=(0,-1,0), y_cam=(0,0,-1),
        # z_cam=(1,0,0) -> camera looks along +x world.
        R = np.array([[0, 0, 1], [-1, 0, 0], [0, -1, 0]], dtype=np.float64)
        cam = Pose.from_rotation(jnp.asarray(R, dtype=jnp.float32), jnp.asarray([-1.2, 0.0, 0.4]))
        depth = render_box_depth(K, cam, box_c, box_h)
        assert float(jnp.sum(depth > 0)) > 100  # the box is visible
        obs = CameraObservation(depth=depth, intrinsics=K, pose=cam)
        mapper.integrate(obs)
        assert float(jnp.sum(mapper.grid.weight)) > 0

        esdf = np.asarray(mapper.compute_esdf())
        # sample: a point on the near face of the box should be ~0 distance;
        # a point 0.2m in front of the face should be ~0.2
        def world_to_idx(p):
            return tuple(
                int(round((p[i] - cfg.origin[i]) / cfg.voxel_size)) for i in range(3)
            )

        near_face = world_to_idx([box_c[0] - box_h[0], 0.0, 0.4])
        in_front = world_to_idx([box_c[0] - box_h[0] - 0.2, 0.0, 0.4])
        assert abs(esdf[near_face]) < 3 * cfg.voxel_size
        np.testing.assert_allclose(esdf[in_front], 0.2, atol=3 * cfg.voxel_size)

    def test_feeds_planning_world(self):
        cfg = MapperConfig(dims=(32, 32, 32), voxel_size=0.05, origin=(-0.8, -0.8, -0.8))
        mapper = Mapper(cfg)
        pts = jnp.asarray(np.random.RandomState(0).uniform(-0.1, 0.1, (200, 3)), dtype=jnp.float32)
        mapper.integrate(LidarObservation(points=pts, pose=Pose.identity()), carve=False)
        vg = mapper.get_voxel_grid()
        from curobo_tpu.geom import types as gt, world as wm

        world = wm.compile_scene(gt.Scene().add(vg))
        d_center = float(wm.sphere_sdf(world, jnp.zeros((1, 3)))[0])
        d_far = float(wm.sphere_sdf(world, jnp.asarray([[0.6, 0.6, 0.6]]))[0])
        assert d_center < 0.1  # near the point blob
        assert d_far > 0.3

    def test_save_load_roundtrip(self, tmp_path):
        cfg = MapperConfig(dims=(16, 16, 16), voxel_size=0.05, origin=(0, 0, 0))
        mapper = Mapper(cfg)
        pts = jnp.asarray(np.random.RandomState(1).uniform(0.2, 0.6, (50, 3)), dtype=jnp.float32)
        mapper.integrate(LidarObservation(points=pts, pose=Pose.identity()), carve=False)
        p = str(tmp_path / "map.npz")
        mapper.save(p)
        m2 = Mapper(cfg)
        m2.load(p)
        np.testing.assert_array_equal(np.asarray(m2.grid.tsdf), np.asarray(mapper.grid.tsdf))


class TestSegmenter:
    def test_robot_mask(self):
        import os

        from curobo_tpu.robot.kinematics import Kinematics

        kin = Kinematics.from_robot_yaml(
            os.path.join(os.path.dirname(__file__), "..", "curobo_tpu", "content", "robots", "franka.yml")
        )
        K = make_camera(80, 60)
        # camera in front of the robot looking back at the base
        R = np.array([[0, 0, 1], [-1, 0, 0], [0, -1, 0]], dtype=np.float64)
        cam = Pose.from_rotation(jnp.asarray(R, dtype=jnp.float32), jnp.asarray([-1.5, 0.0, 0.5]))
        # synthetic depth: flat wall at 3m, a 1.5m-deep patch covering the
        # pixel that projects onto the robot base sphere at (0, 0, 0.085):
        # cam at (-1.5, 0, 0.5) looking +x -> that point is at depth 1.5,
        # u = cx = 40, v = cy + fy*(0.5-0.085)/1.5 ~ 49.
        depth = np.full((60, 80), 3.0, dtype=np.float32)
        depth[40:58, 30:50] = 1.5
        obs = CameraObservation(depth=jnp.asarray(depth), intrinsics=K, pose=cam)
        seg = RobotSegmenter(kin.params)
        mask = np.asarray(seg.get_robot_mask(obs, kin.params.retract_config))
        assert mask[49, 40]  # pixel hitting the base sphere
        assert not mask[5, 5]  # wall pixel far behind the robot
        cleaned = seg.remove_robot(obs, kin.params.retract_config)
        assert float(cleaned.depth[49, 40]) == 0.0
        assert float(cleaned.depth[5, 5]) == 3.0


class TestFilterDepth:
    def test_smooths_and_fills(self):
        depth = np.full((40, 40), 2.0, dtype=np.float32)
        depth += np.random.RandomState(0).normal(0, 0.005, depth.shape).astype(np.float32)
        depth[20, 20] = 0.0  # hole
        f = FilterDepth()
        obs = CameraObservation(
            depth=jnp.asarray(depth), intrinsics=make_camera(40, 40), pose=Pose.identity()
        )
        out = np.asarray(f(obs).depth)
        assert abs(out[20, 20] - 2.0) < 0.05  # hole filled
        assert out.std() <= depth.std() + 1e-6


class TestJFA:
    def test_matches_exact_edt(self):
        from curobo_tpu.perception.mapper import jfa_edt

        rng = np.random.RandomState(3)
        occ = rng.rand(24, 20, 16) < 0.02
        occ[4, 4, 4] = True
        cell = 0.05
        exact = np.asarray(exact_edt(jnp.asarray(occ), cell))
        jfa = np.asarray(jfa_edt(jnp.asarray(occ), cell))
        # JFA is exact-or-within-a-voxel after the +2 cleanup passes
        assert np.max(np.abs(jfa - exact)) <= 1.5 * cell
        # the overwhelming majority of voxels are exact
        assert np.mean(np.abs(jfa - exact) < 1e-5) > 0.99

    def test_esdf_mode_jfa(self):
        from curobo_tpu.perception.mapper import TSDFGrid, compute_esdf

        cfg = MapperConfig(dims=(16, 16, 16), voxel_size=0.05, origin=(0, 0, 0),
                           esdf_mode="jfa")
        occ = np.zeros(cfg.dims, bool)
        occ[8, 8, 8] = True
        grid = TSDFGrid(
            tsdf=jnp.where(jnp.asarray(occ), -0.01, cfg.truncation),
            weight=jnp.where(jnp.asarray(occ), 1.0, 0.0),
        )
        esdf = np.asarray(compute_esdf(cfg, grid))
        np.testing.assert_allclose(esdf[8, 8, 12], 4 * cfg.voxel_size, atol=1e-5)


class TestLidarCarving:
    def test_carves_free_space_and_marks_surface(self):
        # sensor at origin, a wall of points at x = 1.0 spanning y/z
        cfg = MapperConfig(dims=(40, 24, 24), voxel_size=0.05,
                           origin=(0.05, -0.6, -0.6),
                           lidar_bins=(256, 64),
                           lidar_fov_elevation=(-0.8, 0.8))
        mapper = Mapper(cfg)
        ys, zs = np.meshgrid(np.linspace(-0.5, 0.5, 60), np.linspace(-0.5, 0.5, 60))
        pts = np.stack([np.ones_like(ys), ys, zs], -1).reshape(-1, 3)
        mapper.integrate(LidarObservation(points=jnp.asarray(pts, jnp.float32),
                                          pose=Pose.identity()))
        tsdf = np.asarray(mapper.grid.tsdf)
        w = np.asarray(mapper.grid.weight)

        def idx(p):
            return tuple(int(round((p[i] - cfg.origin[i]) / cfg.voxel_size))
                         for i in range(3))

        free = idx([0.5, 0.0, 0.0])   # between sensor and wall
        surf = idx([1.0, 0.0, 0.0])   # on the wall
        assert w[free] > 0 and tsdf[free] > 0.9 * cfg.truncation  # carved free
        assert w[surf] > 0 and abs(tsdf[surf]) < 2 * cfg.voxel_size  # surface


class TestRGBAndFeatures:
    def test_rgb_fused_at_surface(self):
        cfg = MapperConfig(dims=(64, 64, 48), voxel_size=0.025,
                           origin=(-0.8, -0.8, -0.2), rgb_channels=True)
        mapper = Mapper(cfg)
        K = make_camera()
        box_c, box_h = np.array([0.0, 0.0, 0.4]), np.array([0.15, 0.15, 0.15])
        R = np.array([[0, 0, 1], [-1, 0, 0], [0, -1, 0]], dtype=np.float64)
        cam = Pose.from_rotation(jnp.asarray(R, jnp.float32),
                                 jnp.asarray([-1.2, 0.0, 0.4]))
        depth = render_box_depth(K, cam, box_c, box_h)
        rgb = jnp.broadcast_to(jnp.asarray([1.0, 0.25, 0.0]),
                               depth.shape + (3,))
        mapper.integrate(CameraObservation(depth=depth, intrinsics=K,
                                           pose=cam, rgb=rgb))
        # query color on the observed near face
        q = jnp.asarray([[box_c[0] - box_h[0], 0.0, 0.4]])
        c = np.asarray(mapper.query_rgb(q))[0]
        np.testing.assert_allclose(c, [1.0, 0.25, 0.0], atol=0.05)


class TestRenderer:
    def test_render_roundtrip(self):
        """Integrate a synthetic box, re-render from the same camera: depths
        must agree on observed surface pixels (reference renderer.py:61)."""
        cfg = MapperConfig(dims=(64, 64, 48), voxel_size=0.025,
                           origin=(-0.8, -0.8, -0.2))
        mapper = Mapper(cfg)
        K = make_camera()
        box_c, box_h = np.array([0.0, 0.0, 0.4]), np.array([0.15, 0.15, 0.15])
        R = np.array([[0, 0, 1], [-1, 0, 0], [0, -1, 0]], dtype=np.float64)
        cam = Pose.from_rotation(jnp.asarray(R, jnp.float32),
                                 jnp.asarray([-1.2, 0.0, 0.4]))
        depth = render_box_depth(K, cam, box_c, box_h)
        mapper.integrate(CameraObservation(depth=depth, intrinsics=K, pose=cam))
        rendered = np.asarray(mapper.render_depth(K, cam, depth.shape))
        d = np.asarray(depth)
        both = (d > 0) & (rendered > 0)
        assert both.sum() > 0.5 * (d > 0).sum()
        err = np.abs(rendered[both] - d[both])
        assert np.median(err) < 2 * cfg.voxel_size


class TestPoseRefinement:
    def test_recovers_small_offset(self):
        cfg = MapperConfig(dims=(64, 64, 48), voxel_size=0.025,
                           origin=(-0.8, -0.8, -0.2))
        mapper = Mapper(cfg)
        K = make_camera()
        box_c, box_h = np.array([0.0, 0.0, 0.4]), np.array([0.15, 0.15, 0.15])
        R = np.array([[0, 0, 1], [-1, 0, 0], [0, -1, 0]], dtype=np.float64)
        cam = Pose.from_rotation(jnp.asarray(R, jnp.float32),
                                 jnp.asarray([-1.2, 0.0, 0.4]))
        depth = render_box_depth(K, cam, box_c, box_h)
        mapper.integrate(CameraObservation(depth=depth, intrinsics=K, pose=cam))
        # perturb along the viewing axis (the direction a single box face
        # observes); the refiner must move it back toward truth
        cam_bad = Pose(cam.position + jnp.asarray([0.03, 0.0, 0.0]),
                       cam.quaternion)
        obs_bad = CameraObservation(depth=depth, intrinsics=K, pose=cam_bad)
        refined = mapper.refine_pose(obs_bad, n_iters=15)
        err_before = float(jnp.linalg.norm(cam_bad.position - cam.position))
        err_after = float(jnp.linalg.norm(refined.position - cam.position))
        assert err_after < 0.7 * err_before


class TestDecayAndStamp:
    def test_decay_fades_to_unobserved(self):
        cfg = MapperConfig(dims=(16, 16, 16), voxel_size=0.05, origin=(0, 0, 0))
        mapper = Mapper(cfg)
        pts = jnp.asarray([[0.4, 0.4, 0.4]], jnp.float32)
        mapper.integrate(LidarObservation(points=pts, pose=Pose.identity()),
                         carve=False)
        assert float(jnp.sum(mapper.grid.weight)) > 0
        for _ in range(10):
            mapper.decay(0.3)
        assert float(jnp.sum(mapper.grid.weight)) == 0.0
        np.testing.assert_allclose(
            float(jnp.min(mapper.grid.tsdf)), cfg.truncation, rtol=1e-6
        )

    def test_stamp_obstacles(self):
        from curobo_tpu.geom import types as gt, world as wm

        cfg = MapperConfig(dims=(32, 32, 32), voxel_size=0.05,
                           origin=(-0.8, -0.8, -0.8))
        mapper = Mapper(cfg)
        world = wm.compile_scene(gt.Scene().add(
            gt.SphereObstacle(name="b", pose=[0, 0, 0, 1, 0, 0, 0], radius=0.2)))
        mapper.stamp(world)
        esdf = np.asarray(mapper.compute_esdf())

        def idx(p):
            return tuple(int(round((p[i] - cfg.origin[i]) / cfg.voxel_size))
                         for i in range(3))

        assert esdf[idx([0, 0, 0])] < 0  # inside the sphere
        np.testing.assert_allclose(esdf[idx([0.5, 0, 0])], 0.3, atol=0.08)


class TestCheckpointValidation:
    def test_voxel_size_mismatch_raises(self, tmp_path):
        cfg = MapperConfig(dims=(8, 8, 8), voxel_size=0.05, origin=(0, 0, 0))
        m = Mapper(cfg)
        p = str(tmp_path / "m.npz")
        m.save(p)
        m2 = Mapper(MapperConfig(dims=(8, 8, 8), voxel_size=0.04, origin=(0, 0, 0)))
        with pytest.raises(ValueError, match="voxel_size"):
            m2.load(p)

    def test_rgb_roundtrip(self, tmp_path):
        cfg = MapperConfig(dims=(8, 8, 8), voxel_size=0.05, origin=(0, 0, 0),
                           rgb_channels=True)
        m = Mapper(cfg)
        p = str(tmp_path / "m.npz")
        m.save(p)
        m2 = Mapper(cfg)
        m2.load(p)
        assert m2.grid.rgb is not None
