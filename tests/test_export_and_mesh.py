"""Surface-nets mesh extraction + USD export tests."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from curobo_tpu.geom import types as gt
from curobo_tpu.perception.mesh_extract import extract_mesh
from curobo_tpu.robot.kinematics import Kinematics
from curobo_tpu.types.state import JointState
from curobo_tpu.util.usd_export import UsdWriter, export_plan_usd

CONTENT = os.path.join(os.path.dirname(__file__), "..", "curobo_tpu", "content", "robots")


class TestMeshExtract:
    def test_sphere_surface(self):
        n, cell = 32, 0.05
        xs = (np.arange(n) + 0.5) * cell - 0.8
        X, Y, Z = np.meshgrid(xs, xs, xs, indexing="ij")
        sdf = np.sqrt(X**2 + Y**2 + Z**2) - 0.4
        verts, faces = extract_mesh(sdf, origin=(-0.8 + cell / 2,) * 3, cell_size=cell)
        assert len(verts) > 100
        assert len(faces) > 100
        # all vertices near the r=0.4 sphere surface
        r = np.linalg.norm(verts, axis=-1)
        np.testing.assert_allclose(r, 0.4, atol=2 * cell)
        # faces index valid vertices
        assert faces.max() < len(verts)

    def test_empty_grid(self):
        sdf = np.ones((8, 8, 8))
        verts, faces = extract_mesh(sdf, origin=(0, 0, 0), cell_size=0.1)
        assert len(verts) == 0 and len(faces) == 0


class TestUsdExport:
    def test_export_plan(self, tmp_path):
        kin = Kinematics.from_robot_yaml(os.path.join(CONTENT, "franka.yml"))
        scene = gt.Scene().add(
            gt.Cuboid(name="table", pose=[0.4, 0, -0.1, 1, 0, 0, 0], dims=[1.2, 1.2, 0.2]),
            gt.SphereObstacle(name="ball", pose=[0.2, 0.3, 0.5, 1, 0, 0, 0], radius=0.1),
        )
        H = 5
        traj = JointState.from_position(
            jnp.broadcast_to(kin.params.retract_config, (H, 7)), kin.params.joint_names
        )
        p = str(tmp_path / "plan.usda")
        export_plan_usd(p, scene, kin.params, traj)
        text = open(p).read()
        assert text.startswith("#usda 1.0")
        assert 'def Cube "table"' in text
        assert 'def Sphere "ball"' in text
        assert "timeSamples" in text
        # per-link animated stage: link Xforms with orient+translate
        # samples and sphere children in the link frame
        assert 'def Xform "robot_' in text
        assert "xformOp:orient.timeSamples" in text
        assert 'def Sphere "sphere_' in text
        assert "primvars:displayColor" in text

    def test_export_plan_flat_spheres(self, tmp_path):
        kin = Kinematics.from_robot_yaml(os.path.join(CONTENT, "franka.yml"))
        scene = gt.Scene()
        H = 3
        traj = JointState.from_position(
            jnp.broadcast_to(kin.params.retract_config, (H, 7)), kin.params.joint_names
        )
        p = str(tmp_path / "flat.usda")
        export_plan_usd(p, scene, kin.params, traj, flat_spheres=True)
        assert "robot_sphere_0" in open(p).read()

    def test_mesh_prim(self, tmp_path):
        w = UsdWriter()
        w.add_mesh("m", np.zeros((3, 3)), np.asarray([[0, 1, 2]]))
        p = str(tmp_path / "m.usda")
        w.save(p)
        assert 'def Mesh "m"' in open(p).read()

    def test_all_obstacle_prims(self, tmp_path):
        tri = gt.MeshObstacle(
            name="tri", pose=[0, 0, 1, 1, 0, 0, 0],
            vertices=np.asarray([[0.0, 0, 0], [0.1, 0, 0], [0, 0.1, 0]]),
            faces=np.asarray([[0, 1, 2]]),
        )
        vox = gt.VoxelGridObstacle(
            name="vox", pose=[1, 0, 0, 1, 0, 0, 0], dims=(0.2, 0.2, 0.2),
            voxel_size=0.1, data=np.asarray([[[-0.01, 1.0], [1.0, 1.0]],
                                             [[1.0, 1.0], [1.0, 1.0]]]),
        )
        scene = gt.Scene().add(
            gt.Capsule(name="cap", pose=[0, 1, 0, 1, 0, 0, 0], radius=0.05,
                       base=(0, 0, 0), tip=(0, 0.3, 0)),
            gt.Cylinder(name="cyl", pose=[0, -1, 0, 1, 0, 0, 0], radius=0.05, height=0.3),
            gt.PointCloudObstacle(
                name="pc", pose=[0, 0, 2, 1, 0, 0, 0],
                points=np.asarray([[0.0, 0, 0], [0.05, 0, 0]]),
            ),
            tri, vox,
        )
        w = UsdWriter()
        w.add_scene(scene)
        p = str(tmp_path / "obs.usda")
        w.save(p)
        text = open(p).read()
        for prim in ('def Capsule "cap"', 'def Cylinder "cyl"',
                     'def Points "pc"', 'def Mesh "tri"', 'def Points "vox"'):
            assert prim in text, prim
