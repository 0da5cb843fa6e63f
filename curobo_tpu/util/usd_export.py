"""USD (usda ASCII) scene/trajectory exporter — dependency-free.

Parity: reference `UsdWriter` (`curobo/_src/util/usd_writer.py`, lazy
`curobo/viewer.py`). Writes plain-text .usda files (no usd-core needed):
obstacles as geometry prims, the robot's collision spheres animated over
the trajectory with time samples.
"""

from __future__ import annotations

import os

import numpy as np

from curobo_tpu.geom import types as gt


def _fmt(v) -> str:
    return "(" + ", ".join(f"{float(x):.6g}" for x in v) + ")"


class UsdWriter:
    def __init__(self, fps: float = 30.0):
        self.fps = fps
        self._prims: list = []
        self._time_samples: dict = {}
        self._end_time = 0.0

    # ---- scene geometry ----------------------------------------------
    def add_scene(self, scene: gt.Scene) -> None:
        for o in scene.obstacles:
            x, y, z, qw, qx, qy, qz = [float(v) for v in o.pose]
            orient = f"orient = {_fmt((qw, qx, qy, qz))}" if (qx, qy, qz) != (0, 0, 0) else ""
            if isinstance(o, gt.Cuboid):
                self._prims.append(
                    f'''
    def Cube "{o.name}" {{
        double size = 1
        float3 xformOp:scale = {_fmt(o.dims)}
        double3 xformOp:translate = {_fmt((x, y, z))}
        quatf xformOp:orient = {_fmt((qw, qx, qy, qz))}
        uniform token[] xformOpOrder = ["xformOp:translate", "xformOp:orient", "xformOp:scale"]
    }}'''
                )
            elif isinstance(o, gt.SphereObstacle):
                self._prims.append(
                    f'''
    def Sphere "{o.name}" {{
        double radius = {o.radius}
        double3 xformOp:translate = {_fmt((x, y, z))}
        uniform token[] xformOpOrder = ["xformOp:translate"]
    }}'''
                )
            elif isinstance(o, gt.Cylinder):
                self._prims.append(
                    f'''
    def Cylinder "{o.name}" {{
        double radius = {o.radius}
        double height = {o.height}
        double3 xformOp:translate = {_fmt((x, y, z))}
        quatf xformOp:orient = {_fmt((qw, qx, qy, qz))}
        uniform token[] xformOpOrder = ["xformOp:translate", "xformOp:orient"]
    }}'''
                )

    def add_mesh(self, name: str, vertices: np.ndarray, faces: np.ndarray) -> None:
        pts = ", ".join(_fmt(v) for v in np.asarray(vertices))
        counts = ", ".join("3" for _ in range(len(faces)))
        idx = ", ".join(str(int(i)) for i in np.asarray(faces).reshape(-1))
        self._prims.append(
            f'''
    def Mesh "{name}" {{
        point3f[] points = [{pts}]
        int[] faceVertexCounts = [{counts}]
        int[] faceVertexIndices = [{idx}]
    }}'''
        )

    # ---- animated robot spheres --------------------------------------
    def add_sphere_trajectory(
        self, spheres_over_time: np.ndarray, name: str = "robot"
    ) -> None:
        """spheres_over_time (T, S, 4): animated xyzr robot spheres."""
        arr = np.asarray(spheres_over_time)
        T, S, _ = arr.shape
        self._end_time = max(self._end_time, T / self.fps)
        for s in range(S):
            if arr[0, s, 3] < 0:
                continue  # disabled placeholder
            samples = ",\n            ".join(
                f"{t / self.fps * 24.0:.4f}: {_fmt(arr[t, s, :3])}" for t in range(T)
            )
            self._prims.append(
                f'''
    def Sphere "{name}_sphere_{s}" {{
        double radius = {float(arr[0, s, 3]):.6g}
        double3 xformOp:translate.timeSamples = {{
            {samples}
        }}
        uniform token[] xformOpOrder = ["xformOp:translate"]
    }}'''
            )

    # ---- io -----------------------------------------------------------
    def save(self, path: str) -> None:
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        body = "\n".join(self._prims)
        end_code = max(int(self._end_time * 24.0), 1)
        with open(path, "w") as f:
            f.write(
                f'''#usda 1.0
(
    upAxis = "Z"
    metersPerUnit = 1
    startTimeCode = 0
    endTimeCode = {end_code}
    timeCodesPerSecond = 24
)

def Xform "world" {{{body}
}}
'''
            )


def export_plan_usd(
    path: str,
    scene: gt.Scene,
    params,
    trajectory,  # JointState (H, D) or (B, H, D) -> first problem
    fps: float = 30.0,
) -> None:
    """One-call trajectory export: scene + animated robot spheres."""
    import jax.numpy as jnp

    from curobo_tpu.robot import kinematics as kin_mod

    q = trajectory.position
    if q.ndim == 3:
        q = q[0]
    st = kin_mod.compute_kinematics(params, q)
    w = UsdWriter(fps=fps)
    w.add_scene(scene)
    w.add_sphere_trajectory(np.asarray(st.spheres))
    w.save(path)
