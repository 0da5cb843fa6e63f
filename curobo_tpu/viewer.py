"""Visualization facade (lazy imports).

Parity: reference `curobo/viewer.py` (lazy Viser/USD). In this environment
the always-available backend is the dependency-free USD(A) exporter
(`util/usd_export.py`); `viser` is used live when installed.
"""

from __future__ import annotations



def export_usd(path, scene, params, trajectory, fps: float = 30.0) -> None:
    """Write a .usda file with the scene + animated robot spheres."""
    from curobo_tpu.util.usd_export import export_plan_usd

    export_plan_usd(path, scene, params, trajectory, fps=fps)


def show_viser(scene, params, trajectory=None, port: int = 8080):
    """Interactive viser viewer (requires the optional `viser` package)."""
    try:
        import viser  # noqa: F401
    except ImportError as e:
        raise ImportError(
            "viser is not installed; use viewer.export_usd for offline "
            "visualization"
        ) from e
    import numpy as np

    from curobo_tpu.geom import types as gt
    from curobo_tpu.robot import kinematics as kin_mod

    server = viser.ViserServer(port=port)
    for o in scene.obstacles:
        pos = tuple(float(v) for v in o.pose[:3])
        if isinstance(o, gt.Cuboid):
            server.scene.add_box(f"/world/{o.name}", dimensions=tuple(o.dims), position=pos)
        elif isinstance(o, gt.SphereObstacle):
            server.scene.add_icosphere(f"/world/{o.name}", radius=o.radius, position=pos)
    if trajectory is not None:
        q = trajectory.position
        st = kin_mod.compute_kinematics(params, q[0] if q.ndim == 3 else q)
        sph = np.asarray(st.spheres)
        for s in range(sph.shape[-2]):
            if sph[0, s, 3] < 0:
                continue
            server.scene.add_icosphere(
                f"/robot/s{s}", radius=float(sph[0, s, 3]),
                position=tuple(sph[0, s, :3]),
            )
    return server
