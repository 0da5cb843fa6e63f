"""Dense-grid TSDF mapper + exact ESDF (depth -> planning world).

Parity: reference `Mapper` (`curobo/_src/perception/mapper/mapper.py:75`):
projective TSDF integration (`wp_integrate_camera_project.py:27` —
voxel-centric, zero atomics), ESDF computation (`integrator_esdf.py:299`
via JFA `wp_jfa.py` or exact PBA+ `pba3d_kernel.cuh`), voxel extraction
feeding `SceneCollision.update_voxel_data`.

TPU redesign (SURVEY §7 step 9 / hard-part 4): the block-sparse hash table
becomes a dense grid resident in HBM (a 256^3 fp32 grid is 64 MB — fine);
voxel-centric projective integration is a pure gather (maps 1:1 to the
reference's atomics-free design); the exact 3D EDT uses the separable
squared-distance min-plus transform (three axis passes, each a fully
vectorized (n x n) min-reduction) — exact like PBA+, simpler than JFA, and
batch-parallel over grid lines on the VPU.

LiDAR integration rasterizes world points into voxel hits with scatter-min
(occupancy carving along rays is camera-only for now).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from curobo_tpu.geom.types import VoxelGridObstacle
from curobo_tpu.perception.types import CameraObservation, LidarObservation


@dataclasses.dataclass(frozen=True)
class MapperConfig:
    # grid shape in voxels (static)
    dims: Tuple[int, int, int] = (128, 128, 128)
    voxel_size: float = 0.02
    # world position of voxel (0,0,0) center
    origin: Tuple[float, float, float] = (-1.28, -1.28, -0.5)
    truncation: float = 0.06  # TSDF truncation band (m)
    max_weight: float = 64.0
    occupancy_threshold: float = 0.0  # tsdf < this => occupied


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TSDFGrid:
    """Functional mapper state."""

    tsdf: jnp.ndarray  # (X, Y, Z) truncated signed distance
    weight: jnp.ndarray  # (X, Y, Z) integration weight


def _voxel_centers(cfg: MapperConfig) -> jnp.ndarray:
    xs = jnp.arange(cfg.dims[0]) * cfg.voxel_size + cfg.origin[0]
    ys = jnp.arange(cfg.dims[1]) * cfg.voxel_size + cfg.origin[1]
    zs = jnp.arange(cfg.dims[2]) * cfg.voxel_size + cfg.origin[2]
    X, Y, Z = jnp.meshgrid(xs, ys, zs, indexing="ij")
    return jnp.stack([X, Y, Z], axis=-1)  # (X, Y, Z, 3)


def integrate_camera(
    cfg: MapperConfig, grid: TSDFGrid, obs: CameraObservation
) -> TSDFGrid:
    """Voxel-centric projective TSDF update (one fused gather pass)."""
    H, W = obs.depth.shape
    centers = _voxel_centers(cfg).reshape(-1, 3)  # (V, 3)
    # world -> camera
    inv = obs.pose.inverse()
    pc = inv.transform_points(centers[None])[0]  # (V, 3)
    z = pc[:, 2]
    fx, fy = obs.intrinsics[0, 0], obs.intrinsics[1, 1]
    cx, cy = obs.intrinsics[0, 2], obs.intrinsics[1, 2]
    u = pc[:, 0] / jnp.maximum(z, 1e-6) * fx + cx
    v = pc[:, 1] / jnp.maximum(z, 1e-6) * fy + cy
    ui = jnp.clip(jnp.round(u).astype(jnp.int32), 0, W - 1)
    vi = jnp.clip(jnp.round(v).astype(jnp.int32), 0, H - 1)
    in_img = (u >= 0) & (u <= W - 1) & (v >= 0) & (v <= H - 1) & (z > 1e-3)
    d = obs.depth[vi, ui]  # (V,)
    valid = in_img & (d > 0)
    sdf = d - z
    tsdf_new = jnp.clip(sdf, -cfg.truncation, cfg.truncation)
    # integrate only within the truncation band behind the surface
    update = valid & (sdf > -cfg.truncation)
    w_new = jnp.where(update, 1.0, 0.0)

    tsdf_old = grid.tsdf.reshape(-1)
    w_old = grid.weight.reshape(-1)
    w_sum = w_old + w_new
    tsdf = jnp.where(
        w_sum > 0, (tsdf_old * w_old + tsdf_new * w_new) / jnp.maximum(w_sum, 1e-6),
        tsdf_old,
    )
    w = jnp.minimum(w_sum, cfg.max_weight)
    return TSDFGrid(tsdf.reshape(cfg.dims), w.reshape(cfg.dims))


def integrate_lidar(
    cfg: MapperConfig, grid: TSDFGrid, obs: LidarObservation
) -> TSDFGrid:
    """Scatter world points into the grid as surface hits (tsdf -> 0 band)."""
    pts = obs.world_points()  # (N, 3)
    org = jnp.asarray(cfg.origin)
    idx = jnp.round((pts - org) / cfg.voxel_size).astype(jnp.int32)
    dims = jnp.asarray(cfg.dims)
    valid = jnp.all((idx >= 0) & (idx < dims), axis=-1)
    idx = jnp.clip(idx, 0, dims - 1)
    flat = idx[:, 0] * cfg.dims[1] * cfg.dims[2] + idx[:, 1] * cfg.dims[2] + idx[:, 2]
    hits = jnp.zeros(int(np.prod(cfg.dims)), grid.tsdf.dtype).at[flat].add(
        jnp.where(valid, 1.0, 0.0)
    )
    hit = (hits > 0).reshape(cfg.dims)
    tsdf = jnp.where(hit, -cfg.voxel_size, grid.tsdf)
    w = jnp.where(hit, jnp.maximum(grid.weight, 1.0), grid.weight)
    return TSDFGrid(tsdf, w)


def _edt_1d_pass(dist2: jnp.ndarray, cell: float) -> jnp.ndarray:
    """Min-plus transform along the LAST axis.

    dist2 (..., n) squared distances -> exact 1-D lower envelope:
    out[i] = min_j dist2[j] + ((i-j)*cell)^2, vectorized as a (n, n)
    broadcastered min-reduction (O(n^2) flops, trivially parallel over
    leading axes — the TPU-native alternative to PBA's banded sweeps).
    """
    n = dist2.shape[-1]
    i = jnp.arange(n)
    offs = ((i[:, None] - i[None, :]) * cell) ** 2  # (n_out, n_src)
    return jnp.min(dist2[..., None, :] + offs, axis=-1)


def exact_edt(occupied: jnp.ndarray, cell: float, cap: float = 1.0e6) -> jnp.ndarray:
    """Exact Euclidean distance transform of a boolean grid -> distances (m)."""
    d2 = jnp.where(occupied, 0.0, cap)
    d2 = _edt_1d_pass(jnp.moveaxis(d2, 0, -1), cell)
    d2 = _edt_1d_pass(jnp.moveaxis(d2, 0, -1), cell)  # cycles axes
    d2 = _edt_1d_pass(jnp.moveaxis(d2, 0, -1), cell)
    return jnp.sqrt(jnp.maximum(d2, 0.0))


def compute_esdf(cfg: MapperConfig, grid: TSDFGrid) -> jnp.ndarray:
    """Signed ESDF grid (X, Y, Z): positive outside obstacles.

    Unobserved space (weight == 0) is treated as free (matching the
    reference's planning-side semantics where only observed surfaces repel).
    """
    occupied = (grid.weight > 0) & (grid.tsdf < cfg.occupancy_threshold)
    d_out = exact_edt(occupied, cfg.voxel_size)
    d_in = exact_edt(~occupied, cfg.voxel_size)
    return jnp.where(occupied, -d_in, d_out)


class Mapper:
    """Facade bundling config + functional state, mirroring the reference's
    `Mapper` public surface (integrate / compute_esdf / get_voxel_grid /
    save & load)."""

    def __init__(self, cfg: MapperConfig = MapperConfig()):
        self.cfg = cfg
        self.grid = TSDFGrid(
            tsdf=jnp.full(cfg.dims, cfg.truncation),
            weight=jnp.zeros(cfg.dims),
        )
        self._integrate_cam = jax.jit(lambda g, o: integrate_camera(self.cfg, g, o))
        self._integrate_lidar = jax.jit(lambda g, o: integrate_lidar(self.cfg, g, o))
        self._esdf = jax.jit(lambda g: compute_esdf(self.cfg, g))

    def reset(self):
        self.grid = TSDFGrid(
            tsdf=jnp.full(self.cfg.dims, self.cfg.truncation),
            weight=jnp.zeros(self.cfg.dims),
        )

    def integrate(self, obs) -> None:
        if isinstance(obs, CameraObservation):
            self.grid = self._integrate_cam(self.grid, obs)
        elif isinstance(obs, LidarObservation):
            self.grid = self._integrate_lidar(self.grid, obs)
        else:
            raise TypeError(f"unsupported observation type {type(obs)}")

    def compute_esdf(self) -> jnp.ndarray:
        return self._esdf(self.grid)

    def get_voxel_grid(self, name: str = "esdf") -> VoxelGridObstacle:
        """Package the ESDF as a planning-world obstacle.

        The grid's world placement: our origin is voxel (0,0,0)'s center;
        VoxelGridObstacle centers its grid on the obstacle pose.
        """
        cfg = self.cfg
        esdf = np.asarray(self.compute_esdf())
        dims_m = tuple(d * cfg.voxel_size for d in cfg.dims)
        center = tuple(
            cfg.origin[i] + (cfg.dims[i] - 1) * cfg.voxel_size / 2.0 for i in range(3)
        )
        return VoxelGridObstacle(
            name=name,
            pose=[*center, 1.0, 0.0, 0.0, 0.0],
            dims=dims_m,
            voxel_size=cfg.voxel_size,
            data=esdf,
        )

    # ---- checkpointing (parity: mapper.py:402-451 save/load_blocks) ----
    def save(self, path: str) -> None:
        np.savez_compressed(
            path,
            tsdf=np.asarray(self.grid.tsdf),
            weight=np.asarray(self.grid.weight),
            dims=np.asarray(self.cfg.dims),
            voxel_size=self.cfg.voxel_size,
            origin=np.asarray(self.cfg.origin),
        )

    def load(self, path: str) -> None:
        d = np.load(path)
        if tuple(d["dims"]) != self.cfg.dims:
            raise ValueError(
                f"checkpoint dims {tuple(d['dims'])} != mapper dims {self.cfg.dims}"
            )
        self.grid = TSDFGrid(jnp.asarray(d["tsdf"]), jnp.asarray(d["weight"]))
