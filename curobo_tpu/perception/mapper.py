"""Dense-grid TSDF mapper: depth/LiDAR -> TSDF (+RGB/features) -> ESDF ->
planning world, with raycast rendering and pose refinement.

Parity: reference `Mapper` (`curobo/_src/perception/mapper/mapper.py:75`):
- projective camera TSDF integration (`wp_integrate_camera_project.py:27` —
  voxel-centric, zero atomics) incl. RGB/feature accumulators with
  weight-cap rescale (`:27-40`, the "2 ms/frame dual-RGBD feature" path);
- voxel-centric LiDAR range-image integration with free-space carving
  (`wp_integrate_lidar_project.py`);
- ESDF via JFA (`esdf/kernel/wp_jfa.py:29`, 1+JFA+2 schedule) or the exact
  separable min-plus EDT (PBA+-class, `pba3d_kernel.cuh`);
- EMA decay (`kernel/builder` decay), obstacle stamping
  (`wp_stamp_obstacles.py`), raycast renderer (`renderer.py:61`) and
  render-based camera pose refinement (`pose_refiner.py`);
- checkpoint save/load with metadata validation (`checkpoint_blocks.py`).

TPU redesign (SURVEY §7 step 9 / hard-part 4): the block-sparse hash table
becomes a dense grid resident in HBM (a 256^3 fp32 grid is 64 MB — fine);
voxel-centric projective integration is a pure gather; JFA passes are
static-shift gathers over the whole grid (no scatter, no atomics), so every
step is a handful of fused elementwise ops on the VPU.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

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
    # appearance channels (reference fp16 RGB/feature accumulators)
    rgb_channels: bool = False
    feature_channels: int = 0
    # static voxel budget for per-frame appearance updates (None = V/8).
    # Appearance only carries information in the truncation band around the
    # observed surface — a thin sheet, ~dims^2 * (2*truncation/voxel_size)
    # voxels — so the update compacts band voxels to this many slots and
    # gathers/scatters ONLY those instead of streaming every channel
    # through all V voxels (the TPU gather is the integration bottleneck).
    appearance_budget: Optional[int] = None
    # ESDF algorithm: "exact" (separable min-plus, O(n^4) work),
    # "jfa" (jump flooding, O(n^3 log n)), or "auto" (exact for <=160^3)
    esdf_mode: str = "auto"
    # LiDAR range-image rasterization bins (voxel-centric carving path)
    lidar_bins: Tuple[int, int] = (512, 64)  # azimuth x elevation
    lidar_fov_elevation: Tuple[float, float] = (-0.45, 0.45)  # radians


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TSDFGrid:
    """Functional mapper state."""

    tsdf: jnp.ndarray  # (X, Y, Z) truncated signed distance
    weight: jnp.ndarray  # (X, Y, Z) integration weight
    rgb: Optional[jnp.ndarray] = None  # (X, Y, Z, 3) weighted-mean color
    feature: Optional[jnp.ndarray] = None  # (X, Y, Z, F)


def make_grid(cfg: MapperConfig) -> TSDFGrid:
    return TSDFGrid(
        tsdf=jnp.full(cfg.dims, cfg.truncation, jnp.float32),
        weight=jnp.zeros(cfg.dims, jnp.float32),
        rgb=jnp.zeros(cfg.dims + (3,), jnp.float32) if cfg.rgb_channels else None,
        feature=(
            jnp.zeros(cfg.dims + (cfg.feature_channels,), jnp.float32)
            if cfg.feature_channels > 0
            else None
        ),
    )


def _voxel_centers(cfg: MapperConfig) -> jnp.ndarray:
    xs = jnp.arange(cfg.dims[0]) * cfg.voxel_size + cfg.origin[0]
    ys = jnp.arange(cfg.dims[1]) * cfg.voxel_size + cfg.origin[1]
    zs = jnp.arange(cfg.dims[2]) * cfg.voxel_size + cfg.origin[2]
    X, Y, Z = jnp.meshgrid(xs, ys, zs, indexing="ij")
    return jnp.stack([X, Y, Z], axis=-1)  # (X, Y, Z, 3)


def _fuse(cfg, grid, tsdf_new, w_new, rgb_new=None, feat_new=None) -> TSDFGrid:
    """Weighted running-mean fuse of flat (V,) updates into the grid —
    shared by the camera and LiDAR projective integrators. Appearance
    channels use the same weights (reference weight-cap rescale)."""
    tsdf_old = grid.tsdf.reshape(-1)
    w_old = grid.weight.reshape(-1)
    w_sum = w_old + w_new
    denom = jnp.maximum(w_sum, 1e-6)
    tsdf = jnp.where(
        w_sum > 0, (tsdf_old * w_old + tsdf_new * w_new) / denom, tsdf_old
    )
    w = jnp.minimum(w_sum, cfg.max_weight)
    rgb = grid.rgb
    if rgb is not None and rgb_new is not None:
        old = rgb.reshape(-1, 3)
        rgb = jnp.where(
            (w_sum > 0)[:, None],
            (old * w_old[:, None] + rgb_new * w_new[:, None]) / denom[:, None],
            old,
        ).reshape(grid.rgb.shape)
    feat = grid.feature
    if feat is not None and feat_new is not None:
        F = feat.shape[-1]
        old = feat.reshape(-1, F)
        feat = jnp.where(
            (w_sum > 0)[:, None],
            (old * w_old[:, None] + feat_new * w_new[:, None]) / denom[:, None],
            old,
        ).reshape(grid.feature.shape)
    return TSDFGrid(
        tsdf.reshape(cfg.dims), w.reshape(cfg.dims), rgb=rgb, feature=feat
    )


def integrate_camera(
    cfg: MapperConfig, grid: TSDFGrid, obs: CameraObservation
) -> TSDFGrid:
    """Voxel-centric projective TSDF update (depth-only gather pass).

    Also fuses per-pixel RGB / feature channels into the grid accumulators
    when both the config and the observation carry them (reference
    `wp_integrate_camera_project.py:27-40`). The TSDF/carving pass gathers
    ONE channel (depth) per voxel; appearance — which only exists in the
    thin truncation band around the surface — is compacted to a static
    `appearance_budget` of voxel slots and gathered/scattered sparsely,
    instead of streaming every channel through all V voxels."""
    H, W = obs.depth.shape
    V = int(np.prod(cfg.dims))
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
    flat_px = vi * W + ui
    d = jnp.take(obs.depth.reshape(H * W), flat_px, axis=0)  # (V,)
    valid = in_img & (d > 0)
    sdf = d - z
    tsdf_new = jnp.clip(sdf, -cfg.truncation, cfg.truncation)
    # integrate only within the truncation band behind the surface
    update = valid & (sdf > -cfg.truncation)
    w_new = jnp.where(update, 1.0, 0.0)
    out = _fuse(cfg, grid, tsdf_new, w_new)

    want_rgb = grid.rgb is not None and obs.rgb is not None
    want_feat = grid.feature is not None and obs.feature is not None
    if not (want_rgb or want_feat):
        return out
    # appearance: fuse only the truncation band around the surface via a
    # static-size compaction (reference semantics — surface color/features;
    # free-space voxels carry no appearance)
    near = update & (jnp.abs(sdf) <= cfg.truncation)
    budget = cfg.appearance_budget or max(V // 8, 1)
    (vox,) = jnp.nonzero(near, size=budget, fill_value=V)  # V = drop slot
    safe = jnp.minimum(vox, V - 1)
    px = jnp.take(flat_px, safe)
    w_old = jnp.take(grid.weight.reshape(V), safe)
    den = (w_old + 1.0)[:, None]  # w_new == 1 in the band
    rgb, feat = out.rgb, out.feature
    if want_rgb:
        new = jnp.take(obs.rgb.reshape(H * W, 3), px, axis=0)
        old = jnp.take(grid.rgb.reshape(V, 3), safe, axis=0)
        fused = (old * w_old[:, None] + new) / den
        rgb = (
            grid.rgb.reshape(V, 3).at[vox].set(fused, mode="drop")
            .reshape(grid.rgb.shape)
        )
    if want_feat:
        F = grid.feature.shape[-1]
        new = jnp.take(obs.feature.reshape(H * W, F), px, axis=0)
        old = jnp.take(grid.feature.reshape(V, F), safe, axis=0)
        fused = (old * w_old[:, None] + new) / den
        feat = (
            grid.feature.reshape(V, F).at[vox].set(fused, mode="drop")
            .reshape(grid.feature.shape)
        )
    return TSDFGrid(out.tsdf, out.weight, rgb=rgb, feature=feat)


# ---------------------------------------------------------------------------
# LiDAR
# ---------------------------------------------------------------------------
def _lidar_range_image(
    cfg: MapperConfig, pts_sensor: jnp.ndarray
) -> jnp.ndarray:
    """Rasterize a sensor-frame point cloud into an (n_el, n_az) range image
    via scatter-min (invalid bins = +inf)."""
    n_az, n_el = cfg.lidar_bins
    r = jnp.linalg.norm(pts_sensor, axis=-1)
    az = jnp.arctan2(pts_sensor[:, 1], pts_sensor[:, 0])  # [-pi, pi]
    el = jnp.arcsin(pts_sensor[:, 2] / jnp.maximum(r, 1e-6))
    lo, hi = cfg.lidar_fov_elevation
    ai = jnp.clip(((az + jnp.pi) / (2 * jnp.pi) * n_az).astype(jnp.int32), 0, n_az - 1)
    ei = jnp.clip(((el - lo) / (hi - lo) * n_el).astype(jnp.int32), 0, n_el - 1)
    valid = (r > 1e-3) & jnp.isfinite(r) & (el >= lo) & (el <= hi)
    flat = ei * n_az + ai
    img = jnp.full(n_el * n_az, jnp.inf, jnp.float32)
    img = img.at[flat].min(jnp.where(valid, r, jnp.inf))
    return img.reshape(n_el, n_az)


def integrate_lidar(
    cfg: MapperConfig, grid: TSDFGrid, obs: LidarObservation
) -> TSDFGrid:
    """Voxel-centric projective LiDAR update with free-space carving.

    The scan is rasterized to a range image; every voxel looks up the
    measured range along its own bearing and fuses sdf = r_meas - r_voxel
    like the camera path — voxels in front of the return get carved free,
    voxels in the band get the surface (reference
    `wp_integrate_lidar_project.py`, zero atomics)."""
    pts_sensor = obs.points
    rng_img = _lidar_range_image(cfg, pts_sensor)
    n_az, n_el = cfg.lidar_bins
    lo, hi = cfg.lidar_fov_elevation

    centers = _voxel_centers(cfg).reshape(-1, 3)
    inv = obs.pose.inverse()
    pc = inv.transform_points(centers[None])[0]  # (V, 3) sensor frame
    r_vox = jnp.linalg.norm(pc, axis=-1)
    az = jnp.arctan2(pc[:, 1], pc[:, 0])
    el = jnp.arcsin(pc[:, 2] / jnp.maximum(r_vox, 1e-6))
    ai = jnp.clip(((az + jnp.pi) / (2 * jnp.pi) * n_az).astype(jnp.int32), 0, n_az - 1)
    ei = jnp.clip(((el - lo) / (hi - lo) * n_el).astype(jnp.int32), 0, n_el - 1)
    in_fov = (el >= lo) & (el <= hi) & (r_vox > 1e-3)
    r_meas = rng_img[ei, ai]
    sdf = r_meas - r_vox
    valid = in_fov & jnp.isfinite(r_meas)
    tsdf_new = jnp.clip(sdf, -cfg.truncation, cfg.truncation)
    update = valid & (sdf > -cfg.truncation)
    w_new = jnp.where(update, 1.0, 0.0)
    return _fuse(cfg, grid, tsdf_new, w_new)


def integrate_lidar_points(
    cfg: MapperConfig, grid: TSDFGrid, obs: LidarObservation
) -> TSDFGrid:
    """Legacy sparse path: scatter world points as surface hits only (no
    carving) — for clouds without a meaningful single viewpoint."""
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
    return TSDFGrid(tsdf, w, rgb=grid.rgb, feature=grid.feature)


# ---------------------------------------------------------------------------
# Decay / stamping
# ---------------------------------------------------------------------------
def decay(cfg: MapperConfig, grid: TSDFGrid, factor: float) -> TSDFGrid:
    """EMA weight decay: old observations fade so moving obstacles clear
    (reference mapper decay kernels). Voxels whose weight drops below 1e-3
    reset to unobserved."""
    w = grid.weight * factor
    dead = w < 1e-3
    return TSDFGrid(
        tsdf=jnp.where(dead, cfg.truncation, grid.tsdf),
        weight=jnp.where(dead, 0.0, w),
        rgb=grid.rgb,
        feature=grid.feature,
    )


def stamp_obstacles(cfg: MapperConfig, grid: TSDFGrid, world) -> TSDFGrid:
    """Stamp known world obstacles into the TSDF (reference
    `wp_stamp_obstacles.py:416`): voxels inside any obstacle become surface
    hits at full weight."""
    from curobo_tpu.geom import world as world_mod

    centers = _voxel_centers(cfg).reshape(-1, 3)
    sd = world_mod.sphere_sdf(world, centers).reshape(cfg.dims)
    inside = sd <= 0.0
    tsdf = jnp.where(inside, jnp.maximum(sd, -cfg.truncation), grid.tsdf)
    w = jnp.where(inside, cfg.max_weight, grid.weight)
    return TSDFGrid(tsdf, w, rgb=grid.rgb, feature=grid.feature)


# ---------------------------------------------------------------------------
# ESDF: exact separable min-plus EDT + JFA
# ---------------------------------------------------------------------------
def _edt_1d_pass(dist2: jnp.ndarray, cell: float) -> jnp.ndarray:
    """Min-plus transform along the LAST axis.

    dist2 (..., n) squared distances -> exact 1-D lower envelope:
    out[i] = min_j dist2[j] + ((i-j)*cell)^2, vectorized as a (n, n)
    broadcast min-reduction (O(n^2) flops, trivially parallel over
    leading axes)."""
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


def _shift_fill(a: jnp.ndarray, off: Tuple[int, int, int], fill) -> jnp.ndarray:
    """Shift a 3-D (or 3-D+channel) array by static offsets, filling
    vacated cells — a static-slice gather (the JFA neighbor fetch)."""
    out = a
    for ax, o in enumerate(off):
        if o == 0:
            continue
        pad = [(0, 0)] * out.ndim
        if o > 0:
            pad[ax] = (o, 0)
            sl = [slice(None)] * out.ndim
            sl[ax] = slice(0, out.shape[ax])
        else:
            pad[ax] = (0, -o)
            sl = [slice(None)] * out.ndim
            sl[ax] = slice(-o, out.shape[ax] - o)
        out = jnp.pad(out, pad, constant_values=fill)[tuple(sl)]
    return out


def jfa_edt(occupied: jnp.ndarray, cell: float) -> jnp.ndarray:
    """Jump-flooding EDT (reference `wp_jfa.py:29`, 1+JFA+2 schedule).

    Nearest-site coordinates propagate through log2(n) rounds of 26
    static-offset neighbor gathers — no scatter, no atomics; error after
    the +2 cleanup passes is <1 voxel in practice. O(n^3 log n) work vs
    exact_edt's O(n^4): the right choice for grids past ~160^3."""
    X, Y, Z = occupied.shape
    gx, gy, gz = jnp.meshgrid(
        jnp.arange(X, dtype=jnp.float32),
        jnp.arange(Y, dtype=jnp.float32),
        jnp.arange(Z, dtype=jnp.float32),
        indexing="ij",
    )
    BIG = jnp.float32(1e9)
    # site coordinate fields: own coords where occupied, else invalid
    sx = jnp.where(occupied, gx, BIG)
    sy = jnp.where(occupied, gy, BIG)
    sz = jnp.where(occupied, gz, BIG)

    def dist2(ax, ay, az):
        return (gx - ax) ** 2 + (gy - ay) ** 2 + (gz - az) ** 2

    offsets = [
        (dx, dy, dz)
        for dx in (-1, 0, 1)
        for dy in (-1, 0, 1)
        for dz in (-1, 0, 1)
        if (dx, dy, dz) != (0, 0, 0)
    ]

    def jfa_pass(state, k):
        sx, sy, sz, best = state
        for dx, dy, dz in offsets:
            off = (dx * k, dy * k, dz * k)
            cx = _shift_fill(sx, off, BIG)
            cy = _shift_fill(sy, off, BIG)
            cz = _shift_fill(sz, off, BIG)
            d2 = jnp.where(cx < BIG, dist2(cx, cy, cz), BIG)
            take = d2 < best
            sx = jnp.where(take, cx, sx)
            sy = jnp.where(take, cy, sy)
            sz = jnp.where(take, cz, sz)
            best = jnp.where(take, d2, best)
        return sx, sy, sz, best

    best = jnp.where(occupied, 0.0, BIG)
    state = (sx, sy, sz, best)
    n = max(X, Y, Z)
    schedule = [1]  # 1 + JFA + 2 (reference wp_jfa schedule)
    k = 1
    while k < n:
        k *= 2
    k //= 2
    while k >= 1:
        schedule.append(k)
        k //= 2
    schedule += [2, 1]
    for k in schedule:
        state = jfa_pass(state, k)
    best = state[3]
    return jnp.sqrt(jnp.minimum(best, BIG)) * cell


def compute_esdf(cfg: MapperConfig, grid: TSDFGrid) -> jnp.ndarray:
    """Signed ESDF grid (X, Y, Z): positive outside obstacles.

    Unobserved space (weight == 0) is treated as free (matching the
    reference's planning-side semantics where only observed surfaces repel).
    """
    occupied = (grid.weight > 0) & (grid.tsdf < cfg.occupancy_threshold)
    mode = cfg.esdf_mode
    if mode == "auto":
        mode = "exact" if max(cfg.dims) <= 160 else "jfa"
    edt = exact_edt if mode == "exact" else jfa_edt
    d_out = edt(occupied, cfg.voxel_size)
    d_in = edt(~occupied, cfg.voxel_size)
    return jnp.where(occupied, -d_in, d_out)


# ---------------------------------------------------------------------------
# Rendering + pose refinement
# ---------------------------------------------------------------------------
def _sample_trilinear(cfg: MapperConfig, vol: jnp.ndarray, pts: jnp.ndarray):
    """Trilinear sample of a (X, Y, Z) volume at world points (..., 3).
    Out-of-grid points clamp to the border. Returns (values, in_bounds)."""
    org = jnp.asarray(cfg.origin)
    g = (pts - org) / cfg.voxel_size  # fractional voxel coords
    dims = jnp.asarray(cfg.dims)
    inb = jnp.all((g >= 0) & (g <= dims - 1), axis=-1)
    g = jnp.clip(g, 0.0, dims - 1 - 1e-4)
    i0 = jnp.floor(g).astype(jnp.int32)
    f = g - i0
    i1 = jnp.minimum(i0 + 1, dims - 1)

    def at(ix, iy, iz):
        return vol[ix, iy, iz]

    x0, y0, z0 = i0[..., 0], i0[..., 1], i0[..., 2]
    x1, y1, z1 = i1[..., 0], i1[..., 1], i1[..., 2]
    fx, fy, fz = f[..., 0], f[..., 1], f[..., 2]
    c000, c100 = at(x0, y0, z0), at(x1, y0, z0)
    c010, c110 = at(x0, y1, z0), at(x1, y1, z0)
    c001, c101 = at(x0, y0, z1), at(x1, y0, z1)
    c011, c111 = at(x0, y1, z1), at(x1, y1, z1)
    c00 = c000 * (1 - fx) + c100 * fx
    c10 = c010 * (1 - fx) + c110 * fx
    c01 = c001 * (1 - fx) + c101 * fx
    c11 = c011 * (1 - fx) + c111 * fx
    c0 = c00 * (1 - fy) + c10 * fy
    c1 = c01 * (1 - fy) + c11 * fy
    return c0 * (1 - fz) + c1 * fz, inb


def render_depth(
    cfg: MapperConfig,
    grid: TSDFGrid,
    intrinsics: jnp.ndarray,
    pose,  # camera-to-world Pose
    shape: Tuple[int, int],
    n_steps: int = 192,
    t_near: float = 0.05,
    t_far: Optional[float] = None,
) -> jnp.ndarray:
    """Raymarch the TSDF to a depth image (H, W); 0 where no surface.

    Reference `BlockSparseTSDFRenderer` (`mapper/renderer.py:61`). Fixed
    static step count (marching + first-zero-crossing select is branch-free
    under jit); the hit is sub-voxel refined by linear interpolation of the
    straddling TSDF samples."""
    H, W = shape
    if t_far is None:
        t_far = float(max(cfg.dims) * cfg.voxel_size * 1.8)
    fx, fy = intrinsics[0, 0], intrinsics[1, 1]
    cx, cy = intrinsics[0, 2], intrinsics[1, 2]
    v, u = jnp.meshgrid(jnp.arange(H), jnp.arange(W), indexing="ij")
    dirs_cam = jnp.stack(
        [(u - cx) / fx, (v - cy) / fy, jnp.ones_like(u, jnp.float32)], axis=-1
    )  # (H, W, 3), z=1 so t == depth
    R = pose.rotation_matrix()  # (3, 3)
    dirs_w = jnp.einsum("ij,hwj->hwi", R, dirs_cam)
    org_w = pose.position  # (3,)

    ts = jnp.linspace(t_near, t_far, n_steps)  # (S,)
    pts = org_w + ts[:, None, None, None] * dirs_w[None]  # (S, H, W, 3)
    val, inb = _sample_trilinear(cfg, grid.tsdf, pts)
    wgt, _ = _sample_trilinear(cfg, grid.weight, pts)
    observed = inb & (wgt > 0)
    val = jnp.where(observed, val, cfg.truncation)
    # first index where tsdf goes <= 0 with the previous sample > 0
    prev = jnp.concatenate([val[:1], val[:-1]], axis=0)
    crossing = (val <= 0.0) & (prev > 0.0)
    any_hit = jnp.any(crossing, axis=0)
    first = jnp.argmax(crossing, axis=0)  # (H, W)
    s0 = jnp.maximum(first - 1, 0)
    v0 = jnp.take_along_axis(val, s0[None], axis=0)[0]
    v1 = jnp.take_along_axis(val, first[None], axis=0)[0]
    t0 = ts[s0]
    t1 = ts[first]
    a = v0 / jnp.maximum(v0 - v1, 1e-9)
    t_hit = t0 + a * (t1 - t0)
    return jnp.where(any_hit, t_hit, 0.0)


def refine_camera_pose(
    cfg: MapperConfig,
    grid: TSDFGrid,
    obs: CameraObservation,
    n_iters: int = 20,
    step: float = 0.5,
    max_points: int = 4096,
):
    """Refine the observation's camera pose against the map: minimize the
    squared TSDF at the back-projected depth points over an SE(3)
    perturbation (reference render-based `pose_refiner.py`; here the
    equivalent point-to-SDF Gauss-Newton on the same TSDF). Returns the
    corrected camera-to-world Pose."""
    from curobo_tpu.math import quaternion as qm
    from curobo_tpu.types.pose import Pose

    H, W = obs.depth.shape
    stride = max(1, int(np.ceil(np.sqrt(H * W / max_points))))
    depth = obs.depth[::stride, ::stride]
    h, w = depth.shape
    fx, fy = obs.intrinsics[0, 0], obs.intrinsics[1, 1]
    cx, cy = obs.intrinsics[0, 2], obs.intrinsics[1, 2]
    v, u = jnp.meshgrid(
        jnp.arange(h) * stride, jnp.arange(w) * stride, indexing="ij"
    )
    z = depth
    pts_cam = jnp.stack(
        [(u - cx) / fx * z, (v - cy) / fy * z, z], axis=-1
    ).reshape(-1, 3)
    valid = (z > 0).reshape(-1)

    p0, q0 = obs.pose.position, obs.pose.quaternion

    def _aa_quat(aa):
        # rotation-vector -> quaternion with a Taylor-safe sinc so the
        # gradient is finite at aa = 0 (norm() alone has a NaN grad there)
        t2 = jnp.sum(aa * aa)
        t = jnp.sqrt(t2 + 1e-18)
        s = jnp.where(t < 1e-4, 0.5 - t2 / 48.0, jnp.sin(t / 2.0) / t)
        return jnp.concatenate([jnp.cos(t / 2.0)[None], aa * s])

    def residuals(delta):
        dp, axis_angle = delta[:3], delta[3:]
        dq = _aa_quat(axis_angle)
        q = qm.quat_multiply(dq, q0)
        Rm = qm.quat_to_matrix(q)
        pts_w = jnp.einsum("ij,nj->ni", Rm, pts_cam) + (p0 + dp)
        val, inb = _sample_trilinear(cfg, grid.tsdf, pts_w)
        wgt, _ = _sample_trilinear(cfg, grid.weight, pts_w)
        m = valid & inb & (wgt > 0)
        # only residuals inside the truncation band carry geometry
        m = m & (jnp.abs(val) < cfg.truncation * 0.99)
        return jnp.where(m, val, 0.0)

    jac_fn = jax.jacfwd(residuals)

    def body(_, delta):
        # Gauss-Newton step on the point-to-SDF residuals (the reference's
        # LM pose refinement, pose_refiner.py)
        r = residuals(delta)
        J = jac_fn(delta)  # (N, 6)
        H = J.T @ J + 1e-6 * jnp.eye(6)
        g = J.T @ r
        return delta - step * jnp.linalg.solve(H, g)

    delta = jax.lax.fori_loop(0, n_iters, body, jnp.zeros(6))
    dq = _aa_quat(delta[3:])
    return Pose(p0 + delta[:3], qm.quat_multiply(dq, q0))


class Mapper:
    """Facade bundling config + functional state, mirroring the reference's
    `Mapper` public surface (integrate / compute_esdf / render /
    refine_pose / decay / stamp / get_voxel_grid / save & load).

    storage="sparse" backs the map with the block-sparse pool
    (`block_sparse.py` — the reference's default storage,
    `mapper/storage.py:493`): camera integration touches only the observed
    surface band per frame; dense reads (`self.grid`, ESDF, render) are
    rasterized from the pool over this config's dims/origin window on
    demand."""

    def __init__(self, cfg: MapperConfig = MapperConfig(), storage: str = "dense"):
        if storage not in ("dense", "sparse"):
            raise ValueError(f"storage must be 'dense' or 'sparse', got {storage!r}")
        self.cfg = cfg
        self.storage = storage
        self._sparse = None
        if storage == "sparse":
            from curobo_tpu.perception.block_sparse import (
                BlockSparseConfig,
                BlockSparseMapper,
                extract_dense,
            )

            self._sparse = BlockSparseMapper(
                BlockSparseConfig(
                    voxel_size=cfg.voxel_size,
                    truncation=cfg.truncation,
                    max_weight=cfg.max_weight,
                    occupancy_threshold=cfg.occupancy_threshold,
                    rgb_channels=cfg.rgb_channels,
                    feature_channels=cfg.feature_channels,
                )
            )
            self._extract = jax.jit(
                lambda g: extract_dense(self._sparse.cfg, g, cfg.dims, cfg.origin)
            )
        self._dense_grid = make_grid(cfg) if storage == "dense" else None
        self._integrate_cam = jax.jit(lambda g, o: integrate_camera(self.cfg, g, o))
        self._integrate_lidar = jax.jit(lambda g, o: integrate_lidar(self.cfg, g, o))
        self._integrate_lidar_pts = jax.jit(
            lambda g, o: integrate_lidar_points(self.cfg, g, o)
        )
        self._esdf = jax.jit(lambda g: compute_esdf(self.cfg, g))
        self._decay = jax.jit(
            lambda g, f: decay(self.cfg, g, f), static_argnums=()
        )

    @property
    def grid(self) -> TSDFGrid:
        """Dense view of the map (rasterized from the pool in sparse mode)."""
        if self.storage == "sparse":
            return self._extract(self._sparse.grid)
        return self._dense_grid

    @grid.setter
    def grid(self, value: TSDFGrid) -> None:
        if self.storage == "sparse":
            raise AttributeError(
                "sparse-backed Mapper: the dense grid is a rasterized view; "
                "mutate through integrate()/decay()/load()"
            )
        self._dense_grid = value

    def reset(self):
        if self.storage == "sparse":
            self._sparse.reset()
        else:
            self._dense_grid = make_grid(self.cfg)

    def integrate(self, obs, carve: bool = True) -> None:
        if self.storage == "sparse":
            if not isinstance(obs, CameraObservation):
                raise TypeError(
                    "sparse-backed Mapper integrates CameraObservation only; "
                    "use storage='dense' for LiDAR carving"
                )
            self._sparse.integrate(obs)
            return
        if isinstance(obs, CameraObservation):
            self.grid = self._integrate_cam(self.grid, obs)
        elif isinstance(obs, LidarObservation):
            fn = self._integrate_lidar if carve else self._integrate_lidar_pts
            self.grid = fn(self.grid, obs)
        else:
            raise TypeError(f"unsupported observation type {type(obs)}")

    def integrate_set(self, observations) -> None:
        """Integrate a multi-camera rig frame. Sparse storage fuses all
        cameras in ONE pool pass (`integrate_cameras_sparse`); dense
        storage integrates sequentially."""
        if self.storage == "sparse":
            self._sparse.integrate_set(observations)
            return
        for o in observations:
            self.integrate(o)

    def decay(self, factor: float = 0.95) -> None:
        if self.storage == "sparse":
            self._sparse.decay(factor)
        else:
            self.grid = self._decay(self.grid, factor)

    def stamp(self, world) -> None:
        if self.storage == "sparse":
            raise TypeError(
                "sparse-backed Mapper: obstacle stamping operates on the "
                "dense grid; use storage='dense'"
            )
        self.grid = stamp_obstacles(self.cfg, self.grid, world)

    def compute_esdf(self) -> jnp.ndarray:
        return self._esdf(self.grid)

    def render_depth(self, intrinsics, pose, shape, **kw) -> jnp.ndarray:
        return render_depth(self.cfg, self.grid, intrinsics, pose, shape, **kw)

    def refine_pose(self, obs: CameraObservation, **kw):
        return refine_camera_pose(self.cfg, self.grid, obs, **kw)

    def query_rgb(self, pts: jnp.ndarray) -> jnp.ndarray:
        """Trilinear RGB at world points (..., 3) (feature-TSDF query)."""
        if self.grid.rgb is None:
            raise ValueError("mapper built without rgb_channels")
        chans = [
            _sample_trilinear(self.cfg, self.grid.rgb[..., c], pts)[0]
            for c in range(3)
        ]
        return jnp.stack(chans, axis=-1)

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

    def stats(self) -> dict:
        """Storage statistics (sparse mode: pool occupancy + drop
        counters; dense: grid footprint)."""
        if self.storage == "sparse":
            return self._sparse.stats()
        g = self._dense_grid
        return {
            "dims": tuple(self.cfg.dims),
            "bytes": int(
                sum(
                    np.prod(a.shape) * a.dtype.itemsize
                    for a in (g.tsdf, g.weight)
                    + ((g.rgb,) if g.rgb is not None else ())
                    + ((g.feature,) if g.feature is not None else ())
                )
            ),
        }

    # ---- checkpointing (parity: mapper.py:402-451 + checkpoint_blocks.py
    # metadata validation) ----
    def save(self, path: str) -> None:
        if self.storage == "sparse":
            self._sparse.save(path)
            return
        extra = {}
        if self.grid.rgb is not None:
            extra["rgb"] = np.asarray(self.grid.rgb)
        if self.grid.feature is not None:
            extra["feature"] = np.asarray(self.grid.feature)
        np.savez_compressed(
            path,
            tsdf=np.asarray(self.grid.tsdf),
            weight=np.asarray(self.grid.weight),
            dims=np.asarray(self.cfg.dims),
            voxel_size=self.cfg.voxel_size,
            origin=np.asarray(self.cfg.origin),
            **extra,
        )

    def load(self, path: str) -> None:
        if self.storage == "sparse":
            self._sparse.load(path)
            return
        d = np.load(path)
        if tuple(d["dims"]) != self.cfg.dims:
            raise ValueError(
                f"checkpoint dims {tuple(d['dims'])} != mapper dims {self.cfg.dims}"
            )
        if abs(float(d["voxel_size"]) - self.cfg.voxel_size) > 1e-9:
            raise ValueError(
                f"checkpoint voxel_size {float(d['voxel_size'])} != "
                f"mapper voxel_size {self.cfg.voxel_size}"
            )
        if not np.allclose(np.asarray(d["origin"]), np.asarray(self.cfg.origin)):
            raise ValueError("checkpoint origin mismatch")
        self.grid = TSDFGrid(
            jnp.asarray(d["tsdf"]),
            jnp.asarray(d["weight"]),
            rgb=jnp.asarray(d["rgb"]) if "rgb" in d else None,
            feature=jnp.asarray(d["feature"]) if "feature" in d else None,
        )
