"""Block-sparse TSDF: fixed block-pool + spatial-hash table, all static
shapes.

Parity: reference `BlockSparseTSDF` (`perception/mapper/storage.py:493`) —
an open-address hash table of 8^3 voxel blocks allocated on demand, so
memory scales with OBSERVED SURFACE instead of workspace volume (the dense
`mapper.py` grid is O(extent^3)).

TPU redesign: CUDA's dynamic block allocation (atomic counters, device
hash inserts) is replaced by a functional static-capacity design that XLA
can compile once:

- a static POOL of `pool_blocks` blocks, each `block_size^3` voxels,
  resident as one (P, b, b, b) array — integration touches every pool
  slot every frame (masked), which is PERFECT for the VPU: static shapes,
  no gather/scatter of block payloads, dead slots cost only masked lanes;
- an open-address hash table (power-of-two slots, Knuth multiplicative
  probe) mapping encoded block coords -> pool index. Lookups are
  branch-free MAX_PROBE-step gathers vectorized over query points;
  inserts are a small `lax.fori_loop` over the (deduped, capped) set of
  NEW candidate blocks per frame — hundreds of scalar steps/frame, not a
  per-voxel cost;
- everything is a pytree (`BlockSparseTSDF`), so integrate/query/decay
  jit and differentiate like the dense grid.

Capacity behavior: when the pool fills, new blocks are dropped (counted in
`dropped_blocks`) — the reference's fixed `max_blocks` budget behaves the
same way (storage.py docstring memory budget :12-36).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from curobo_tpu.perception.types import CameraObservation

# block coords live in [-COORD_OFF, COORD_OFF); 10 bits per axis
_COORD_OFF = 512
_FREE = jnp.int32(-1)  # hash-slot "empty" sentinel (valid keys are >= 0)
_MAX_PROBE = 16


@dataclasses.dataclass(frozen=True)
class BlockSparseConfig:
    block_size: int = 8  # voxels per block side
    pool_blocks: int = 2048  # static block capacity
    table_size: int = 8192  # hash slots (power of two, >= 2*pool_blocks)
    voxel_size: float = 0.02
    truncation: float = 0.06
    max_weight: float = 64.0
    occupancy_threshold: float = 0.0
    # cap on blocks TOUCHED per integrate call: the frame-active set (blocks
    # in the observed truncation band this frame) is compacted to this many
    # static slots; only their payloads are gathered, updated, scattered.
    # Per-frame cost is O(active_blocks * block_size^3), independent of both
    # workspace volume AND pool capacity (the dense grid streams O(extent^3)
    # voxels; the round-3 sparse path streamed the whole pool).
    max_new_blocks_per_frame: int = 1024
    # active-set cap for the fused multi-camera path
    # (`integrate_cameras_sparse`); 0 = use max_new_blocks_per_frame
    max_active_blocks: int = 0
    # depth-image subsample stride for block discovery
    discovery_stride: int = 4
    # appearance accumulators (reference fp16 RGB/feature channels,
    # `wp_integrate_camera_project.py:27-40`) — stored per pool block
    rgb_channels: bool = False
    feature_channels: int = 0

    def __post_init__(self):
        if self.table_size & (self.table_size - 1):
            raise ValueError("table_size must be a power of two")
        if self.table_size < 2 * self.pool_blocks:
            raise ValueError("table_size must be >= 2 * pool_blocks")

    @property
    def block_extent(self) -> float:
        return self.block_size * self.voxel_size


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BlockSparseTSDF:
    """Functional block-sparse mapper state."""

    table_key: jnp.ndarray  # (T,) int32 encoded block coord or _FREE
    table_slot: jnp.ndarray  # (T,) int32 pool index
    pool_coords: jnp.ndarray  # (P, 3) int32 block coords of each pool slot
    n_alloc: jnp.ndarray  # () int32 allocated blocks
    dropped_blocks: jnp.ndarray  # () int32 candidates dropped at capacity
    # () int32 frame-active blocks beyond max_active_blocks (fused path):
    # those blocks received no TSDF update that frame — nonzero means the
    # cap is too small for the rig/scene (raise max_active_blocks)
    dropped_active: jnp.ndarray
    tsdf: jnp.ndarray  # (P, b, b, b) f32
    weight: jnp.ndarray  # (P, b, b, b) f32
    rgb: Optional[jnp.ndarray] = None  # (P, b, b, b, 3) f32 weighted mean
    feature: Optional[jnp.ndarray] = None  # (P, b, b, b, F) f32

    @property
    def nbytes(self) -> int:
        return sum(
            np.prod(a.shape) * a.dtype.itemsize
            for a in (
                self.table_key,
                self.table_slot,
                self.pool_coords,
                self.tsdf,
                self.weight,
            )
            + ((self.rgb,) if self.rgb is not None else ())
            + ((self.feature,) if self.feature is not None else ())
        )


def make_sparse_grid(cfg: BlockSparseConfig) -> BlockSparseTSDF:
    b, P, T = cfg.block_size, cfg.pool_blocks, cfg.table_size
    return BlockSparseTSDF(
        table_key=jnp.full((T,), _FREE, jnp.int32),
        table_slot=jnp.full((T,), -1, jnp.int32),
        pool_coords=jnp.zeros((P, 3), jnp.int32),
        n_alloc=jnp.int32(0),
        dropped_blocks=jnp.int32(0),
        dropped_active=jnp.int32(0),
        tsdf=jnp.full((P, b, b, b), cfg.truncation, jnp.float32),
        weight=jnp.zeros((P, b, b, b), jnp.float32),
        rgb=(
            jnp.zeros((P, b, b, b, 3), jnp.float32) if cfg.rgb_channels else None
        ),
        feature=(
            jnp.zeros((P, b, b, b, cfg.feature_channels), jnp.float32)
            if cfg.feature_channels > 0
            else None
        ),
    )


# ---------------------------------------------------------------------------
# hash table
# ---------------------------------------------------------------------------
def _encode(bc: jnp.ndarray) -> jnp.ndarray:
    """Block coords (..., 3) int32 -> encoded key (...,). Out-of-range
    coords map to _FREE (never matched, never inserted)."""
    inb = jnp.all((bc >= -_COORD_OFF) & (bc < _COORD_OFF), axis=-1)
    x, y, z = bc[..., 0] + _COORD_OFF, bc[..., 1] + _COORD_OFF, bc[..., 2] + _COORD_OFF
    key = (x << 20) | (y << 10) | z
    return jnp.where(inb, key, _FREE)


def _decode(key: jnp.ndarray) -> jnp.ndarray:
    """Encoded key (...,) -> block coords (..., 3)."""
    return (
        jnp.stack(
            [(key >> 20) & 1023, (key >> 10) & 1023, key & 1023], axis=-1
        )
        - _COORD_OFF
    )


def _hash(keys: jnp.ndarray, table_size: int) -> jnp.ndarray:
    """Fibonacci hash -> [0, table_size). Takes the HIGH bits of key*K
    (the low bits of the product depend only on the key's low bits, which
    neighboring blocks share — that degenerates to ~1 bucket per plane)."""
    tbits = table_size.bit_length() - 1
    u = keys.astype(jnp.uint32)
    u = (u ^ (u >> 16)) * jnp.uint32(2654435761)
    return (u >> (32 - tbits)).astype(jnp.int32)


def _lookup(cfg: BlockSparseConfig, grid: BlockSparseTSDF, keys: jnp.ndarray):
    """Vectorized probe: keys (...,) -> pool slot (...,) or -1."""
    mask = cfg.table_size - 1
    h0 = _hash(keys, cfg.table_size)
    slot = jnp.full(keys.shape, -1, jnp.int32)
    for i in range(_MAX_PROBE):
        idx = (h0 + i) & mask
        k = grid.table_key[idx]
        hit = (k == keys) & (keys != _FREE) & (slot < 0)
        slot = jnp.where(hit, grid.table_slot[idx], slot)
    return slot


def allocate_blocks(
    cfg: BlockSparseConfig, grid: BlockSparseTSDF, block_coords: jnp.ndarray
) -> BlockSparseTSDF:
    """Insert candidate block coords (N, 3) (dupes fine) into the table.

    N must be static; the insert loop is sequential over the deduped set
    (the CUDA atomic-insert analog — order-independent because duplicate
    keys converge to one slot)."""
    keys = _encode(block_coords.astype(jnp.int32))
    uniq = jnp.unique(keys, size=keys.shape[0], fill_value=_FREE)
    mask = cfg.table_size - 1
    P = cfg.pool_blocks

    def insert(i, st):
        tk, ts, pc, n, dropped = st
        key = uniq[i]
        h0 = _hash(key, cfg.table_size)
        # find first matching slot and first free slot along the probe seq
        first_match = jnp.int32(cfg.table_size)  # sentinel: none
        first_free = jnp.int32(cfg.table_size)
        for p in range(_MAX_PROBE):
            idx = (h0 + p) & mask
            k = tk[idx]
            first_match = jnp.where(
                (k == key) & (first_match == cfg.table_size), idx, first_match
            )
            # a match BEFORE a free slot must win; only record free slots
            # while no match has been seen
            first_free = jnp.where(
                (k == _FREE) & (first_free == cfg.table_size), idx, first_free
            )
        have_match = first_match < cfg.table_size
        have_free = first_free < cfg.table_size
        can_alloc = (~have_match) & have_free & (n < P) & (key != _FREE)
        write_idx = jnp.where(can_alloc, first_free, 0)
        tk = tk.at[write_idx].set(jnp.where(can_alloc, key, tk[write_idx]))
        ts = ts.at[write_idx].set(jnp.where(can_alloc, n, ts[write_idx]))
        pc = pc.at[jnp.where(can_alloc, n, 0)].set(
            jnp.where(can_alloc, _decode(key), pc[jnp.where(can_alloc, n, 0)])
        )
        n = n + jnp.where(can_alloc, 1, 0).astype(jnp.int32)
        dropped = dropped + jnp.where(
            (~have_match) & (~can_alloc) & (key != _FREE), 1, 0
        ).astype(jnp.int32)
        return tk, ts, pc, n, dropped

    tk, ts, pc, n, dropped = jax.lax.fori_loop(
        0,
        uniq.shape[0],
        insert,
        (
            grid.table_key,
            grid.table_slot,
            grid.pool_coords,
            grid.n_alloc,
            grid.dropped_blocks,
        ),
    )
    return dataclasses.replace(
        grid,
        table_key=tk,
        table_slot=ts,
        pool_coords=pc,
        n_alloc=n,
        dropped_blocks=dropped,
    )


# ---------------------------------------------------------------------------
# integration
# ---------------------------------------------------------------------------
def _discover_blocks(cfg: BlockSparseConfig, obs: CameraObservation) -> jnp.ndarray:
    """Candidate block coords (M, 3) from a depth frame: back-project a
    pixel subsample and take the blocks at the surface and +- truncation
    along each ray (the observed TSDF band; free space in front stays
    unallocated, like the reference's surface-band allocation)."""
    H, W = obs.depth.shape
    s = cfg.discovery_stride
    depth = obs.depth[::s, ::s]
    h, w = depth.shape
    fx, fy = obs.intrinsics[0, 0], obs.intrinsics[1, 1]
    cx, cy = obs.intrinsics[0, 2], obs.intrinsics[1, 2]
    v, u = jnp.meshgrid(jnp.arange(h) * s, jnp.arange(w) * s, indexing="ij")
    z = depth.reshape(-1)
    ray = jnp.stack(
        [
            (u.reshape(-1) - cx) / fx,
            (v.reshape(-1) - cy) / fy,
            jnp.ones_like(z),
        ],
        axis=-1,
    )  # z=1 rays in camera frame
    valid = z > 0
    pts = []
    for dz in (-cfg.truncation, 0.0, cfg.truncation):
        pts.append(ray * jnp.where(valid, z + dz, -1e6)[:, None])
    pc = jnp.concatenate(pts, axis=0)  # (3*N, 3) camera frame
    pw = obs.pose.transform_points(pc[None])[0]
    # Lateral straddle is covered by neighboring pixels (the stride is
    # finer than a block at working distances); depth straddle by the
    # +-truncation samples — no neighborhood expansion needed.
    return jnp.floor(pw / cfg.block_extent).astype(jnp.int32)


def integrate_camera_sparse(
    cfg: BlockSparseConfig, grid: BlockSparseTSDF, obs: CameraObservation
) -> BlockSparseTSDF:
    """Allocate blocks in the observed band, then run the voxel-centric
    projective update (dense `mapper.integrate_camera` semantics incl.
    RGB/feature fusion) over ONLY the frame-active block set.

    TPU shape: the active set is a static `max_new_blocks_per_frame`-slot
    compaction; payloads are gathered from the pool, updated as one
    (A*b^3)-lane vector op, and scattered back (drop-mode for dead slots).
    Per-frame traffic is O(active surface), not O(pool) / O(extent^3) —
    the redesign of the reference's per-block CUDA launch
    (`wp_integrate_camera_project.py:27-40`)."""
    # ---- discovery + allocation ----
    cand = _discover_blocks(cfg, obs)
    keys = _encode(cand)
    uniq = jnp.unique(keys, size=cfg.max_new_blocks_per_frame, fill_value=_FREE)
    # steady-state frames re-observe allocated blocks: skip the sequential
    # insert loop entirely unless the frame actually saw a NEW block
    # (lax.cond executes one branch on TPU)
    pre = _lookup(cfg, grid, uniq)
    has_new = jnp.any((pre < 0) & (uniq != _FREE))
    tk, ts, pc, n, dr = jax.lax.cond(
        has_new,
        lambda g: (
            lambda g2: (
                g2.table_key,
                g2.table_slot,
                g2.pool_coords,
                g2.n_alloc,
                g2.dropped_blocks,
            )
        )(allocate_blocks(cfg, g, _decode(uniq))),
        lambda g: (g.table_key, g.table_slot, g.pool_coords, g.n_alloc, g.dropped_blocks),
        grid,
    )
    grid = dataclasses.replace(
        grid, table_key=tk, table_slot=ts, pool_coords=pc, n_alloc=n,
        dropped_blocks=dr,
    )

    # ---- frame-active set: the band blocks, now resolved to pool slots ----
    b = cfg.block_size
    P = cfg.pool_blocks
    A = cfg.max_new_blocks_per_frame
    H, W = obs.depth.shape
    slots = _lookup(cfg, grid, uniq)  # (A,) pool index or -1
    valid = (uniq != _FREE) & (slots >= 0)
    slot_g = jnp.where(valid, slots, 0)  # safe gather index
    slot_s = jnp.where(valid, slots, P)  # OOB -> dropped on scatter

    coords = grid.pool_coords[slot_g]  # (A, 3)
    offs = (jnp.arange(b) + 0.5) * cfg.voxel_size
    ox, oy, oz = jnp.meshgrid(offs, offs, offs, indexing="ij")
    local = jnp.stack([ox, oy, oz], axis=-1)  # (b, b, b, 3)
    centers = (
        coords.astype(jnp.float32)[:, None, None, None, :] * cfg.block_extent
        + local[None]
    )  # (A, b, b, b, 3)
    flat = centers.reshape(-1, 3)  # (A*b^3, 3)

    inv = obs.pose.inverse()
    pc = inv.transform_points(flat[None])[0]
    z = pc[:, 2]
    fx, fy = obs.intrinsics[0, 0], obs.intrinsics[1, 1]
    cx, cy = obs.intrinsics[0, 2], obs.intrinsics[1, 2]
    u = pc[:, 0] / jnp.maximum(z, 1e-6) * fx + cx
    v = pc[:, 1] / jnp.maximum(z, 1e-6) * fy + cy
    ui = jnp.clip(jnp.round(u).astype(jnp.int32), 0, W - 1)
    vi = jnp.clip(jnp.round(v).astype(jnp.int32), 0, H - 1)
    in_img = (u >= 0) & (u <= W - 1) & (v >= 0) & (v <= H - 1) & (z > 1e-3)
    flat_px = vi * W + ui

    want_rgb = grid.rgb is not None and obs.rgb is not None
    want_feat = grid.feature is not None and obs.feature is not None
    # ONE combined pixel gather for depth + rgb + features: TPU gather cost
    # is per-INDEX (~7.5 ns/idx measured), not per-byte — three separate
    # (A*b^3)-index gathers cost 3x one 12-wide gather (measured 29.4 ->
    # 15.2 ms/frame at the bench config, bit-exact)
    cols = [obs.depth.reshape(H * W, 1)]
    if want_rgb:
        cols.append(obs.rgb.reshape(H * W, 3))
    if want_feat:
        cols.append(obs.feature.reshape(H * W, -1))
    table = cols[0] if len(cols) == 1 else jnp.concatenate(cols, axis=-1)
    gath = jnp.take(table, flat_px, axis=0)  # (A*b^3, 1[+3][+F])
    d = gath[:, 0]
    sdf = d - z
    live = jnp.broadcast_to(valid[:, None, None, None], (A, b, b, b)).reshape(-1)
    update = live & in_img & (d > 0) & (sdf > -cfg.truncation)
    tsdf_new = jnp.clip(sdf, -cfg.truncation, cfg.truncation)
    w_new = jnp.where(update, 1.0, 0.0)

    t_old = grid.tsdf[slot_g].reshape(-1)  # (A*b^3,)
    w_old = grid.weight[slot_g].reshape(-1)
    w_sum = w_old + w_new
    denom = jnp.maximum(w_sum, 1e-6)
    t_new = jnp.where(w_sum > 0, (t_old * w_old + tsdf_new * w_new) / denom, t_old)
    w_cap = jnp.minimum(w_sum, cfg.max_weight)

    blk = (A, b, b, b)
    out = dataclasses.replace(
        grid,
        tsdf=grid.tsdf.at[slot_s].set(t_new.reshape(blk), mode="drop"),
        weight=grid.weight.at[slot_s].set(w_cap.reshape(blk), mode="drop"),
    )

    if not (want_rgb or want_feat):
        return out
    # appearance fuses only inside the truncation band around the surface
    # (dense-path semantics; free-space voxels carry no appearance); one
    # fused update over the concatenated (3+F)-wide appearance row
    band = (update & (jnp.abs(sdf) <= cfg.truncation))[:, None]
    olds = []
    if want_rgb:
        olds.append(grid.rgb[slot_g].reshape(-1, 3))
    if want_feat:
        F = grid.feature.shape[-1]
        olds.append(grid.feature[slot_g].reshape(-1, F))
    old_app = olds[0] if len(olds) == 1 else jnp.concatenate(olds, axis=-1)
    new_app = gath[:, 1:]
    fused = jnp.where(
        band,
        (old_app * w_old[:, None] + new_app * w_new[:, None]) / denom[:, None],
        old_app,
    )
    rgb = out.rgb
    feat = out.feature
    c0 = 0
    if want_rgb:
        rgb = grid.rgb.at[slot_s].set(
            fused[:, :3].reshape(blk + (3,)), mode="drop"
        )
        c0 = 3
    if want_feat:
        F = grid.feature.shape[-1]
        feat = grid.feature.at[slot_s].set(
            fused[:, c0:c0 + F].reshape(blk + (F,)), mode="drop"
        )
    return dataclasses.replace(out, rgb=rgb, feature=feat)


def integrate_cameras_sparse(
    cfg: BlockSparseConfig, grid: BlockSparseTSDF, observations
) -> BlockSparseTSDF:
    """Fused multi-camera integrate: ONE active-set compaction, ONE payload
    gather/scatter, sequential per-camera fusion math in registers.

    Matches `integrate_camera_sparse(obs_n) o ... o integrate_camera_sparse
    (obs_1)` semantics (dense-path fusion order, per-camera appearance
    flags), but the pool payload traffic and the active-set machinery are
    paid once per frame SET instead of once per camera — the TPU redesign
    of the reference's per-camera kernel launches
    (`wp_integrate_camera_project.py:27-40`, 2 ms/frame dual-RGBD claim
    `docs/index.rst:19`).

    Budgets: the rig-union dedup buffer is n_cameras *
    max_new_blocks_per_frame (same headroom as the sequential path);
    overflow adds to `dropped_blocks`. Actives beyond `max_active_blocks`
    skip that frame's update and add to `dropped_active` — both counters
    zero <=> exact sequential equivalence."""
    # ---- discovery + allocation over all cameras ----
    cand = jnp.concatenate(
        [_discover_blocks(cfg, o) for o in observations], axis=0
    )
    keys = _encode(cand)
    # per-rig dedup budget: n_cameras * the per-camera budget, so the fused
    # path never gives the rig LESS allocation headroom than running
    # integrate_camera_sparse per camera would (ADVICE r4 #2). Overflow past
    # the buffer is counted, not silent: those blocks never reach
    # allocation this frame.
    U = len(observations) * cfg.max_new_blocks_per_frame
    uniq = jnp.unique(keys, size=U, fill_value=_FREE)
    ks = jnp.sort(keys)
    n_uniq_true = jnp.sum(
        jnp.concatenate([jnp.ones((1,), bool), ks[1:] != ks[:-1]])
    ).astype(jnp.int32)
    dedup_overflow = jnp.maximum(n_uniq_true - U, 0)
    pre = _lookup(cfg, grid, uniq)
    has_new = jnp.any((pre < 0) & (uniq != _FREE))
    tk, ts, pc_, n, dr = jax.lax.cond(
        has_new,
        lambda g: (
            lambda g2: (
                g2.table_key,
                g2.table_slot,
                g2.pool_coords,
                g2.n_alloc,
                g2.dropped_blocks,
            )
        )(allocate_blocks(cfg, g, _decode(uniq))),
        lambda g: (
            g.table_key, g.table_slot, g.pool_coords, g.n_alloc,
            g.dropped_blocks,
        ),
        grid,
    )
    grid = dataclasses.replace(
        grid, table_key=tk, table_slot=ts, pool_coords=pc_, n_alloc=n,
        dropped_blocks=dr + dedup_overflow,
    )

    # ---- frame-active pool slots: the deduped union of both cameras'
    # discovered band blocks, resolved to pool slots and compacted via a
    # mask scatter + nonzero (no second sort) ----
    b = cfg.block_size
    P = cfg.pool_blocks
    A = cfg.max_active_blocks or U
    uslot = _lookup(cfg, grid, uniq)  # post-allocation
    mask = (
        jnp.zeros((P + 1,), bool)
        .at[jnp.where(uslot >= 0, uslot, P)]
        .set(True)[:P]
    )
    # actives beyond the static cap get no update this frame — count them
    # (ADVICE r4 #1) so an undersized max_active_blocks is visible
    n_active = jnp.sum(mask).astype(jnp.int32)
    grid = dataclasses.replace(
        grid,
        dropped_active=grid.dropped_active + jnp.maximum(n_active - A, 0),
    )
    (slots,) = jnp.nonzero(mask, size=A, fill_value=P)
    valid = slots < P
    slot_g = jnp.where(valid, slots, 0)
    slot_s = slots  # already P for dead slots -> scatter drop

    coords = grid.pool_coords[slot_g]
    offs = (jnp.arange(b) + 0.5) * cfg.voxel_size
    ox, oy, oz = jnp.meshgrid(offs, offs, offs, indexing="ij")
    local = jnp.stack([ox, oy, oz], axis=-1)
    centers = (
        coords.astype(jnp.float32)[:, None, None, None, :] * cfg.block_extent
        + local[None]
    )
    flat = centers.reshape(-1, 3)  # (A*b^3, 3)
    live = jnp.broadcast_to(valid[:, None, None, None], (A, b, b, b)).reshape(-1)

    # ---- gather payloads once ----
    t_cur = grid.tsdf[slot_g].reshape(-1)
    w_cur = grid.weight[slot_g].reshape(-1)
    # per-camera semantics (sequential-path parity): a camera missing
    # rgb/feature skips ONLY its own appearance fuse, not the whole rig's
    want_rgb = grid.rgb is not None and any(
        o.rgb is not None for o in observations
    )
    want_feat = grid.feature is not None and any(
        o.feature is not None for o in observations
    )
    rgb_cur = grid.rgb[slot_g].reshape(-1, 3) if want_rgb else None
    F = grid.feature.shape[-1] if grid.feature is not None else 0
    feat_cur = grid.feature[slot_g].reshape(-1, F) if want_feat else None

    # ---- sequential per-camera fusion in registers ----
    # ONE combined pixel gather per camera (depth + rgb + features): TPU
    # gather cost is per-INDEX, not per-byte — a 12-wide gather costs the
    # same as a 1-wide one (measured 2x frame-time win, bit-exact)
    for obs in observations:
        H, W = obs.depth.shape
        pc2 = obs.pose.inverse().transform_points(flat[None])[0]
        z = pc2[:, 2]
        fx, fy = obs.intrinsics[0, 0], obs.intrinsics[1, 1]
        cx, cy = obs.intrinsics[0, 2], obs.intrinsics[1, 2]
        u = pc2[:, 0] / jnp.maximum(z, 1e-6) * fx + cx
        v = pc2[:, 1] / jnp.maximum(z, 1e-6) * fy + cy
        ui = jnp.clip(jnp.round(u).astype(jnp.int32), 0, W - 1)
        vi = jnp.clip(jnp.round(v).astype(jnp.int32), 0, H - 1)
        in_img = (u >= 0) & (u <= W - 1) & (v >= 0) & (v <= H - 1) & (z > 1e-3)
        flat_px = vi * W + ui
        o_rgb = want_rgb and obs.rgb is not None
        o_feat = want_feat and obs.feature is not None
        cols = [obs.depth.reshape(H * W, 1)]
        if o_rgb:
            cols.append(obs.rgb.reshape(H * W, 3))
        if o_feat:
            cols.append(obs.feature.reshape(H * W, F))
        tbl = cols[0] if len(cols) == 1 else jnp.concatenate(cols, axis=-1)
        gath = jnp.take(tbl, flat_px, axis=0)
        d = gath[:, 0]
        sdf = d - z
        update = live & in_img & (d > 0) & (sdf > -cfg.truncation)
        tsdf_new = jnp.clip(sdf, -cfg.truncation, cfg.truncation)
        w_new = jnp.where(update, 1.0, 0.0)
        w_sum = w_cur + w_new
        denom = jnp.maximum(w_sum, 1e-6)
        t_cur = jnp.where(
            w_sum > 0, (t_cur * w_cur + tsdf_new * w_new) / denom, t_cur
        )
        if o_rgb or o_feat:
            band = (update & (jnp.abs(sdf) <= cfg.truncation))[:, None]
            new_rgb = gath[:, 1:4] if o_rgb else None
            new_feat = gath[:, (4 if o_rgb else 1):] if o_feat else None
            if o_rgb:
                rgb_cur = jnp.where(
                    band,
                    (rgb_cur * w_cur[:, None] + new_rgb * w_new[:, None])
                    / denom[:, None],
                    rgb_cur,
                )
            if o_feat:
                feat_cur = jnp.where(
                    band,
                    (feat_cur * w_cur[:, None] + new_feat * w_new[:, None])
                    / denom[:, None],
                    feat_cur,
                )
        w_cur = jnp.minimum(w_sum, cfg.max_weight)

    # ---- scatter payloads once ----
    blk = (A, b, b, b)
    out = dataclasses.replace(
        grid,
        tsdf=grid.tsdf.at[slot_s].set(t_cur.reshape(blk), mode="drop"),
        weight=grid.weight.at[slot_s].set(w_cur.reshape(blk), mode="drop"),
    )
    if want_rgb:
        out = dataclasses.replace(
            out, rgb=grid.rgb.at[slot_s].set(rgb_cur.reshape(blk + (3,)), mode="drop")
        )
    if want_feat:
        out = dataclasses.replace(
            out,
            feature=grid.feature.at[slot_s].set(
                feat_cur.reshape(blk + (F,)), mode="drop"
            ),
        )
    return out


# ---------------------------------------------------------------------------
# queries / export
# ---------------------------------------------------------------------------
def sample_sdf_sparse(
    cfg: BlockSparseConfig, grid: BlockSparseTSDF, pts: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Trilinear TSDF at world points (..., 3) -> (values, observed).

    Each of the 8 interpolation corners does its own hash lookup, so
    queries cross block boundaries transparently. Unobserved corners
    contribute +truncation (free-space prior) and clear `observed`."""
    g = pts / cfg.voxel_size - 0.5  # voxel centers at (i + .5) * vs
    i0 = jnp.floor(g).astype(jnp.int32)
    f = g - i0

    vals = []
    obs_all = None
    b = cfg.block_size
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                vi = i0 + jnp.asarray([dx, dy, dz], jnp.int32)
                bc = jnp.floor_divide(vi, b)
                li = vi - bc * b  # intra-block voxel index
                slot = _lookup(cfg, grid, _encode(bc))
                ok = slot >= 0
                s = jnp.where(ok, slot, 0)
                val = grid.tsdf[s, li[..., 0], li[..., 1], li[..., 2]]
                wgt = grid.weight[s, li[..., 0], li[..., 1], li[..., 2]]
                seen = ok & (wgt > 0)
                val = jnp.where(seen, val, cfg.truncation)
                wx = jnp.where(dx == 1, f[..., 0], 1 - f[..., 0])
                wy = jnp.where(dy == 1, f[..., 1], 1 - f[..., 1])
                wz = jnp.where(dz == 1, f[..., 2], 1 - f[..., 2])
                vals.append(val * wx * wy * wz)
                obs_all = seen if obs_all is None else (obs_all & seen)
    return sum(vals), obs_all


def extract_dense(
    cfg: BlockSparseConfig,
    grid: BlockSparseTSDF,
    dims: Tuple[int, int, int],
    origin: Tuple[float, float, float],
):
    """Rasterize a region to a dense `mapper.TSDFGrid` (voxel (0,0,0)
    center at `origin`, dense-mapper convention) for ESDF / mesh
    extraction via the dense pipeline."""
    from curobo_tpu.perception.mapper import TSDFGrid

    xs = jnp.arange(dims[0]) * cfg.voxel_size + origin[0]
    ys = jnp.arange(dims[1]) * cfg.voxel_size + origin[1]
    zs = jnp.arange(dims[2]) * cfg.voxel_size + origin[2]
    X, Y, Z = jnp.meshgrid(xs, ys, zs, indexing="ij")
    pts = jnp.stack([X, Y, Z], axis=-1)
    # exact voxel-center fetch (no interpolation): nearest voxel
    vi = jnp.round(pts / cfg.voxel_size - 0.5).astype(jnp.int32)
    b = cfg.block_size
    bc = jnp.floor_divide(vi, b)
    li = vi - bc * b
    slot = _lookup(cfg, grid, _encode(bc))
    ok = slot >= 0
    s = jnp.where(ok, slot, 0)
    val = grid.tsdf[s, li[..., 0], li[..., 1], li[..., 2]]
    wgt = grid.weight[s, li[..., 0], li[..., 1], li[..., 2]]
    rgb = feat = None
    if grid.rgb is not None:
        rgb = jnp.where(
            ok[..., None], grid.rgb[s, li[..., 0], li[..., 1], li[..., 2]], 0.0
        )
    if grid.feature is not None:
        feat = jnp.where(
            ok[..., None], grid.feature[s, li[..., 0], li[..., 1], li[..., 2]], 0.0
        )
    return TSDFGrid(
        tsdf=jnp.where(ok, val, cfg.truncation),
        weight=jnp.where(ok, wgt, 0.0),
        rgb=rgb,
        feature=feat,
    )


def decay_sparse(
    cfg: BlockSparseConfig, grid: BlockSparseTSDF, factor: float
) -> BlockSparseTSDF:
    """EMA weight decay over the pool (dense `decay` semantics). Blocks are
    not freed (the pool is append-only within one session — the reference
    frees blocks lazily too); dead voxels reset to unobserved."""
    w = grid.weight * factor
    dead = w < 1e-3
    return dataclasses.replace(
        grid,
        tsdf=jnp.where(dead, cfg.truncation, grid.tsdf),
        weight=jnp.where(dead, 0.0, w),
    )


class BlockSparseMapper:
    """Facade mirroring `Mapper` for the block-sparse storage mode."""

    def __init__(self, cfg: BlockSparseConfig = BlockSparseConfig()):
        self.cfg = cfg
        self.grid = make_sparse_grid(cfg)
        self._integrate = jax.jit(
            lambda g, o: integrate_camera_sparse(self.cfg, g, o)
        )
        self._integrate_set = jax.jit(
            lambda g, *obs: integrate_cameras_sparse(self.cfg, g, obs)
        )
        self._decay = jax.jit(lambda g, f: decay_sparse(self.cfg, g, f))

    def reset(self):
        self.grid = make_sparse_grid(self.cfg)

    def integrate(self, obs: CameraObservation) -> None:
        self.grid = self._integrate(self.grid, obs)

    def integrate_set(self, observations) -> None:
        """Fused multi-camera integrate (one pool pass for the whole rig)."""
        self.grid = self._integrate_set(self.grid, *observations)

    def decay(self, factor: float = 0.95) -> None:
        self.grid = self._decay(self.grid, factor)

    def sample_sdf(self, pts: jnp.ndarray):
        return sample_sdf_sparse(self.cfg, self.grid, pts)

    def extract_dense(self, dims, origin):
        return extract_dense(self.cfg, self.grid, dims, origin)

    def stats(self) -> dict:
        return {
            "allocated_blocks": int(self.grid.n_alloc),
            "pool_blocks": self.cfg.pool_blocks,
            "dropped_blocks": int(self.grid.dropped_blocks),
            "dropped_active": int(self.grid.dropped_active),
            "bytes": int(self.grid.nbytes),
        }

    # ---- checkpointing (metadata-validated, mapper.save/load parity) ----
    def save(self, path: str) -> None:
        extra = {}
        if self.grid.rgb is not None:
            extra["rgb"] = np.asarray(self.grid.rgb)
        if self.grid.feature is not None:
            extra["feature"] = np.asarray(self.grid.feature)
        np.savez_compressed(
            path,
            table_key=np.asarray(self.grid.table_key),
            table_slot=np.asarray(self.grid.table_slot),
            pool_coords=np.asarray(self.grid.pool_coords),
            n_alloc=np.asarray(self.grid.n_alloc),
            dropped=np.asarray(self.grid.dropped_blocks),
            dropped_active=np.asarray(self.grid.dropped_active),
            tsdf=np.asarray(self.grid.tsdf),
            weight=np.asarray(self.grid.weight),
            block_size=self.cfg.block_size,
            voxel_size=self.cfg.voxel_size,
            **extra,
        )

    def load(self, path: str) -> None:
        d = np.load(path)
        if int(d["block_size"]) != self.cfg.block_size:
            raise ValueError(
                f"checkpoint block_size {int(d['block_size'])} != "
                f"{self.cfg.block_size}"
            )
        if abs(float(d["voxel_size"]) - self.cfg.voxel_size) > 1e-9:
            raise ValueError("checkpoint voxel_size mismatch")
        if d["tsdf"].shape != tuple(self.grid.tsdf.shape):
            raise ValueError(
                f"checkpoint pool shape {d['tsdf'].shape} != "
                f"{tuple(self.grid.tsdf.shape)}"
            )
        self.grid = BlockSparseTSDF(
            table_key=jnp.asarray(d["table_key"]),
            table_slot=jnp.asarray(d["table_slot"]),
            pool_coords=jnp.asarray(d["pool_coords"]),
            n_alloc=jnp.asarray(d["n_alloc"]),
            dropped_blocks=jnp.asarray(d["dropped"]),
            dropped_active=(
                jnp.asarray(d["dropped_active"])
                if "dropped_active" in d
                else jnp.int32(0)
            ),
            tsdf=jnp.asarray(d["tsdf"]),
            weight=jnp.asarray(d["weight"]),
            rgb=jnp.asarray(d["rgb"]) if "rgb" in d else None,
            feature=jnp.asarray(d["feature"]) if "feature" in d else None,
        )
