"""B-last ("blast") compute path: the TPU-optimized solver hot loop.

Motivation (measured in tools/perf_layout_experiment.py): the generic
rollout keeps rotations as (..., 3, 3) trailing dims, which pad toward
(8, 128) TPU tiles and waste >90% of the vector lanes. This module keeps
EVERY intermediate as a (N,) lane-aligned vector (N = flattened
problems x seeds x candidates) and unrolls the 3x3 algebra into scalar
FMAs with robot constants baked at trace time — 2-10x faster under XLA,
and the exact layout the Pallas mega-kernels use.

This is the TPU answer to the reference's fused CUDA kernels
(`kinematics_forward_kernel.cuh`, `self_collision_kernel.cuh`,
`wp_collision_kernel.py`): fuse by construction, batch in the lane dim.

API mirrors RobotRollout.evaluate_config and is differentiated by autodiff
(all jnp ops).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from curobo_tpu.geom import world as world_mod
from curobo_tpu.robot.params import (
    JOINT_PRISMATIC,
    JOINT_REVOLUTE,
    KinematicsParams,
)
from curobo_tpu.rollout.robot_rollout import Goal, RobotRolloutConfig, RolloutResult

BIG = 1.0e6


def _host_local_constants(params: KinematicsParams):
    """Fold locked/constant joints into static local transforms on the host.

    Returns per-link info: ("const", R(3,3), p(3)) or
    ("rev"|"prism", dof, mult, off, F(3,3), fp(3), axis(3)).
    """
    L = params.n_links
    fixed_rot = np.asarray(params.fixed_rot, dtype=np.float64)
    fixed_pos = np.asarray(params.fixed_pos, dtype=np.float64)
    axes = np.asarray(params.joint_axis, dtype=np.float64)
    mult = np.asarray(params.mimic_mult, dtype=np.float64)
    off = np.asarray(params.mimic_offset, dtype=np.float64)
    out = []
    for i in range(L):
        jt = params.joint_type[i]
        d = params.dof_idx[i]
        live = jt != 0 and d >= 0 and mult[i] != 0.0
        if not live:
            # constant local transform: fixed @ joint(off)
            R = fixed_rot[i].copy()
            p = fixed_pos[i].copy()
            if jt == JOINT_REVOLUTE and off[i] != 0.0:
                a, ang = axes[i], off[i]
                c, s = np.cos(ang), np.sin(ang)
                K = np.array(
                    [[0, -a[2], a[1]], [a[2], 0, -a[0]], [-a[1], a[0], 0]]
                )
                Rj = np.eye(3) * c + s * K + (1 - c) * np.outer(a, a)
                R = R @ Rj
            elif jt == JOINT_PRISMATIC and off[i] != 0.0:
                p = p + R @ (axes[i] * off[i])
            out.append(("const", R, p))
        else:
            kind = "rev" if jt == JOINT_REVOLUTE else "prism"
            out.append((kind, d, mult[i], off[i], fixed_rot[i], fixed_pos[i], axes[i]))
    return out


def fk_blast(params: KinematicsParams, qT: jnp.ndarray):
    """B-last FK. qT: (D, N) -> (Rg, pg, sx, sy, sz).

    Rg/pg: per-link lists of 9/3 (N,) arrays (None for links no sphere or
    tool frame needs — all computed; cheap). Sphere coords: (S, N) arrays.
    """
    info = _host_local_constants(params)
    L = params.n_links
    one = jnp.ones(qT.shape[1:], qT.dtype)
    Rg: List[Optional[list]] = [None] * L
    pg: List[Optional[list]] = [None] * L

    for i in range(L):
        rec = info[i]
        if rec[0] == "const":
            _, R, p = rec
            local = ("const", [R[r, c] for r in range(3) for c in range(3)], list(p))
        else:
            kind, d, m_, o_, F, fp, a = rec
            val = m_ * qT[d] + o_ if o_ != 0.0 or m_ != 1.0 else qT[d]
            if kind == "rev":
                c = jnp.cos(val)
                s = jnp.sin(val)
                ax, ay, az = a
                omc = 1.0 - c
                r = [
                    c + omc * ax * ax, omc * ax * ay - s * az, omc * ax * az + s * ay,
                    omc * ax * ay + s * az, c + omc * ay * ay, omc * ay * az - s * ax,
                    omc * ax * az - s * ay, omc * ay * az + s * ax, c + omc * az * az,
                ]
                # local R = F @ Rj with static F scalars
                Rl = [
                    F[r0, 0] * r[c0] + F[r0, 1] * r[3 + c0] + F[r0, 2] * r[6 + c0]
                    for r0 in range(3) for c0 in range(3)
                ]
                pl = [fp[0], fp[1], fp[2]]
                local = ("dyn", Rl, pl)
            else:  # prismatic
                # R = F; p = fp + F @ (a * val)
                Fa = F @ a
                Rl_vals = [F[r0, c0] for r0 in range(3) for c0 in range(3)]
                pl = [fp[0] + Fa[0] * val, fp[1] + Fa[1] * val, fp[2] + Fa[2] * val]
                local = ("prism", Rl_vals, pl)

        parent = params.parent_idx[i]
        if parent < 0:
            # root: global = local
            if local[0] == "const":
                Rg[i] = [jnp.full_like(one, v) for v in local[1]]
                pg[i] = [jnp.full_like(one, v) for v in local[2]]
            elif local[0] == "prism":
                Rg[i] = [jnp.full_like(one, v) for v in local[1]]
                pg[i] = list(local[2])
            else:
                Rg[i] = local[1]
                pg[i] = [jnp.full_like(one, v) for v in local[2]]
            continue

        Rp = Rg[parent]
        pp = pg[parent]

        if local[0] == "const":
            Rl_vals, pl_vals = local[1], local[2]
            # Rg = Rp @ Rl (Rl static scalars)
            Rg[i] = [
                sum(
                    Rp[3 * r0 + k] * Rl_vals[3 * k + c0]
                    for k in range(3)
                    if abs(Rl_vals[3 * k + c0]) > 1e-12
                )
                if any(abs(Rl_vals[3 * k + c0]) > 1e-12 for k in range(3))
                else jnp.zeros_like(one)
                for r0 in range(3)
                for c0 in range(3)
            ]
            pg[i] = [
                pp[r0]
                + sum(
                    Rp[3 * r0 + k] * pl_vals[k]
                    for k in range(3)
                    if abs(pl_vals[k]) > 1e-12
                )
                if any(abs(pl_vals[k]) > 1e-12 for k in range(3))
                else pp[r0]
                for r0 in range(3)
            ]
        elif local[0] == "prism":
            Rl_vals, pl = local[1], local[2]
            Rg[i] = [
                sum(
                    Rp[3 * r0 + k] * Rl_vals[3 * k + c0]
                    for k in range(3)
                    if abs(Rl_vals[3 * k + c0]) > 1e-12
                )
                if any(abs(Rl_vals[3 * k + c0]) > 1e-12 for k in range(3))
                else jnp.zeros_like(one)
                for r0 in range(3)
                for c0 in range(3)
            ]
            pg[i] = [
                Rp[3 * r0] * pl[0] + Rp[3 * r0 + 1] * pl[1] + Rp[3 * r0 + 2] * pl[2]
                + pp[r0]
                for r0 in range(3)
            ]
        else:
            Rl, pl_vals = local[1], local[2]
            Rg[i] = [
                Rp[3 * r0] * Rl[c0] + Rp[3 * r0 + 1] * Rl[3 + c0] + Rp[3 * r0 + 2] * Rl[6 + c0]
                for r0 in range(3)
                for c0 in range(3)
            ]
            pg[i] = [
                pp[r0]
                + sum(
                    Rp[3 * r0 + k] * pl_vals[k]
                    for k in range(3)
                    if abs(pl_vals[k]) > 1e-12
                )
                if any(abs(pl_vals[k]) > 1e-12 for k in range(3))
                else pp[r0]
                for r0 in range(3)
            ]

    # spheres
    sph_c = np.asarray(params.sphere_centers, dtype=np.float64)
    sph_link = params.sphere_link_idx
    sx, sy, sz = [], [], []
    for s in range(len(sph_link)):
        li = sph_link[s]
        cx, cy, cz = sph_c[s]
        R = Rg[li]
        p = pg[li]
        sx.append(R[0] * cx + R[1] * cy + R[2] * cz + p[0])
        sy.append(R[3] * cx + R[4] * cy + R[5] * cz + p[1])
        sz.append(R[6] * cx + R[7] * cy + R[8] * cz + p[2])
    sx = jnp.stack(sx) if sx else jnp.zeros((0,) + qT.shape[1:], qT.dtype)
    sy = jnp.stack(sy) if sy else sx
    sz = jnp.stack(sz) if sz else sx
    return Rg, pg, sx, sy, sz


def _rot_to_quat_blast(R: list) -> Tuple[jnp.ndarray, ...]:
    """Branchless matrix->quat on scalar lanes. R: list of 9 (N,) arrays."""
    m00, m01, m02, m10, m11, m12, m20, m21, m22 = R
    qw2 = jnp.maximum(1.0 + m00 + m11 + m22, 0.0)
    qx2 = jnp.maximum(1.0 + m00 - m11 - m22, 0.0)
    qy2 = jnp.maximum(1.0 - m00 + m11 - m22, 0.0)
    qz2 = jnp.maximum(1.0 - m00 - m11 + m22, 0.0)
    # candidates (unnormalized); select the dominant one with pure mask
    # arithmetic (no gather — Mosaic-lowerable inside Pallas kernels)
    cands = [
        (qw2, m21 - m12, m02 - m20, m10 - m01),
        (m21 - m12, qx2, m01 + m10, m02 + m20),
        (m02 - m20, m01 + m10, qy2, m12 + m21),
        (m10 - m01, m02 + m20, m12 + m21, qz2),
    ]
    m0 = (qw2 >= qx2) & (qw2 >= qy2) & (qw2 >= qz2)
    m1 = (~m0) & (qx2 >= qy2) & (qx2 >= qz2)
    m2 = (~m0) & (~m1) & (qy2 >= qz2)
    m3 = (~m0) & (~m1) & (~m2)
    masks = [m.astype(qw2.dtype) for m in (m0, m1, m2, m3)]
    comps = [
        sum(masks[k] * cands[k][c] for k in range(4)) for c in range(4)
    ]
    w, x, y, z = comps
    norm = jnp.sqrt(jnp.maximum(w * w + x * x + y * y + z * z, 1e-12))
    sign = jnp.where(w < 0, -1.0, 1.0)
    inv = sign / norm
    return w * inv, x * inv, y * inv, z * inv


def scene_min_sdf_blast(world: world_mod.WorldData, sx, sy, sz):
    """Min signed distance per robot sphere across all obstacles.

    sx/sy/sz: (S, ...) lane-aligned sphere coordinates; obstacle loops
    unroll at trace time over the (static) per-type capacities.
    """
    min_sdf = jnp.full(sx.shape, BIG, sx.dtype)

    cb = world.cuboids
    for k in range(cb.pos.shape[0]):
        R = cb.rot[k]
        pos = cb.pos[k]
        half = cb.half_dims[k]
        en = cb.enabled[k]
        lx = R[0, 0] * (sx - pos[0]) + R[1, 0] * (sy - pos[1]) + R[2, 0] * (sz - pos[2])
        ly = R[0, 1] * (sx - pos[0]) + R[1, 1] * (sy - pos[1]) + R[2, 1] * (sz - pos[2])
        lz = R[0, 2] * (sx - pos[0]) + R[1, 2] * (sy - pos[1]) + R[2, 2] * (sz - pos[2])
        qx = jnp.abs(lx) - half[0]
        qy = jnp.abs(ly) - half[1]
        qz = jnp.abs(lz) - half[2]
        outside = jnp.sqrt(
            jnp.maximum(qx, 0.0) ** 2
            + jnp.maximum(qy, 0.0) ** 2
            + jnp.maximum(qz, 0.0) ** 2
            + 1e-12
        )
        inside = jnp.minimum(jnp.maximum(qx, jnp.maximum(qy, qz)), 0.0)
        d = jnp.where(en > 0, outside + inside, BIG)
        min_sdf = jnp.minimum(min_sdf, d)

    sp = world.spheres
    for k in range(sp.center.shape[0]):
        c = sp.center[k]
        d = (
            jnp.sqrt((sx - c[0]) ** 2 + (sy - c[1]) ** 2 + (sz - c[2]) ** 2 + 1e-12)
            - sp.radius[k]
        )
        min_sdf = jnp.minimum(min_sdf, jnp.where(sp.enabled[k] > 0, d, BIG))

    cp = world.capsules
    for k in range(cp.pos.shape[0]):
        R, pos = cp.rot[k], cp.pos[k]
        a = R @ cp.base[k] + pos
        b = R @ cp.tip[k] + pos
        bax, bay, baz = b[0] - a[0], b[1] - a[1], b[2] - a[2]
        denom = jnp.maximum(bax * bax + bay * bay + baz * baz, 1e-12)
        pax, pay, paz = sx - a[0], sy - a[1], sz - a[2]
        h = jnp.clip((pax * bax + pay * bay + paz * baz) / denom, 0.0, 1.0)
        d = (
            jnp.sqrt(
                (pax - bax * h) ** 2 + (pay - bay * h) ** 2 + (paz - baz * h) ** 2
                + 1e-12
            )
            - cp.radius[k]
        )
        min_sdf = jnp.minimum(min_sdf, jnp.where(cp.enabled[k] > 0, d, BIG))

    cy = world.cylinders
    for k in range(cy.pos.shape[0]):
        R, pos = cy.rot[k], cy.pos[k]
        lx = R[0, 0] * (sx - pos[0]) + R[1, 0] * (sy - pos[1]) + R[2, 0] * (sz - pos[2])
        ly = R[0, 1] * (sx - pos[0]) + R[1, 1] * (sy - pos[1]) + R[2, 1] * (sz - pos[2])
        lz = R[0, 2] * (sx - pos[0]) + R[1, 2] * (sy - pos[1]) + R[2, 2] * (sz - pos[2])
        dr = jnp.sqrt(lx * lx + ly * ly + 1e-12) - cy.radius[k]
        dz = jnp.abs(lz) - cy.half_height[k]
        d = jnp.sqrt(
            jnp.maximum(dr, 0.0) ** 2 + jnp.maximum(dz, 0.0) ** 2 + 1e-12
        ) + jnp.minimum(jnp.maximum(dr, dz), 0.0)
        min_sdf = jnp.minimum(min_sdf, jnp.where(cy.enabled[k] > 0, d, BIG))

    for vg in world.voxel_grids:
        from curobo_tpu.geom.sdf import sample_voxel_grid

        pts = jnp.stack([sx, sy, sz], axis=-1)  # (S, ..., 3)
        xl = jnp.einsum("ji,...j->...i", vg.rot, pts - vg.pos)
        d = sample_voxel_grid(vg.data, xl, vg.origin, vg.cell_size, 10.0)
        min_sdf = jnp.minimum(min_sdf, jnp.where(vg.enabled > 0, d, BIG))

    return min_sdf


_SC_CHUNK = 4096  # pairs per scan step on the chunked humanoid path
# above this pair count, the dense S x S broadcast-reduce beats gathers
_SC_DENSE_MIN_PAIRS = 8192
_SC_DENSE_ROW_CHUNK = 128  # sphere rows per fused broadcast-reduce block
_sc_dense_cache = {}


def _self_collision_dense_fn(params: KinematicsParams, activation: float):
    """Dense gather-free self-collision for humanoid-scale pair lists.

    The pair list (G1: 162k pairs over 674 spheres) becomes a symmetric
    (S, S) margin matrix M (-BIG on non-pairs/diagonal) and the cost a
    fused broadcast-reduce over all S^2 ordered pairs:

        cost = 0.5 * sum_ij max(0, M_ij + act - ||p_i - p_j||)

    TPU rationale: the reference's CUDA kernel register-caches spheres and
    gathers pair indices (`self_collision_kernel.cuh:114`) — on TPU,
    row gathers of (n_pairs, N) and the backward's scatter-adds are the
    bottleneck, while the 2.8x-larger dense form is a pure VPU
    elementwise+reduce that XLA fuses with no materialization and no
    gather/scatter at all. custom_vjp: the backward RECOMPUTES the
    distance blocks and reduces over j (no residuals, no scatter):

        dcost/dp_i = -sum_j [active_ij / d_ij] * (p_i - p_j)

    Returns f(X, Y, Z) -> (sum, max_violation); X/Y/Z (S, *lanes).
    The max-violation output is metrics-only (its cotangent is ignored).
    """
    sc = params.self_collision
    key = (id(sc), float(activation))
    hit = _sc_dense_cache.get(key)
    if hit is not None:
        return hit
    S = params.n_spheres
    pa = np.asarray(sc.pair_a)
    pb = np.asarray(sc.pair_b)
    mg = np.asarray(sc.pair_margin, np.float64)
    fin = np.isfinite(mg)
    M = np.full((S, S), -1.0e30, np.float32)
    M[pa[fin], pb[fin]] = mg[fin]
    M[pb[fin], pa[fin]] = mg[fin]
    C = _SC_DENSE_ROW_CHUNK
    n_chunks = (S + C - 1) // C

    def _blocks(X, Y, Z):
        """Yield (dist, Mblk, dx, dy, dz) per row chunk; shapes
        (Ci, S, *lanes) with M broadcast over lanes.

        M stays NUMPY in the closure and converts per call: this closure
        is cached across jit traces (`_sc_dense_cache`), and a jnp
        constant created inside one trace is a tracer there — caching it
        leaks that tracer into the next trace (UnexpectedTracerError on
        the second solver built from the same params)."""
        Mj = jnp.asarray(M)
        extra = (1,) * (X.ndim - 1)
        for c in range(n_chunks):
            sl = slice(c * C, min((c + 1) * C, S))
            dx = X[sl][:, None] - X[None, :]
            dy = Y[sl][:, None] - Y[None, :]
            dz = Z[sl][:, None] - Z[None, :]
            dist = jnp.sqrt(dx * dx + dy * dy + dz * dz + 1e-12)
            Mblk = Mj[sl].reshape(Mj[sl].shape + extra)
            yield dist, Mblk, dx, dy, dz

    @jax.custom_vjp
    def f(X, Y, Z):
        acc = jnp.zeros(X.shape[1:], X.dtype)
        mx = jnp.zeros(X.shape[1:], X.dtype)
        for dist, Mblk, _, _, _ in _blocks(X, Y, Z):
            acc = acc + 0.5 * jnp.sum(
                jnp.maximum(Mblk + activation - dist, 0.0), axis=(0, 1)
            )
            mx = jnp.maximum(mx, jnp.max(Mblk - dist, axis=(0, 1)))
        return acc, jnp.maximum(mx, 0.0)

    def f_fwd(X, Y, Z):
        return f(X, Y, Z), (X, Y, Z)

    def f_bwd(res, g):
        gs = g[0]  # max-violation cotangent (g[1]) is metrics-only
        X, Y, Z = res
        gx_rows, gy_rows, gz_rows = [], [], []
        for dist, Mblk, dx, dy, dz in _blocks(X, Y, Z):
            coef = jnp.where(
                (Mblk + activation - dist) > 0.0, 1.0 / dist, 0.0
            )
            gx_rows.append(-gs * jnp.sum(coef * dx, axis=1))
            gy_rows.append(-gs * jnp.sum(coef * dy, axis=1))
            gz_rows.append(-gs * jnp.sum(coef * dz, axis=1))
        return (
            jnp.concatenate(gx_rows, axis=0),
            jnp.concatenate(gy_rows, axis=0),
            jnp.concatenate(gz_rows, axis=0),
        )

    f.defvjp(f_fwd, f_bwd)
    _sc_dense_cache[key] = f
    return f


def self_collision_blast(params: KinematicsParams, sx, sy, sz, activation: float):
    """(summed activated violation (,...), max violation (,...)).

    Humanoid-scale pair lists (G1: 162k) take the dense gather-free
    S x S broadcast-reduce (`_self_collision_dense_fn`); medium lists a
    rematerialized chunked `lax.scan` — materializing (n_pairs, N) at
    optimizer batch sizes is GBs and crashes the XLA TPU compile (see
    `geom/self_collision.py` for the same treatment on the generic path).
    """
    sc = params.self_collision
    pa = np.asarray(sc.pair_a)
    pb = np.asarray(sc.pair_b)
    P = len(pa)
    if P > _SC_DENSE_MIN_PAIRS:
        return _self_collision_dense_fn(params, activation)(sx, sy, sz)
    if P <= _SC_CHUNK:
        margin_shape = (P,) + (1,) * (sx.ndim - 1)
        margin = sc.pair_margin.reshape(margin_shape)
        dxp = sx[pa] - sx[pb]
        dyp = sy[pa] - sy[pb]
        dzp = sz[pa] - sz[pb]
        dist = jnp.sqrt(dxp * dxp + dyp * dyp + dzp * dzp + 1e-12)
        sviol = jnp.maximum(margin + activation - dist, 0.0)
        self_d = jnp.max(jnp.maximum(margin - dist, 0.0), axis=0)
        return jnp.sum(sviol, axis=0), self_d

    n_chunks = (P + _SC_CHUNK - 1) // _SC_CHUNK
    Ppad = n_chunks * _SC_CHUNK
    pa2 = np.zeros(Ppad, np.int32)
    pb2 = np.zeros(Ppad, np.int32)
    mg2 = np.full(Ppad, -1.0e30, np.float32)
    pa2[:P], pb2[:P] = pa, pb
    mg2[:P] = np.asarray(sc.pair_margin, np.float32)
    pa2 = jnp.asarray(pa2.reshape(n_chunks, _SC_CHUNK))
    pb2 = jnp.asarray(pb2.reshape(n_chunks, _SC_CHUNK))
    mg2 = jnp.asarray(mg2.reshape(n_chunks, _SC_CHUNK))
    lane = sx.shape[1:]
    mshape = (_SC_CHUNK,) + (1,) * len(lane)

    @jax.checkpoint
    def body(carry, xs):
        acc, mx = carry
        ia, ib, mg = xs
        dxp = sx[ia] - sx[ib]
        dyp = sy[ia] - sy[ib]
        dzp = sz[ia] - sz[ib]
        dist = jnp.sqrt(dxp * dxp + dyp * dyp + dzp * dzp + 1e-12)
        mgr = mg.reshape(mshape)
        acc = acc + jnp.sum(jnp.maximum(mgr + activation - dist, 0.0), axis=0)
        mx = jnp.maximum(mx, jnp.max(jnp.maximum(mgr - dist, 0.0), axis=0))
        return (acc, mx), None

    z = jnp.zeros(lane, sx.dtype)
    (acc, mx), _ = jax.lax.scan(body, (z, z), (pa2, pb2, mg2))
    return acc, mx


def com_blast(params: KinematicsParams, Rg, pg):
    """Mass-weighted center of mass (x, y, z) lanes from B-last FK frames.

    Parity: `robot/kinematics.py:compute_com` in the lane layout (the
    support-polygon balance term's input, ref `cost_support_polygon.py:109`).
    """
    m = np.asarray(params.link_mass, np.float64)
    com_l = np.asarray(params.link_com, np.float64)
    total = float(max(m.sum(), 1e-9))
    cx = cy = cz = 0.0
    for li in range(params.n_links):
        if m[li] <= 0.0:
            continue
        R, p = Rg[li], pg[li]
        lx, ly, lz = com_l[li]
        w = float(m[li] / total)
        cx = cx + w * (R[0] * lx + R[1] * ly + R[2] * lz + p[0])
        cy = cy + w * (R[3] * lx + R[4] * ly + R[5] * lz + p[1])
        cz = cz + w * (R[6] * lx + R[7] * ly + R[8] * lz + p[2])
    return cx, cy, cz


@dataclasses.dataclass
class BlastRollout:
    """Drop-in fast path for single-config (IK) objectives.

    Only supports: single goal (G=1), any number of tool frames (summed
    pose cost, max-ed errors — generic-path semantics), cuboid + sphere +
    capsule + cylinder + voxel worlds (same types as WorldData). Falls back
    to the generic path for anything else (solver checks `supports`).
    """

    params: KinematicsParams
    cfg: RobotRolloutConfig

    @staticmethod
    def supports(params: KinematicsParams, goal: Goal, cfg=None) -> bool:
        return (
            goal.goal_pos.shape[-3] == 1
            # humanoid balance needs the hull baked static
            # (`cost/support_polygon.py:configure_rollout`)
            and (
                cfg is None
                or cfg.support_polygon is None
                or cfg.support_polygon.weight <= 0.0
                or cfg.support_hull is not None
            )
            # per-tool ToolPoseCriteria live only in the generic rollout
            and goal.tool_weight is None
            and goal.tool_tolerance is None
        )

    def evaluate_config(
        self,
        world: world_mod.WorldData,
        goal: Goal,
        q: jnp.ndarray,  # (..., D)
        collision_eps: float = 0.0,
    ) -> RolloutResult:
        p, cfg = self.params, self.cfg
        lead = q.shape[:-1]
        D = q.shape[-1]

        N = int(np.prod(lead)) if lead else 1
        qT = jnp.moveaxis(q.reshape((N, D)), -1, 0)  # (D, N)

        Rg, pg, sx, sy, sz = fk_blast(p, qT)

        # ---- pose cost (sum over tool frames; G=1 per `supports`) ------
        # Generic-path semantics (`cost/terms.py:pose_error`): weighted
        # cost summed over tools, reported errors max-ed over tools.
        cost = 0.0
        pos_err2_max = None
        rot_err2_max = None
        for t in range(p.n_tools):
            gp = goal.goal_pos[..., 0, t, :]  # (B..., 3)
            gq = goal.goal_quat[..., 0, t, :]
            gp = jnp.broadcast_to(gp, lead + (3,)).reshape(N, 3)
            gq = jnp.broadcast_to(gq, lead + (4,)).reshape(N, 4)
            gpx, gpy, gpz = gp[:, 0], gp[:, 1], gp[:, 2]
            gqw, gqx, gqy, gqz = gq[:, 0], gq[:, 1], gq[:, 2], gq[:, 3]

            ti = p.tool_frame_idx[t]
            tx, ty, tz = pg[ti]
            dx, dy, dz = gpx - tx, gpy - ty, gpz - tz
            if cfg.pose_cost.position_axis_weight is not None:
                awx, awy, awz = cfg.pose_cost.position_axis_weight
                dx, dy, dz = dx * awx, dy * awy, dz * awz
            pos_err2 = dx * dx + dy * dy + dz * dz

            tw, tx_, ty_, tz_ = _rot_to_quat_blast(Rg[ti])
            # dq = conj(g) * t
            rw = gqw * tw + gqx * tx_ + gqy * ty_ + gqz * tz_
            rx = gqw * tx_ - gqx * tw - gqy * tz_ + gqz * ty_
            ry = gqw * ty_ + gqx * tz_ - gqy * tw - gqz * tx_
            rz = gqw * tz_ - gqx * ty_ + gqy * tx_ - gqz * tw
            # canonical sign (w >= 0)
            sgn = jnp.where(rw < 0, -1.0, 1.0)
            rw, rx, ry, rz = rw * sgn, rx * sgn, ry * sgn, rz * sgn
            s2 = rx * rx + ry * ry + rz * rz
            small = s2 < 1e-12
            s = jnp.sqrt(jnp.where(small, 1.0, s2))
            angle = 2.0 * jnp.arctan2(s, rw)
            scale = jnp.where(small, 2.0, angle / s)
            ex, ey, ez = rx * scale, ry * scale, rz * scale
            if cfg.pose_cost.rotation_axis_weight is not None:
                awx, awy, awz = cfg.pose_cost.rotation_axis_weight
                ex, ey, ez = ex * awx, ey * awy, ez * awz
            rot_err2 = ex * ex + ey * ey + ez * ez

            if cfg.pose_cost.quadratic:
                cost = cost + (
                    cfg.pose_cost.position_weight * pos_err2
                    + cfg.pose_cost.rotation_weight * rot_err2
                )
            else:
                cost = cost + cfg.pose_cost.position_weight * jnp.sqrt(
                    jnp.maximum(pos_err2, 1e-16)
                ) + cfg.pose_cost.rotation_weight * jnp.sqrt(
                    jnp.maximum(rot_err2, 1e-16)
                )
            pos_err2_max = (
                pos_err2 if pos_err2_max is None
                else jnp.maximum(pos_err2_max, pos_err2)
            )
            rot_err2_max = (
                rot_err2 if rot_err2_max is None
                else jnp.maximum(rot_err2_max, rot_err2)
            )

        pos_err = jnp.sqrt(jnp.maximum(pos_err2_max, 1e-16))
        rot_err = jnp.sqrt(jnp.maximum(rot_err2_max, 1e-16))

        # ---- cspace / null space --------------------------------------
        cspace_err = None
        if goal.goal_cspace is not None:
            gcs = jnp.broadcast_to(goal.goal_cspace, lead + (D,)).reshape(N, D)
            dcs = (qT - jnp.moveaxis(gcs, -1, 0)) * p.cspace_weight[:, None]
            e2 = jnp.sum(dcs * dcs, axis=0)
            cost = cost + cfg.cspace_cost.weight * e2
            cspace_err = jnp.sqrt(jnp.maximum(e2, 1e-16))
        if cfg.null_space_weight > 0.0:
            dn = (qT - p.retract_config[:, None]) * p.null_space_weight[:, None]
            cost = cost + cfg.null_space_weight * jnp.sum(dn * dn, axis=0)

        # ---- bounds ----------------------------------------------------
        lim = p.joint_limits
        lo = lim.lower[:, None]
        hi = lim.upper[:, None]
        viol = jnp.maximum(lo - qT, 0.0) + jnp.maximum(qT - hi, 0.0)
        cost = cost + cfg.bound_cost.weight * jnp.sum(viol * viol, axis=0)
        oob = jnp.any((qT < lo - 1e-4) | (qT > hi + 1e-4), axis=0)

        # ---- scene collision (B-last) ---------------------------------
        radii = np.asarray(p.sphere_radii)  # static
        act = cfg.collision_cost.activation_distance
        S = p.n_spheres
        live_mask = jnp.asarray((radii >= 0).astype(np.float32))[:, None]
        radii_col = jnp.asarray(radii)[:, None]

        min_sdf = scene_min_sdf_blast(world, sx, sy, sz)
        clearance = min_sdf - radii_col
        pen = jnp.maximum(0.0, act - clearance) * live_mask
        cost = cost + cfg.collision_cost.weight * jnp.sum(pen, axis=0)
        in_collision = jnp.any((clearance < -collision_eps) & (live_mask > 0), axis=0)

        # ---- self collision -------------------------------------------
        sc_sum, self_d = self_collision_blast(
            p, sx, sy, sz, cfg.self_collision_cost.activation_distance
        )
        cost = cost + cfg.self_collision_cost.weight * sc_sum
        self_colliding = self_d > collision_eps

        # ---- humanoid balance (support polygon) ------------------------
        # Parity: generic path `rollout/robot_rollout.py:200-204` / ref
        # `cost_support_polygon.py:109`; CoM in the lane layout.
        if (
            cfg.support_polygon is not None
            and cfg.support_polygon.weight > 0
            and cfg.support_hull is not None
        ):
            from curobo_tpu.cost import support_polygon as sp_mod

            cmx, cmy, _ = com_blast(p, Rg, pg)
            hull = jnp.asarray(cfg.support_hull, dtype=jnp.float32)
            com_xy = jnp.stack([cmx, cmy], axis=-1)  # (N, 2)
            cost = cost + sp_mod.support_polygon_cost(
                com_xy, hull, cfg.support_polygon
            )

        feasible = ~(in_collision | self_colliding | oob)

        def unflat(a):
            return a.reshape(lead) if a is not None else None

        return RolloutResult(
            cost=unflat(cost),
            pos_err=unflat(pos_err),
            rot_err=unflat(rot_err),
            cspace_err=unflat(cspace_err) if cspace_err is not None else None,
            feasible=unflat(feasible),
            in_collision=unflat(in_collision),
            self_colliding=unflat(self_colliding),
            out_of_bounds=unflat(oob),
        )

    # ------------------------------------------------------------------
    def evaluate_trajectory(
        self,
        world: world_mod.WorldData,
        goal: Goal,
        traj,  # JointState, arrays (..., H, D)
        collision_eps: float = 0.0,
    ) -> RolloutResult:
        """B-last trajectory objective: FK/collision/self-collision over the
        flattened (problems x horizon) lane axis; swept collision via a
        horizon reshape; state costs on the original layout (cheap).

        Semantics match RobotRollout.evaluate_trajectory for single-tool,
        single-goal problems (consistency-tested).
        """
        p, cfg = self.params, self.cfg
        q = traj.position
        lead = q.shape[:-2]  # problem dims
        H = q.shape[-2]
        D = q.shape[-1]
        NP = int(np.prod(lead)) if lead else 1
        N = NP * H
        qT = jnp.moveaxis(q.reshape((N, D)), -1, 0)  # (D, N)

        Rg, pg, sx, sy, sz = fk_blast(p, qT)
        S = p.n_spheres

        # ---- terminal pose cost (+ metrics) ---------------------------
        gp = goal.goal_pos[..., 0, 0, :]
        gq = goal.goal_quat[..., 0, 0, :]
        gp = jnp.broadcast_to(gp, lead + (3,)).reshape(NP, 3)
        gq = jnp.broadcast_to(gq, lead + (4,)).reshape(NP, 4)

        ti = p.tool_frame_idx[0]
        # tool pose only needed per problem at selected steps; compute on
        # the full lane axis (cheap) and reshape (NP, H)
        tx, ty, tz = (c.reshape(NP, H) for c in pg[ti])
        dx = gp[:, 0:1] - tx
        dy = gp[:, 1:2] - ty
        dz = gp[:, 2:3] - tz
        pos_err2_all = dx * dx + dy * dy + dz * dz  # (NP, H)

        tw, tx_, ty_, tz_ = (c.reshape(NP, H) for c in _rot_to_quat_blast(Rg[ti]))
        gqw, gqx, gqy, gqz = gq[:, 0:1], gq[:, 1:2], gq[:, 2:3], gq[:, 3:4]
        rw = gqw * tw + gqx * tx_ + gqy * ty_ + gqz * tz_
        rx = gqw * tx_ - gqx * tw - gqy * tz_ + gqz * ty_
        ry = gqw * ty_ + gqx * tz_ - gqy * tw - gqz * tx_
        rz = gqw * tz_ - gqx * ty_ + gqy * tx_ - gqz * tw
        sgn = jnp.where(rw < 0, -1.0, 1.0)
        rw, rx, ry, rz = rw * sgn, rx * sgn, ry * sgn, rz * sgn
        s2 = rx * rx + ry * ry + rz * rz
        small = s2 < 1e-12
        s_ = jnp.sqrt(jnp.where(small, 1.0, s2))
        angle = 2.0 * jnp.arctan2(s_, rw)
        scale = jnp.where(small, 2.0, angle / s_)
        rot_err2_all = s2 * scale * scale

        pose_c_all = (
            cfg.pose_cost.position_weight * pos_err2_all
            + cfg.pose_cost.rotation_weight * rot_err2_all
        )
        cost = pose_c_all[:, -1]
        if cfg.pose_run_weight > 0.0:
            cost = cost + cfg.pose_run_weight * jnp.mean(pose_c_all[:, :-1], axis=-1)
        pos_err = jnp.sqrt(jnp.maximum(pos_err2_all[:, -1], 1e-16))
        rot_err = jnp.sqrt(jnp.maximum(rot_err2_all[:, -1], 1e-16))

        cspace_err = None
        if goal.goal_cspace is not None:
            gcs = jnp.broadcast_to(goal.goal_cspace, lead + (D,)).reshape(NP, D)
            dcs = (q.reshape(NP, H, D)[:, -1] - gcs) * p.cspace_weight
            e2 = jnp.sum(dcs * dcs, axis=-1)
            cost = cost + cfg.cspace_cost.weight * e2
            cspace_err = jnp.sqrt(jnp.maximum(e2, 1e-16))

        # ---- bounds + smoothness (original layout: cheap ops) ---------
        from curobo_tpu.cost import terms as terms_mod

        bc = terms_mod.bound_cost(
            q, p.joint_limits, cfg.bound_cost,
            velocity=traj.velocity, acceleration=traj.acceleration, jerk=traj.jerk,
        )
        cost = cost + jnp.sum(bc, axis=-1).reshape(NP)
        if cfg.velocity_weight > 0.0 and traj.velocity is not None:
            cost = cost + cfg.velocity_weight * jnp.mean(
                jnp.sum(traj.velocity**2, axis=-1), axis=-1
            ).reshape(NP)
        if cfg.acceleration_weight > 0.0 and traj.acceleration is not None:
            cost = cost + cfg.acceleration_weight * jnp.mean(
                jnp.sum(traj.acceleration**2, axis=-1), axis=-1
            ).reshape(NP)
        if cfg.jerk_weight > 0.0 and traj.jerk is not None:
            cost = cost + cfg.jerk_weight * jnp.mean(
                jnp.sum(traj.jerk**2, axis=-1), axis=-1
            ).reshape(NP)

        # ---- scene collision (discrete or swept) ----------------------
        radii = np.asarray(p.sphere_radii)
        act = cfg.collision_cost.activation_distance
        live_np = (radii >= 0).astype(np.float32)
        radii_r = jnp.asarray(radii)[:, None, None]
        live_r = jnp.asarray(live_np)[:, None, None]

        if cfg.use_swept_collision and cfg.collision_cost.sweep_steps > 1:
            K = cfg.collision_cost.sweep_steps
            # substep sphere centers between h-1 and h on the (S, NP, H) view
            sxh = sx.reshape(S, NP, H)
            syh = sy.reshape(S, NP, H)
            szh = sz.reshape(S, NP, H)
            prev = lambda a: jnp.concatenate([a[..., :1], a[..., :-1]], axis=-1)
            pen_acc = 0.0
            for k in range(1, K + 1):
                alpha = k / K
                ix = prev(sxh) * (1 - alpha) + sxh * alpha
                iy = prev(syh) * (1 - alpha) + syh * alpha
                iz = prev(szh) * (1 - alpha) + szh * alpha
                msdf = scene_min_sdf_blast(world, ix, iy, iz)  # (S, NP, H)
                pen = jnp.maximum(0.0, act + radii_r - msdf) * live_r
                pen_acc = pen_acc + pen
            pen_mean = pen_acc / K
            if cfg.collision_cost.speed_metric:
                speed = jnp.sqrt(
                    (sxh - prev(sxh)) ** 2 + (syh - prev(syh)) ** 2 + (szh - prev(szh)) ** 2
                    + 1e-12
                )
                pen_mean = pen_mean * (speed + 1e-3)
            cost = cost + cfg.collision_cost.weight * jnp.sum(pen_mean, axis=(0, 2))
            # feasibility from the endpoint clearances
            msdf_end = scene_min_sdf_blast(world, sxh, syh, szh)
            clearance = msdf_end - radii_r
            in_collision = jnp.any(
                (clearance < -collision_eps) & (live_r > 0), axis=(0, 2)
            )
        else:
            msdf = scene_min_sdf_blast(world, sx.reshape(S, NP, H),
                                       sy.reshape(S, NP, H), sz.reshape(S, NP, H))
            clearance = msdf - radii_r
            pen = jnp.maximum(0.0, act - clearance) * live_r
            cost = cost + cfg.collision_cost.weight * jnp.sum(pen, axis=(0, 2))
            in_collision = jnp.any(
                (clearance < -collision_eps) & (live_r > 0), axis=(0, 2)
            )

        # ---- self collision ------------------------------------------
        sc_sum, self_d = self_collision_blast(
            p, sx, sy, sz, cfg.self_collision_cost.activation_distance
        )  # (N,), (N,)
        cost = cost + cfg.self_collision_cost.weight * jnp.sum(
            sc_sum.reshape(NP, H), axis=-1
        )
        self_colliding = jnp.any(self_d.reshape(NP, H) > collision_eps, axis=-1)

        # bounds feasibility
        lim = p.joint_limits
        oob = jnp.any(
            jnp.any((q < lim.lower - 1e-4) | (q > lim.upper + 1e-4), axis=-1), axis=-1
        ).reshape(NP)
        feasible = ~(in_collision | self_colliding | oob)

        def unflat(a):
            return a.reshape(lead) if a is not None else None

        return RolloutResult(
            cost=unflat(cost),
            pos_err=unflat(pos_err),
            rot_err=unflat(rot_err),
            cspace_err=unflat(cspace_err) if cspace_err is not None else None,
            feasible=unflat(feasible),
            in_collision=unflat(in_collision),
            self_colliding=unflat(self_colliding),
            out_of_bounds=unflat(oob),
        )
