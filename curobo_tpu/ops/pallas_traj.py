"""Pallas trajectory mega-kernel: B-spline rollout cost + gradient in ONE
TPU kernel.

The trajopt/MPC objective is sum_h f(q_h, qdot_h, ...) with q_h linear in
the control points (q_h = B0[h] @ ctrl, derivatives via B1..B3 scaled by the
trajectory duration). Because the spline map is LINEAR, the backward pass
through it is an analytic basis-weighted accumulation:

    dcost/dctrl[c] = sum_h  B0[h,c] * df/dq_h  +  B1[h,c]/T * df/dv_h + ...

so the kernel runs ONE `lax.fori_loop` over the horizon whose body computes
the per-step cost AND its per-step gradients (`jax.vjp` of the step
function, traced once), accumulating the control-point gradient on the fly
— no stacked residuals, VMEM stays flat (the Mosaic no-remat / no-scan
limitation never arises).

Swept collision couples steps h-1 and h: the step function takes both
configs (recomputing FK for q_{h-1} — cheap) and the vjp yields gradients
for both, accumulated with their respective basis rows.

Replaces on TPU: the reference's B-spline CUDA kernel + swept-sphere Warp
kernel + their backward passes (`bspline_kernel.cuh`,
`wp_sweep_collision_kernel.py`) fused with FK and all cost terms.

Same support envelope as PallasIKCost: single tool, single goal,
cuboid/sphere/capsule/cylinder worlds, world baked at build time.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from curobo_tpu.geom import world as world_mod
from curobo_tpu.ops.pallas_ik import SUB, LANE, BLK, PallasIKCost, _atan2_nonneg
from curobo_tpu.ops import blast as blast_mod
from curobo_tpu.robot.params import KinematicsParams
from curobo_tpu.rollout.robot_rollout import RobotRolloutConfig
from curobo_tpu.transition.bspline import BSplineConfig, N_PIN, _basis_matrices


@dataclasses.dataclass
class PallasTrajCost:
    """Build once per (robot, cost cfg, world, spline cfg); call per solve.

    __call__(goal7 (NP, 7), free (NP, n_free*D), q_start (NP, D), dt (NP,))
      -> (cost (NP,), grad (NP, n_free*D))
    """

    params: KinematicsParams
    cfg: RobotRolloutConfig
    world: world_mod.WorldData
    bspline: BSplineConfig

    def __post_init__(self):
        p = self.params
        # reuse the IK kernel's baked world + pair tables + block cost helpers
        self._ik = PallasIKCost(p, self.cfg, self.world)
        B0, B1, B2, B3 = _basis_matrices(
            self.bspline.n_control, self.bspline.degree, self.bspline.horizon
        )
        self._basis = jnp.asarray(np.stack([B0, B1, B2, B3]), jnp.float32)
        self._call = jax.jit(self._build())

    # ------------------------------------------------------------------
    def _step_cost(self, q_prev, q_h, v_h, a_h, j_h, goal, is_term, run_w):
        """Per-step cost on (SUB, LANE) lanes. All jnp; vjp-able.

        q_prev/q_h: (D, SUB, LANE); v/a/j likewise; is_term in {0.,1.}.
        """
        p, cfg = self.params, self.cfg
        wb = self._ik._wb
        D = p.n_dof

        Rg, pg, sx, sy, sz = blast_mod.fk_blast(p, q_h)
        _, _, px, py, pz = blast_mod.fk_blast(p, q_prev)
        S = p.n_spheres
        radii = self._ik._radii

        # ---- pose (terminal + run weight) -----------------------------
        ti = p.tool_frame_idx[0]
        tx, ty, tz = pg[ti]
        gx, gy, gz = goal[0], goal[1], goal[2]
        gqw, gqx, gqy, gqz = goal[3], goal[4], goal[5], goal[6]
        dx, dy, dz = gx - tx, gy - ty, gz - tz
        pos_err2 = dx * dx + dy * dy + dz * dz
        tw, tx_, ty_, tz_ = blast_mod._rot_to_quat_blast(Rg[ti])
        rw = gqw * tw + gqx * tx_ + gqy * ty_ + gqz * tz_
        rx = gqw * tx_ - gqx * tw - gqy * tz_ + gqz * ty_
        ry = gqw * ty_ + gqx * tz_ - gqy * tw - gqz * tx_
        rz = gqw * tz_ - gqx * ty_ + gqy * tx_ - gqz * tw
        sgn = jnp.where(rw < 0, -1.0, 1.0)
        rw, rx, ry, rz = rw * sgn, rx * sgn, ry * sgn, rz * sgn
        s2 = rx * rx + ry * ry + rz * rz
        small = s2 < 1e-12
        s = jnp.sqrt(jnp.where(small, 1.0, s2))
        angle = 2.0 * _atan2_nonneg(s, rw)
        scale = jnp.where(small, 2.0, angle / s)
        rot_err2 = s2 * scale * scale
        pose_c = (
            cfg.pose_cost.position_weight * pos_err2
            + cfg.pose_cost.rotation_weight * rot_err2
        )
        cost = pose_c * (is_term + (1.0 - is_term) * run_w)

        # ---- bounds + smoothness --------------------------------------
        lim_lo = self._ik._lim_lo
        lim_hi = self._ik._lim_hi
        lim = p.joint_limits
        vl = np.asarray(lim.velocity, np.float64)
        al = np.asarray(lim.acceleration, np.float64)
        jl = np.asarray(lim.jerk, np.float64)
        bc = cfg.bound_cost
        H = self.bspline.horizon
        for d in range(D):
            viol = jnp.maximum(lim_lo[d] - q_h[d], 0.0) + jnp.maximum(
                q_h[d] - lim_hi[d], 0.0
            )
            cost = cost + bc.weight * viol * viol
            if bc.velocity_weight > 0:
                vv = jnp.maximum(jnp.abs(v_h[d]) - vl[d], 0.0)
                cost = cost + bc.velocity_weight * vv * vv
            if bc.acceleration_weight > 0:
                aa = jnp.maximum(jnp.abs(a_h[d]) - al[d], 0.0)
                cost = cost + bc.acceleration_weight * aa * aa
            if bc.jerk_weight > 0:
                jj = jnp.maximum(jnp.abs(j_h[d]) - jl[d], 0.0)
                cost = cost + bc.jerk_weight * jj * jj
            if cfg.velocity_weight > 0:
                cost = cost + cfg.velocity_weight / H * v_h[d] * v_h[d]
            if cfg.acceleration_weight > 0:
                cost = cost + cfg.acceleration_weight / H * a_h[d] * a_h[d]
            if cfg.jerk_weight > 0:
                cost = cost + cfg.jerk_weight / H * j_h[d] * j_h[d]

        # ---- swept scene collision ------------------------------------
        cc = cfg.collision_cost
        act = cc.activation_distance
        K = cc.sweep_steps if cfg.use_swept_collision else 1
        pen_sum = jnp.zeros_like(cost)
        for k in range(1, K + 1):
            alpha = k / K
            pen_k = jnp.zeros_like(cost)
            for si in range(S):
                if radii[si] < 0:
                    continue
                ix = px[si] * (1 - alpha) + sx[si] * alpha
                iy = py[si] * (1 - alpha) + sy[si] * alpha
                iz = pz[si] * (1 - alpha) + sz[si] * alpha
                msdf = self._sphere_min_sdf(ix, iy, iz)
                pen_k = pen_k + jnp.maximum(0.0, act + radii[si] - msdf)
            pen_sum = pen_sum + pen_k
        cost = cost + cc.weight * pen_sum / K

        # ---- self collision (unrolled pairs; small robots) -------------
        sc_w = cfg.self_collision_cost.weight
        sc_act = cfg.self_collision_cost.activation_distance
        pa = np.asarray(p.self_collision.pair_a)
        pb = np.asarray(p.self_collision.pair_b)
        mg = np.asarray(p.self_collision.pair_margin, np.float64)
        sc = jnp.zeros_like(cost)
        for idx in range(len(pa)):
            m = mg[idx]
            if not np.isfinite(m):
                continue
            i, j = int(pa[idx]), int(pb[idx])
            ddx = sx[i] - sx[j]
            ddy = sy[i] - sy[j]
            ddz = sz[i] - sz[j]
            dist = jnp.sqrt(ddx * ddx + ddy * ddy + ddz * ddz + 1e-12)
            sc = sc + jnp.maximum(m + sc_act - dist, 0.0)
        cost = cost + sc_w * sc
        return cost

    def _sphere_min_sdf(self, x, y, z):
        """Min sdf of one point set against the baked world (static bake)."""
        wb = self._ik._wb
        big = 1.0e6
        out = jnp.full_like(x, big)
        for k in range(len(wb["cub_en"])):
            if wb["cub_en"][k] <= 0:
                continue
            R = wb["cub_rot"][k]
            pos = wb["cub_pos"][k]
            half = wb["cub_half"][k]
            ux, uy, uz = x - pos[0], y - pos[1], z - pos[2]
            lx = R[0, 0] * ux + R[1, 0] * uy + R[2, 0] * uz
            ly = R[0, 1] * ux + R[1, 1] * uy + R[2, 1] * uz
            lz = R[0, 2] * ux + R[1, 2] * uy + R[2, 2] * uz
            qx = jnp.abs(lx) - half[0]
            qy = jnp.abs(ly) - half[1]
            qz = jnp.abs(lz) - half[2]
            o = jnp.sqrt(
                jnp.maximum(qx, 0.0) ** 2
                + jnp.maximum(qy, 0.0) ** 2
                + jnp.maximum(qz, 0.0) ** 2
                + 1e-12
            )
            out = jnp.minimum(out, o + jnp.minimum(jnp.maximum(qx, jnp.maximum(qy, qz)), 0.0))
        for k in range(len(wb["sph_en"])):
            if wb["sph_en"][k] <= 0:
                continue
            c = wb["sph_c"][k]
            out = jnp.minimum(
                out,
                jnp.sqrt((x - c[0]) ** 2 + (y - c[1]) ** 2 + (z - c[2]) ** 2 + 1e-12)
                - wb["sph_r"][k],
            )
        for k in range(len(wb["cap_en"])):
            if wb["cap_en"][k] <= 0:
                continue
            R = wb["cap_rot"][k]
            pos = wb["cap_pos"][k]
            a = R @ wb["cap_base"][k] + pos
            b = R @ wb["cap_tip"][k] + pos
            ba = b - a
            denom = max(float(ba @ ba), 1e-12)
            px_, py_, pz_ = x - a[0], y - a[1], z - a[2]
            h = jnp.clip((px_ * ba[0] + py_ * ba[1] + pz_ * ba[2]) / denom, 0.0, 1.0)
            out = jnp.minimum(
                out,
                jnp.sqrt(
                    (px_ - ba[0] * h) ** 2 + (py_ - ba[1] * h) ** 2 + (pz_ - ba[2] * h) ** 2
                    + 1e-12
                )
                - wb["cap_r"][k],
            )
        for k in range(len(wb["cyl_en"])):
            if wb["cyl_en"][k] <= 0:
                continue
            R = wb["cyl_rot"][k]
            pos = wb["cyl_pos"][k]
            ux, uy, uz = x - pos[0], y - pos[1], z - pos[2]
            lx = R[0, 0] * ux + R[1, 0] * uy + R[2, 0] * uz
            ly = R[0, 1] * ux + R[1, 1] * uy + R[2, 1] * uz
            lz = R[0, 2] * ux + R[1, 2] * uy + R[2, 2] * uz
            dr = jnp.sqrt(lx * lx + ly * ly + 1e-12) - wb["cyl_r"][k]
            dz = jnp.abs(lz) - wb["cyl_hh"][k]
            out = jnp.minimum(
                out,
                jnp.sqrt(jnp.maximum(dr, 0.0) ** 2 + jnp.maximum(dz, 0.0) ** 2 + 1e-12)
                + jnp.minimum(jnp.maximum(dr, dz), 0.0),
            )
        return out

    # ------------------------------------------------------------------
    def _build(self):
        p = self.params
        D = p.n_dof
        H = self.bspline.horizon
        n_ctrl = self.bspline.n_control
        n_free = self.bspline.n_free
        run_w = self.cfg.pose_run_weight / max(H - 1, 1)

        def kernel(basis_ref, goal_ref, qs_ref, dt_ref, x_ref, cost_ref, grad_ref):
            goal = goal_ref[0]  # (7, SUB, LANE)
            qs = qs_ref[0]  # (D, SUB, LANE)
            x = x_ref[0]  # (n_free*D, SUB, LANE)
            dtv = dt_ref[0][0]  # (SUB, LANE)
            T = dtv * (H - 1)
            invT = 1.0 / jnp.maximum(T, 1e-6)

            # control points: pinned start (N_PIN copies) + free knots —
            # one (n_ctrl*D, SUB, LANE) array
            ctrl = jnp.concatenate(
                [jnp.concatenate([qs] * N_PIN, axis=0), x], axis=0
            )  # (n_ctrl*D, SUB, LANE)

            def eval_at(order, h):
                """q/v/a/j at step h: (D, SUB, LANE) via basis row scalars."""
                rows = []
                for d in range(D):
                    accum = None
                    for c in range(n_ctrl):
                        b = basis_ref[order, h, c]
                        term = b * ctrl[c * D + d]
                        accum = term if accum is None else accum + term
                    rows.append(accum)
                return jnp.stack(rows)

            def body(h, carry):
                cost_acc, grad_acc = carry
                h_prev = jnp.maximum(h - 1, 0)
                q_h = eval_at(0, h)
                q_p = eval_at(0, h_prev)
                v_h = eval_at(1, h) * invT
                a_h = eval_at(2, h) * invT * invT
                j_h = eval_at(3, h) * invT * invT * invT
                is_term = (h == H - 1).astype(jnp.float32)

                c_h, vjp = jax.vjp(
                    lambda qp, qq, vv, aa, jj: self._step_cost(
                        qp, qq, vv, aa, jj, goal, is_term, run_w
                    ),
                    q_p, q_h, v_h, a_h, j_h,
                )
                g_qp, g_qh, g_v, g_a, g_j = vjp(jnp.ones_like(c_h))

                # analytic spline backward: dctrl += B[h]^T g
                updates = []
                for c in range(n_ctrl):
                    b0h = basis_ref[0, h, c]
                    b0p = basis_ref[0, h_prev, c]
                    b1h = basis_ref[1, h, c]
                    b2h = basis_ref[2, h, c]
                    b3h = basis_ref[3, h, c]
                    upd = (
                        b0h * g_qh
                        + b0p * g_qp
                        + (b1h * invT) * g_v
                        + (b2h * invT * invT) * g_a
                        + (b3h * invT * invT * invT) * g_j
                    )  # (D, SUB, LANE)
                    updates.append(upd)
                grad_acc = grad_acc + jnp.concatenate(updates, axis=0)
                return cost_acc + c_h, grad_acc

            cost0 = jnp.zeros((SUB, LANE), jnp.float32)
            grad0 = jnp.zeros((n_ctrl * D, SUB, LANE), jnp.float32)
            cost, grad_full = jax.lax.fori_loop(0, H, body, (cost0, grad0))
            cost_ref[0] = cost
            # only the free-knot slice flows back (pinned rows are constants)
            grad_ref[0] = grad_full[N_PIN * D :]

        def call(goal7, free, q_start, dtv):
            NP = free.shape[0]
            nb = max((NP + BLK - 1) // BLK, 1)
            Npad = nb * BLK

            def pad(a, feat, pad_row=None):
                out = jnp.zeros((Npad, feat), a.dtype).at[:NP].set(a)
                if pad_row is not None:
                    out = out.at[NP:].set(jnp.asarray(pad_row, a.dtype))
                return jnp.moveaxis(out.reshape(nb, SUB, LANE, feat), -1, 1)

            # padded rows get identity quaternions / safe dt so the quat and
            # 1/T math stays well-defined on dead lanes
            gb = pad(goal7, 7, pad_row=[0, 0, 0, 1, 0, 0, 0])
            xb = pad(free, n_free * D)
            qb = pad(q_start, D)
            db = pad(jnp.maximum(dtv, 1e-4)[:, None], 1, pad_row=[0.02])

            cost, grad = pl.pallas_call(
                kernel,
                grid=(nb,),
                in_specs=[
                    pl.BlockSpec((4, H, n_ctrl), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 7, SUB, LANE), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, D, SUB, LANE), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 1, SUB, LANE), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, n_free * D, SUB, LANE), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
                ],
                out_specs=[
                    pl.BlockSpec((1, SUB, LANE), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, n_free * D, SUB, LANE), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
                ],
                out_shape=[
                    jax.ShapeDtypeStruct((nb, SUB, LANE), jnp.float32),
                    jax.ShapeDtypeStruct((nb, n_free * D, SUB, LANE), jnp.float32),
                ],
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024
                ),
            )(self._basis, gb, qb, db, xb)
            c = cost.reshape(Npad)[:NP]
            g = jnp.moveaxis(grad, 1, -1).reshape(Npad, n_free * D)[:NP]
            return c, g

        return call

    def __call__(self, goal7, free, q_start, dtv):
        return self._call(goal7, free, q_start, dtv)