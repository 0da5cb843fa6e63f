"""Pallas trajectory mega-kernel: B-spline rollout cost + gradient — and the
whole trajopt/MPC optimizer loop — inside single TPU kernels.

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

`build_solver` goes one level further (same recipe as
`PallasIKCost.build_solver`): the full L-BFGS (and optionally MPPI) loop
over free knots, the metrics pass, and the dt retiming all run on-core, so
one trajopt seed-solve round is ONE kernel dispatch.

Replaces on TPU: the reference's B-spline CUDA kernel + swept-sphere Warp
kernel + their backward passes + the L-BFGS/line-search CUDA kernels
(`bspline_kernel.cuh`, `wp_sweep_collision_kernel.py`,
`lbfgs_step_kernel.cuh`, `line_search_kernel.cuh`) fused with FK and all
cost terms.

Same support envelope as PallasIKCost: single tool, single goal,
cuboid/sphere/capsule/cylinder worlds. The world is a runtime SMEM input
(kernels compile once per obstacle-capacity envelope; see
`pallas_ik.pack_world_arrays`).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from curobo_tpu.geom import world as world_mod
from curobo_tpu.ops.pallas_ik import (
    SUB,
    LANE,
    BLK,
    PallasIKCost,
    _atan2_nonneg,
    scene_msdf_fori,
)
from curobo_tpu.ops import blast as blast_mod
from curobo_tpu.robot.params import KinematicsParams
from curobo_tpu.rollout.robot_rollout import RobotRolloutConfig
from curobo_tpu.transition.bspline import BSplineConfig, N_PIN, _basis_matrices


def traj_config_is_supported(cfg: RobotRolloutConfig) -> bool:
    """The trajectory kernel bakes an isotropic quadratic pose objective and
    has no torque/cspace terms; those configs take the blast path."""
    pc = cfg.pose_cost
    return (
        pc.position_axis_weight is None
        and pc.rotation_axis_weight is None
        and pc.quadratic
        and cfg.torque_limit_weight == 0.0
        and cfg.support_polygon is None
    )


@dataclasses.dataclass
class PallasTrajCost:
    """Build once per (robot, cost cfg, world CAPACITY envelope, spline
    cfg); call per solve with any world of that envelope.

    __call__(goal7 (NP, 7), free (NP, n_free*D), q_start (NP, D), dt (NP,),
             world=None) -> (cost (NP,), grad (NP, n_free*D))
    """

    params: KinematicsParams
    cfg: RobotRolloutConfig
    world: world_mod.WorldData
    bspline: BSplineConfig

    def __post_init__(self):
        p = self.params
        # reuse the IK kernel's world tables + pair tables + loop helpers
        self._ik = PallasIKCost(p, self.cfg, self.world)
        B0, B1, B2, B3 = _basis_matrices(
            self.bspline.n_control, self.bspline.degree, self.bspline.horizon
        )
        self._basis = jnp.asarray(np.stack([B0, B1, B2, B3]), jnp.float32)
        self._call = jax.jit(self._build())

    def _margin_limits(self):
        """Host-side margin-shrunk joint limits (terms.bound_cost parity,
        finite-guarded for unbounded joints)."""
        lo = np.asarray(self.params.joint_limits.lower, np.float64)
        hi = np.asarray(self.params.joint_limits.upper, np.float64)
        margin = self.cfg.bound_cost.margin
        if margin != 0.0:
            rng = hi - lo
            rng[~np.isfinite(rng)] = 0.0
            lo = lo + margin * rng
            hi = hi - margin * rng
        return lo, hi

    # ------------------------------------------------------------------
    def _step_cost(
        self, q_prev, q_h, v_h, a_h, j_h, goal, is_term, run_w,
        dpair=None, margin=None, with_metrics=False,
    ):
        """Per-step cost EXCEPT scene collision, on (SUB, LANE) lanes.
        All jnp; vjp-able.

        q_prev/q_h: (D, SUB, LANE); v/a/j likewise; is_term in {0.,1.}.
        Returns (cost, IX, IY, IZ, SPD): the concatenated swept sample
        stacks (K*Sl, SUB, LANE) + the CHOMP speed factor (Sl, SUB, LANE)
        so the caller composes the scene term around it — the obstacle
        scan is a runtime `fori_loop` over SMEM refs (`scene_msdf_fori`)
        that must stay OUTSIDE autodiff (see `_swept_scene`).
        with_metrics=True (forward-only) appends
        (pos_err2, rot_err2, self_viol, oob01) for the step.
        """
        p, cfg = self.params, self.cfg
        D = p.n_dof

        _, _, px, py, pz = blast_mod.fk_blast(p, q_prev)
        # serialize the two FK graphs: gate q_h on the q_prev FK's output
        # (always-true select, opaque to the compiler) so their ~40 MB of
        # temporaries can't be live concurrently (see pallas_ik._scene_scan)
        fk_gate = px[0] < 1.0e9
        q_h = jnp.where(fk_gate, q_h, jnp.zeros_like(q_h))
        Rg, pg, sx, sy, sz = blast_mod.fk_blast(p, q_h)
        S = p.n_spheres

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
        # margin-shrunk limits (terms.bound_cost semantics, finite-guarded)
        lim_lo, lim_hi = self._margin_limits()
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

        # ---- swept sample stacks (scene term composed by the caller) ---
        cc = cfg.collision_cost
        K = cc.sweep_steps if cfg.use_swept_collision else 1
        big = 1.0e6
        live = self._ik._live_spheres
        SX = jnp.stack([sx[si] for si in live])
        SY = jnp.stack([sy[si] for si in live])
        SZ = jnp.stack([sz[si] for si in live])
        PX = jnp.stack([px[si] for si in live])
        PY = jnp.stack([py[si] for si in live])
        PZ = jnp.stack([pz[si] for si in live])
        stacks = []
        for k in range(1, K + 1):
            alpha = k / K
            stacks.append((
                PX * (1 - alpha) + SX * alpha,
                PY * (1 - alpha) + SY * alpha,
                PZ * (1 - alpha) + SZ * alpha,
            ))
        IX = jnp.concatenate([s[0] for s in stacks], axis=0)
        IY = jnp.concatenate([s[1] for s in stacks], axis=0)
        IZ = jnp.concatenate([s[2] for s in stacks], axis=0)
        if cc.speed_metric:
            # CHOMP-style motion-aware scaling (blast parity:
            # `ops/blast.py:601-606`, ref `wp_speed_metric.py:10`)
            SPD = jnp.sqrt(
                (SX - PX) ** 2 + (SY - PY) ** 2 + (SZ - PZ) ** 2 + 1e-12
            ) + 1e-3
        else:
            SPD = jnp.ones_like(SX)

        # ---- self collision (mode shared with the IK kernel) ------------
        sc_w = cfg.self_collision_cost.weight
        self_viol = jnp.full_like(cost, -big)
        if self._ik.self_collision_mode == "matmul":
            flatN = int(np.prod(cost.shape))
            sphx = jnp.stack(sx).reshape(S, flatN)
            sphy = jnp.stack(sy).reshape(S, flatN)
            sphz = jnp.stack(sz).reshape(S, flatN)
            sc = self._ik.sc_matmul_cost(dpair, margin, sphx, sphy, sphz)
            cost = cost + sc_w * sc.reshape(cost.shape)
            if with_metrics:
                self_viol = self._ik.sc_matmul_viol(
                    dpair, margin, sphx, sphy, sphz
                ).reshape(cost.shape)
        else:
            sc = self._ik.sc_block_fn()(
                jnp.stack(sx), jnp.stack(sy), jnp.stack(sz)
            )
            cost = cost + sc_w * sc
            if with_metrics:
                for i, j, m in self._ik._live_pairs:
                    ddx = sx[i] - sx[j]
                    ddy = sy[i] - sy[j]
                    ddz = sz[i] - sz[j]
                    dist = jnp.sqrt(ddx * ddx + ddy * ddy + ddz * ddz + 1e-12)
                    self_viol = jnp.maximum(self_viol, m - dist)
        if not with_metrics:
            return cost, IX, IY, IZ, SPD

        oob = jnp.zeros_like(cost)
        lo_np = np.asarray(lim.lower, np.float64)
        hi_np = np.asarray(lim.upper, np.float64)
        for d in range(D):
            bad = (q_h[d] < lo_np[d] - 1e-4) | (q_h[d] > hi_np[d] + 1e-4)
            oob = jnp.maximum(oob, bad.astype(cost.dtype))
        return cost, IX, IY, IZ, SPD, pos_err2, rot_err2, self_viol, oob

    def _swept_scene(self, refs, IX, IY, IZ, SPD, want_grad,
                     want_clear=False):
        """Weighted swept scene-collision penalty of the (K*Sl, ...) sample
        stacks from `_step_cost`, via the runtime obstacle scan
        (`pallas_ik.scene_msdf_fori`) — compiled program size independent
        of the world capacity envelope.

        Returns (scene_cost, cotangents, min_clear): cotangents =
        (d/dIX, d/dIY, d/dIZ, d/dSPD) when want_grad (chained through the
        step vjp as output cotangents — exact, since d(scene)/d(samples)
        is analytic); min_clear is the endpoint (k=K) clearance when
        want_clear (blast feasibility semantics, `ops/blast.py:609-613`).
        """
        cc = self.cfg.collision_cost
        act = cc.activation_distance
        wgt = cc.weight
        live = self._ik._live_spheres
        radii = self._ik._radii
        Sl = len(live)
        K = IX.shape[0] // Sl
        big = 1.0e6
        msdf_all, (gx, gy, gz) = scene_msdf_fori(
            refs, self._ik._caps, IX, IY, IZ, want_grad
        )
        pen_rows = [None] * Sl  # per live sphere: (1/K) sum_k viol_k
        ct_rows = [] if want_grad else None  # row-ordered (k major)
        min_clear = jnp.full_like(IX[0], big) if want_clear else None
        for k in range(K):
            for idx, si in enumerate(live):
                r = float(radii[si])
                viol = act + r - msdf_all[k * Sl + idx]
                v = jnp.maximum(0.0, viol)
                pen_rows[idx] = v if pen_rows[idx] is None else pen_rows[idx] + v
                if want_grad:
                    # cotangent on sample (k, idx): -wgt * SPD_idx / K
                    # where the penalty is active
                    ct_rows.append(
                        jnp.where(viol > 0, -wgt / K * SPD[idx], 0.0)
                    )
                if want_clear and k == K - 1:
                    min_clear = jnp.minimum(
                        min_clear, msdf_all[k * Sl + idx] - r
                    )
        pen = jnp.stack(pen_rows) / K  # (Sl, ...)
        scene_c = wgt * jnp.sum(pen * SPD, axis=0)
        if not want_grad:
            return scene_c, None, min_clear
        ct = jnp.stack(ct_rows)  # (K*Sl, ...)
        ct_spd = wgt * pen  # cotangent on SPD_i: wgt * pen_i
        return scene_c, (ct * gx, ct * gy, ct * gz, ct_spd), min_clear

    # ------------------------------------------------------------------
    def _horizon_loop(self, basis_ref, goal, qs, dtv, x, refs, mode,
                      dpair=None, margin=None):
        """Shared horizon `fori_loop`. x: (n_free*D, SUB, LANE);
        refs: (wc, ws, wp, wy) world SMEM refs (or jnp arrays on CPU).

        mode: "grad" -> (cost, grad_free); "cost" -> cost;
        "metrics" -> (cost, pos_err, rot_err, feasible01, dt_retimed).
        """
        p = self.params
        D = p.n_dof
        H = self.bspline.horizon
        n_ctrl = self.bspline.n_control
        run_w = self.cfg.pose_run_weight / max(H - 1, 1)
        big = 1.0e6

        T = dtv * (H - 1)
        invT = 1.0 / jnp.maximum(T, 1e-6)

        # control points: pinned start (N_PIN copies) + free knots
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

        def states_at(h, h_prev):
            q_h = eval_at(0, h)
            q_p = eval_at(0, h_prev)
            v_h = eval_at(1, h) * invT
            a_h = eval_at(2, h) * invT * invT
            j_h = eval_at(3, h) * invT * invT * invT
            return q_p, q_h, v_h, a_h, j_h

        if mode == "grad":

            def body(h, carry):
                cost_acc, grad_acc = carry
                h_prev = jnp.maximum(h - 1, 0)
                q_p, q_h, v_h, a_h, j_h = states_at(h, h_prev)
                is_term = (h == H - 1).astype(jnp.float32)

                (c_h, IX, IY, IZ, SPD), vjp = jax.vjp(
                    lambda qp, qq, vv, aa, jj: self._step_cost(
                        qp, qq, vv, aa, jj, goal, is_term, run_w,
                        dpair=dpair, margin=margin,
                    ),
                    q_p, q_h, v_h, a_h, j_h,
                )
                scene_c, (ctx, cty, ctz, ctspd), _ = self._swept_scene(
                    refs, IX, IY, IZ, SPD, want_grad=True
                )
                c_h = c_h + scene_c
                g_qp, g_qh, g_v, g_a, g_j = vjp(
                    (jnp.ones_like(c_h), ctx, cty, ctz, ctspd)
                )

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
            # only the free-knot slice flows back (pinned rows are constants)
            return cost, grad_full[N_PIN * D :]

        if mode == "cost":

            def body(h, cost_acc):
                h_prev = jnp.maximum(h - 1, 0)
                q_p, q_h, v_h, a_h, j_h = states_at(h, h_prev)
                is_term = (h == H - 1).astype(jnp.float32)
                c_h, IX, IY, IZ, SPD = self._step_cost(
                    q_p, q_h, v_h, a_h, j_h, goal, is_term, run_w,
                    dpair=dpair, margin=margin,
                )
                scene_c, _, _ = self._swept_scene(
                    refs, IX, IY, IZ, SPD, want_grad=False
                )
                return cost_acc + c_h + scene_c

            return jax.lax.fori_loop(0, H, body, jnp.zeros((SUB, LANE), jnp.float32))

        # mode == "metrics": forward pass with feasibility + retiming stats
        lim = p.joint_limits
        vl = np.asarray(lim.velocity, np.float64)
        al = np.asarray(lim.acceleration, np.float64)
        jl = np.asarray(lim.jerk, np.float64)

        def body(h, carry):
            cost_acc, pe2, re2, clear, sviol, oob, rv, ra, rj = carry
            h_prev = jnp.maximum(h - 1, 0)
            q_p, q_h, v_h, a_h, j_h = states_at(h, h_prev)
            is_term = (h == H - 1).astype(jnp.float32)
            c_h, IX, IY, IZ, SPD, pe2_h, re2_h, sviol_h, oob_h = (
                self._step_cost(
                    q_p, q_h, v_h, a_h, j_h, goal, is_term, run_w,
                    dpair=dpair, margin=margin, with_metrics=True,
                )
            )
            scene_c, _, clear_h = self._swept_scene(
                refs, IX, IY, IZ, SPD, want_grad=False, want_clear=True
            )
            c_h = c_h + scene_c
            # terminal-step pose errors only
            pe2 = pe2 * (1.0 - is_term) + pe2_h * is_term
            re2 = re2 * (1.0 - is_term) + re2_h * is_term
            clear = jnp.minimum(clear, clear_h)
            sviol = jnp.maximum(sviol, sviol_h)
            oob = jnp.maximum(oob, oob_h)
            # retiming ratios (solver `_retime_dt` parity)
            for d in range(D):
                rv = jnp.maximum(rv, jnp.abs(v_h[d]) / vl[d])
                ra = jnp.maximum(ra, jnp.abs(a_h[d]) / al[d])
                rj = jnp.maximum(rj, jnp.abs(j_h[d]) / jl[d])
            return cost_acc + c_h, pe2, re2, clear, sviol, oob, rv, ra, rj

        z = jnp.zeros((SUB, LANE), jnp.float32)
        carry = (z, z, z, jnp.full_like(z, big), jnp.full_like(z, -big), z, z, z, z)
        cost, pe2, re2, clear, sviol, oob, rv, ra, rj = jax.lax.fori_loop(
            0, H, body, carry
        )
        pos_err = jnp.sqrt(jnp.maximum(pe2, 1e-16))
        rot_err = jnp.sqrt(jnp.maximum(re2, 1e-16))
        feasible = ((clear >= 0.0) & (sviol <= 0.0) & (oob < 0.5)).astype(jnp.float32)
        # cbrt via exp/log (no cbrt primitive in Mosaic); rj >= 0
        cbrt_rj = jnp.exp(jnp.log(jnp.maximum(rj, 1e-12)) / 3.0)
        scale = jnp.maximum(rv, jnp.maximum(jnp.sqrt(ra), cbrt_rj))
        dt_ret = dtv * scale * 1.01  # caller clips to [min_dt, max_dt]
        return cost, pos_err, rot_err, feasible, dt_ret

    # ------------------------------------------------------------------
    def _traj_in_specs(self, n_free_D):
        D = self.params.n_dof
        H = self.bspline.horizon
        n_ctrl = self.bspline.n_control
        Ppad = self._ik._D_pair.shape[0]
        S_n = self.params.n_spheres
        return [
            pl.BlockSpec((4, H, n_ctrl), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 7, SUB, LANE), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D, SUB, LANE), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, SUB, LANE), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_free_D, SUB, LANE), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Ppad, S_n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Ppad, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ]

    def _traj_pack(self, goal7, free, q_start, dtv):
        D = self.params.n_dof
        n_free = self.bspline.n_free
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
        return gb, xb, qb, db, nb, Npad

    def _build(self):
        D = self.params.n_dof
        H = self.bspline.horizon
        n_ctrl = self.bspline.n_control
        n_free = self.bspline.n_free

        def kernel(
            basis_ref, goal_ref, qs_ref, dt_ref, x_ref, dpair_ref, margin_ref,
            wc, ws, wp, wy, cost_ref, grad_ref,
        ):
            cost, grad = self._horizon_loop(
                basis_ref, goal_ref[0], qs_ref[0], dt_ref[0][0], x_ref[0],
                (wc, ws, wp, wy),
                "grad", dpair=dpair_ref[...], margin=margin_ref[...],
            )
            cost_ref[0] = cost
            grad_ref[0] = grad

        def call(goal7, free, q_start, dtv, world=None):
            NP = free.shape[0]
            gb, xb, qb, db, nb, Npad = self._traj_pack(goal7, free, q_start, dtv)
            cost, grad = pl.pallas_call(
                kernel,
                grid=(nb,),
                in_specs=self._traj_in_specs(n_free * D)
                + self._ik._world_specs(),
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
            )(self._basis, gb, qb, db, xb, self._ik._D_pair, self._ik._margin,
              *self._world_args(world))
            c = cost.reshape(Npad)[:NP]
            g = jnp.moveaxis(grad, 1, -1).reshape(Npad, n_free * D)[:NP]
            return c, g

        return call

    def _world_args(self, world):
        from curobo_tpu.ops.pallas_ik import pack_world_arrays

        return pack_world_arrays(self.world if world is None else world)

    def __call__(self, goal7, free, q_start, dtv, world=None):
        return self._call(goal7, free, q_start, dtv, world)

    # ==================================================================
    # Fused full trajectory solve: (MPPI ->) L-BFGS over free knots ->
    # metrics + dt retiming, ALL inside one Pallas dispatch. This is the
    # trajopt/MPC analog of PallasIKCost.build_solver: the reference runs
    # its whole optimizer under a CUDA graph (`solver_trajopt.py:258`,
    # `gradient_opt_core.py:334`); here the loop itself is on-core.
    # ==================================================================
    def build_solver(
        self,
        mppi_iters: int = 0,
        n_particles: int = 16,
        init_std: float = 0.1,
        std_decay: float = 0.9,
        min_std: float = 0.005,
        temperature: float = 0.05,
        step_size: float = 0.9,
        lbfgs_iters: int = 48,
        history: int = 10,
        max_step: float = 0.4,
        n_linesearch: int = 5,
        ls_base: float = 1.0,
        ls_ratio: float = 0.35,
        eps_smooth=None,
    ):
        """Returns solve(goal7 (N,7), free (N, n_free*D), q_start (N,D),
        dt (N,), seed) -> (free, cost, pos_err, rot_err, feasible01,
        dt_retimed) — one dispatch for the whole seed-solve.

        eps_smooth: optional (n_free, n_free) STOMP smoothing matrix for
        MPPI noise over the knot axis (MPC parity: `opt/mppi.py:40`),
        applied as a static unrolled linear combination of knot rows."""
        p = self.params
        D = p.n_dof
        n_free = self.bspline.n_free
        nfD = n_free * D

        eps_transform = None
        if eps_smooth is not None:
            L = np.asarray(eps_smooth, np.float64)

            def eps_transform(eps):  # (nfD, SUB, LANE): mix knot rows per dof
                rows = []
                for k in range(n_free):
                    for d in range(D):
                        acc = None
                        for j in range(n_free):
                            w = float(L[k, j])
                            if abs(w) < 1e-8:
                                continue
                            t = w * eps[j * D + d]
                            acc = t if acc is None else acc + t
                        rows.append(
                            acc if acc is not None else jnp.zeros_like(eps[0])
                        )
                return jnp.stack(rows)
        lo_np = np.maximum(np.asarray(p.joint_limits.lower, np.float64), -2 * np.pi)
        hi_np = np.minimum(np.asarray(p.joint_limits.upper, np.float64), 2 * np.pi)

        def clip_x(x):
            # knot rows repeat the dof pattern: row r -> dof r % D. The
            # spline lives in the control-point convex hull, so clipping
            # knots to the joint box keeps the trajectory in bounds.
            return jnp.stack(
                [jnp.clip(x[r], lo_np[r % D], hi_np[r % D]) for r in range(nfD)]
            )

        def kernel(
            seed_ref, basis_ref, goal_ref, qs_ref, dt_ref, x_ref,
            dpair_ref, margin_ref, wc, ws, wp, wy,
            out_x, out_c, out_pe, out_re, out_fe, out_dt,
        ):
            pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
            goal = goal_ref[0]
            qs = qs_ref[0]
            dtv = dt_ref[0][0]
            refs = (wc, ws, wp, wy)
            dpair = dpair_ref[...]
            margin = margin_ref[...]

            def cost_fn(xx):
                return self._horizon_loop(
                    basis_ref, goal, qs, dtv, xx, refs, "cost",
                    dpair=dpair, margin=margin,
                )

            def cost_grad(xx):
                return self._horizon_loop(
                    basis_ref, goal, qs, dtv, xx, refs, "grad",
                    dpair=dpair, margin=margin,
                )

            x = x_ref[0]
            if mppi_iters > 0:
                x, _ = self._ik._mppi_loop(
                    cost_fn, clip_x, x, mppi_iters, n_particles,
                    init_std, std_decay, min_std, temperature, step_size,
                    eps_transform=eps_transform,
                )
            best_x, _ = self._ik._lbfgs_loop(
                cost_fn, clip_x, x, lbfgs_iters, history, max_step,
                n_linesearch, ls_base, ls_ratio, cost_grad=cost_grad,
            )
            cost, pe, re, fe, dt_ret = self._horizon_loop(
                basis_ref, goal, qs, dtv, best_x, refs, "metrics",
                dpair=dpair, margin=margin,
            )
            out_x[0] = best_x
            out_c[0] = cost
            out_pe[0] = pe
            out_re[0] = re
            out_fe[0] = fe
            out_dt[0] = dt_ret

        def solve(goal7, free, q_start, dtv, seed, world=None):
            NP = free.shape[0]
            gb, xb, qb, db, nb, Npad = self._traj_pack(goal7, free, q_start, dtv)
            seed_arr = jnp.asarray([seed], dtype=jnp.int32)
            c_spec = pl.BlockSpec((1, SUB, LANE), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
            x_spec = pl.BlockSpec((1, nfD, SUB, LANE), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM)
            c_shape = jax.ShapeDtypeStruct((nb, SUB, LANE), jnp.float32)
            x_shape = jax.ShapeDtypeStruct((nb, nfD, SUB, LANE), jnp.float32)
            out = pl.pallas_call(
                kernel,
                grid=(nb,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
                + self._traj_in_specs(nfD)
                + self._ik._world_specs(),
                out_specs=[x_spec, c_spec, c_spec, c_spec, c_spec, c_spec],
                out_shape=[x_shape, c_shape, c_shape, c_shape, c_shape, c_shape],
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024
                ),
            )(seed_arr, self._basis, gb, qb, db, xb, self._ik._D_pair,
              self._ik._margin, *self._world_args(world))
            xb_, cb, peb, reb, feb, dtb = out
            x = jnp.moveaxis(xb_, 1, -1).reshape(Npad, nfD)[:NP]
            flat = lambda a: a.reshape(Npad)[:NP]
            return x, flat(cb), flat(peb), flat(reb), flat(feb), flat(dtb)

        return solve
