"""Pallas trajectory mega-kernel: B-spline rollout cost + gradient — and the
whole trajopt/MPC optimizer loop — inside single TPU kernels.

The trajopt/MPC objective is sum_h f(q_h, qdot_h, ...) with q_h linear in
the control points (q_h = B0[h] @ ctrl, derivatives via B1..B3 scaled by the
trajectory duration). Because the spline map is LINEAR, the backward pass
through it is an analytic basis-weighted accumulation:

    dcost/dctrl[c] = sum_h  B0[h,c] * df/dq_h  +  B1[h,c]/T * df/dv_h + ...

and the kernel maps the HORIZON ONTO THE LANE AXIS (lane = (problem-slot,
step)): one `_step_cost` pass evaluates every step of every slot at once —
no per-step loop at all — with per-problem reductions (cost sum, terminal
metrics, the basis-weighted control-point gradient) as lane-group matmuls
on the MXU. No stacked residuals, VMEM stays flat (the Mosaic no-remat /
no-scan limitation never arises), and a B=1 solve no longer serializes H
fully-lane-parallel steps (the old per-step fori_loop measured ~1.04 s per
solver round at B=1 x 4 seeds; lanes were 0.4% utilized).

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
    # pin the spline's far end to a per-problem goal config (q_end kernel
    # input): the terminal state is EXACTLY the IK solution (and at rest —
    # N_PIN repeated end knots zero the end velocity/acceleration), so
    # terminal pose error is the IK solver's, not an optimizer equilibrium.
    # Reference analog: finetune_trajopt's pose-boosted polish; this is
    # stronger (exact) and removes 2*N_PIN*D free variables.
    pin_goal: bool = False

    @property
    def n_free(self) -> int:
        return (
            self.bspline.n_free_cspace if self.pin_goal else self.bspline.n_free
        )

    def __post_init__(self):
        p = self.params
        # reuse the IK kernel's world tables + pair tables + loop helpers
        self._ik = PallasIKCost(p, self.cfg, self.world)
        H = self.bspline.horizon
        n_ctrl = self.bspline.n_control
        if H > LANE:
            raise ValueError(f"horizon {H} exceeds the lane width {LANE}")
        B0, B1, B2, B3 = _basis_matrices(self.bspline.n_control,
                                         self.bspline.degree, H)

        # ---- lane-horizon layout ---------------------------------------
        # The horizon lives on the LANE axis: lane l = (slot, h) with
        # h = l % h_pad. One kernel eval computes EVERY step of every
        # problem-slot at once — the old per-step fori_loop serialized 32
        # fully-lane-parallel computations (at B=1 x 4 seeds only 4 of
        # 1024 lanes were live; measured 1.04 s per trajopt round).
        # Per-problem reductions (cost sum, terminal metrics, gradient
        # basis application) are LANE-group matmuls on the MXU (G below).
        self._h_pad = hp = max(1 << (H - 1).bit_length(), 8)
        self._slots = slots = LANE // hp
        self._cap = SUB * slots  # problems x seeds per block

        lanes = np.arange(LANE)
        hpos = lanes % hp
        live = hpos < H
        hidx = np.minimum(hpos, H - 1)
        hprev = np.maximum(hidx - 1, 0)
        n_tbl = 2 + 5 * n_ctrl
        tbl = np.zeros((n_tbl, LANE), np.float32)
        tbl[0] = live.astype(np.float32)  # valid
        tbl[1] = (hpos == H - 1).astype(np.float32)  # is_term
        for c in range(n_ctrl):
            tbl[2 + c] = np.where(live, B0[hidx, c], 0.0)
            tbl[2 + n_ctrl + c] = np.where(live, B0[hprev, c], 0.0)
            tbl[2 + 2 * n_ctrl + c] = np.where(live, B1[hidx, c], 0.0)
            tbl[2 + 3 * n_ctrl + c] = np.where(live, B2[hidx, c], 0.0)
            tbl[2 + 4 * n_ctrl + c] = np.where(live, B3[hidx, c], 0.0)
        self._lane_tbl = jnp.asarray(tbl)
        # same-slot indicator: group reductions as one (LANE, LANE) matmul
        G = (lanes[:, None] // hp == lanes[None, :] // hp)
        self._G = jnp.asarray(G.astype(np.float32))
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
    def _group_sum(self, x, G):
        """Per-slot lane reduction as ONE MXU matmul: every lane of a slot
        receives the sum over that slot's lanes. x (..., SUB, LANE)."""
        shp = x.shape
        x2 = x.reshape((-1, LANE))
        return jnp.dot(x2, G, preferred_element_type=jnp.float32).reshape(shp)

    def _group_max(self, x, G):
        """Per-slot lane MAX, replicated to every lane of the slot: a
        log2(h_pad) roll+select tree (suffix max lands on each slot's
        leader lane) + one `_group_sum` broadcast. x (SUB, LANE), >= 0."""
        hp = self._h_pad
        lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
        hpos = lane % hp
        m = x
        s = hp // 2
        while s >= 1:
            r = jnp.roll(m, -s, axis=-1)
            m = jnp.where(hpos + s < hp, jnp.maximum(m, r), m)
            s //= 2
        lead = (hpos == 0).astype(x.dtype)
        return self._group_sum(m * lead, G)

    def _lane_eval(self, tbl, G, goal, qs, qe, dtv, x, refs, mode,
                   dpair=None, margin=None):
        """Whole-horizon evaluation in the lane-horizon layout (see
        `__post_init__`): every lane is one (problem-slot, step) pair, so
        ONE `_step_cost` pass covers the full horizon of every slot — no
        per-step loop. All returned per-problem values are REPLICATED
        across each slot's h-lanes (via `_group_sum`), so the in-kernel
        optimizer loops run unchanged on the replicated layout.

        tbl: (n_tbl, LANE) lane tables; G: (LANE, LANE) slot indicator;
        x: (n_free*D, SUB, LANE) h-replicated knots.

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
        valid = tbl[0].reshape(1, LANE) * jnp.ones((SUB, 1), jnp.float32)
        is_term = tbl[1].reshape(1, LANE) * jnp.ones((SUB, 1), jnp.float32)

        # control points: pinned start (N_PIN copies) + free knots
        # (+ pinned goal when pin_goal: terminal config exactly q_end,
        # terminal velocity/acceleration exactly zero)
        parts = [jnp.concatenate([qs] * N_PIN, axis=0), x]
        if self.pin_goal:
            parts.append(jnp.concatenate([qe] * N_PIN, axis=0))
        ctrl = jnp.concatenate(parts, axis=0)  # (n_ctrl*D, SUB, LANE)

        def comb(base):
            """Basis-combine ctrl rows with per-lane table weights:
            (D, SUB, LANE) state at each lane's own step."""
            rows = []
            for d in range(D):
                acc = None
                for c in range(n_ctrl):
                    w = tbl[base + c].reshape(1, LANE)
                    t = w * ctrl[c * D + d]
                    acc = t if acc is None else acc + t
                rows.append(acc)
            return jnp.stack(rows)

        def lane_states():
            q_h = comb(2)
            q_p = comb(2 + n_ctrl)
            v_h = comb(2 + 2 * n_ctrl) * invT
            a_h = comb(2 + 3 * n_ctrl) * invT * invT
            j_h = comb(2 + 4 * n_ctrl) * invT * invT * invT
            return q_p, q_h, v_h, a_h, j_h

        if mode == "grad":
            q_p, q_h, v_h, a_h, j_h = lane_states()
            (c_l, IX, IY, IZ, SPD), vjp = jax.vjp(
                lambda qp, qq, vv, aa, jj: self._step_cost(
                    qp, qq, vv, aa, jj, goal, is_term, run_w,
                    dpair=dpair, margin=margin,
                ),
                q_p, q_h, v_h, a_h, j_h,
            )
            scene_c, (ctx, cty, ctz, ctspd), _ = self._swept_scene(
                refs, IX, IY, IZ, SPD, want_grad=True
            )
            # dead (h >= H) lanes contribute nothing: the cost cotangent
            # IS the valid mask, and the scene cotangents are masked
            g_qp, g_qh, g_v, g_a, g_j = vjp(
                (valid, ctx * valid, cty * valid, ctz * valid, ctspd * valid)
            )
            cost = self._group_sum((c_l + scene_c) * valid, G)

            # analytic spline backward: dctrl[c] = sum_h B[h, c] * g[h] —
            # per-lane basis weights then ONE slot-sum matmul for all rows
            g_v = g_v * invT
            g_a = g_a * invT * invT
            g_j = g_j * invT * invT * invT
            pre_rows = []
            for c in range(n_ctrl):
                b0h = tbl[2 + c].reshape(1, 1, LANE)
                b0p = tbl[2 + n_ctrl + c].reshape(1, 1, LANE)
                b1h = tbl[2 + 2 * n_ctrl + c].reshape(1, 1, LANE)
                b2h = tbl[2 + 3 * n_ctrl + c].reshape(1, 1, LANE)
                b3h = tbl[2 + 4 * n_ctrl + c].reshape(1, 1, LANE)
                pre_rows.append(
                    b0h * g_qh + b0p * g_qp
                    + b1h * g_v + b2h * g_a + b3h * g_j
                )  # (D, SUB, LANE)
            grad_full = self._group_sum(jnp.concatenate(pre_rows, axis=0), G)
            # only the free-knot slice flows back (pinned rows are constants)
            n_free_rows = x.shape[0]
            return cost, grad_full[N_PIN * D : N_PIN * D + n_free_rows]

        if mode == "cost":
            q_p, q_h, v_h, a_h, j_h = lane_states()
            c_l, IX, IY, IZ, SPD = self._step_cost(
                q_p, q_h, v_h, a_h, j_h, goal, is_term, run_w,
                dpair=dpair, margin=margin,
            )
            scene_c, _, _ = self._swept_scene(
                refs, IX, IY, IZ, SPD, want_grad=False
            )
            return self._group_sum((c_l + scene_c) * valid, G)

        # mode == "metrics": forward pass with feasibility + retiming stats
        lim = p.joint_limits
        vl = np.asarray(lim.velocity, np.float64)
        al = np.asarray(lim.acceleration, np.float64)
        jl = np.asarray(lim.jerk, np.float64)

        q_p, q_h, v_h, a_h, j_h = lane_states()
        c_l, IX, IY, IZ, SPD, pe2_l, re2_l, sviol_l, oob_l = self._step_cost(
            q_p, q_h, v_h, a_h, j_h, goal, is_term, run_w,
            dpair=dpair, margin=margin, with_metrics=True,
        )
        scene_c, _, clear_l = self._swept_scene(
            refs, IX, IY, IZ, SPD, want_grad=False, want_clear=True
        )
        cost = self._group_sum((c_l + scene_c) * valid, G)
        # terminal-step pose errors (the is_term lane is unique per slot)
        pe2 = self._group_sum(pe2_l * is_term, G)
        re2 = self._group_sum(re2_l * is_term, G)
        pos_err = jnp.sqrt(jnp.maximum(pe2, 1e-16))
        rot_err = jnp.sqrt(jnp.maximum(re2, 1e-16))
        bad = (
            (clear_l < 0.0) | (sviol_l > 0.0) | (oob_l > 0.5)
        ).astype(jnp.float32) * valid
        feasible = (self._group_sum(bad, G) < 0.5).astype(jnp.float32)
        # retiming ratios (solver `_retime_dt` parity): per-lane max over
        # dofs, then per-slot max over the h-lanes
        z = jnp.zeros((SUB, LANE), jnp.float32)
        rv, ra, rj = z, z, z
        for d in range(D):
            rv = jnp.maximum(rv, jnp.abs(v_h[d]) / vl[d])
            ra = jnp.maximum(ra, jnp.abs(a_h[d]) / al[d])
            rj = jnp.maximum(rj, jnp.abs(j_h[d]) / jl[d])
        rv = self._group_max(rv * valid, G)
        ra = self._group_max(ra * valid, G)
        rj = self._group_max(rj * valid, G)
        # cbrt via exp/log (no cbrt primitive in Mosaic); rj >= 0
        cbrt_rj = jnp.exp(jnp.log(jnp.maximum(rj, 1e-12)) / 3.0)
        scale = jnp.maximum(rv, jnp.maximum(jnp.sqrt(ra), cbrt_rj))
        dt_ret = dtv * scale * 1.01  # caller clips to [min_dt, max_dt]
        return cost, pos_err, rot_err, feasible, dt_ret

    # ------------------------------------------------------------------
    def _traj_in_specs(self, n_free_D):
        D = self.params.n_dof
        n_tbl = self._lane_tbl.shape[0]
        Ppad = self._ik._D_pair.shape[0]
        S_n = self.params.n_spheres
        return [
            pl.BlockSpec((n_tbl, LANE), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((LANE, LANE), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 7, SUB, LANE), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D, SUB, LANE), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D, SUB, LANE), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, SUB, LANE), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_free_D, SUB, LANE), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Ppad, S_n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Ppad, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ]

    def _traj_pack(self, goal7, free, q_start, q_end, dtv):
        """Pack problem rows into the lane-horizon layout: each problem
        slot's values REPLICATE across its h_pad lanes."""
        D = self.params.n_dof
        n_free = self.n_free
        hp, slots, cap = self._h_pad, self._slots, self._cap
        NP = free.shape[0]
        nb = max((NP + cap - 1) // cap, 1)
        Npad = nb * cap

        def pad(a, feat, pad_row=None):
            out = jnp.zeros((Npad, feat), a.dtype).at[:NP].set(a)
            if pad_row is not None:
                out = out.at[NP:].set(jnp.asarray(pad_row, a.dtype))
            out = out.reshape(nb, SUB, slots, 1, feat)
            out = jnp.broadcast_to(out, (nb, SUB, slots, hp, feat))
            return jnp.moveaxis(out.reshape(nb, SUB, LANE, feat), -1, 1)

        # padded rows get identity quaternions / safe dt so the quat and
        # 1/T math stays well-defined on dead lanes
        gb = pad(goal7, 7, pad_row=[0, 0, 0, 1, 0, 0, 0])
        xb = pad(free, n_free * D)
        qb = pad(q_start, D)
        if self.pin_goal and q_end is None:
            # silently pinning the far end to q_start would "solve" every
            # problem with a trajectory that returns home (ADVICE r4 #5)
            raise ValueError(
                "pin_goal=True requires q_end (the goal config to pin the "
                "spline's terminal state to); got q_end=None"
            )
        eb = pad(q_start if q_end is None else q_end, D)
        db = pad(jnp.maximum(dtv, 1e-4)[:, None], 1, pad_row=[0.02])
        return gb, xb, qb, eb, db, nb, Npad

    def _unpack_rows(self, a, nb, Npad, NP):
        """(nb, SUB, LANE) or (nb, feat, SUB, LANE) h-replicated block
        outputs -> per-problem rows (the h=0 lane of each slot)."""
        hp, slots = self._h_pad, self._slots
        if a.ndim == 3:
            return a.reshape(nb, SUB, slots, hp)[..., 0].reshape(Npad)[:NP]
        feat = a.shape[1]
        a = jnp.moveaxis(a, 1, -1)  # (nb, SUB, LANE, feat)
        return a.reshape(nb, SUB, slots, hp, feat)[..., 0, :].reshape(
            Npad, feat
        )[:NP]

    def _build(self):
        D = self.params.n_dof
        H = self.bspline.horizon
        n_ctrl = self.bspline.n_control
        n_free = self.n_free

        def kernel(
            tbl_ref, g_ref, goal_ref, qs_ref, qe_ref, dt_ref, x_ref,
            dpair_ref, margin_ref, wc, ws, wp, wy, cost_ref, grad_ref,
        ):
            cost, grad = self._lane_eval(
                tbl_ref[...], g_ref[...], goal_ref[0], qs_ref[0], qe_ref[0],
                dt_ref[0][0], x_ref[0], (wc, ws, wp, wy),
                "grad", dpair=dpair_ref[...], margin=margin_ref[...],
            )
            cost_ref[0] = cost
            grad_ref[0] = grad

        def call(goal7, free, q_start, dtv, world=None, q_end=None):
            NP = free.shape[0]
            gb, xb, qb, eb, db, nb, Npad = self._traj_pack(
                goal7, free, q_start, q_end, dtv
            )
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
            )(self._lane_tbl, self._G, gb, qb, eb, db, xb,
              self._ik._D_pair, self._ik._margin, *self._world_args(world))
            c = self._unpack_rows(cost, nb, Npad, NP)
            g = self._unpack_rows(grad, nb, Npad, NP)
            return c, g

        return call

    def _world_args(self, world):
        from curobo_tpu.ops.pallas_ik import pack_world_arrays

        return pack_world_arrays(self.world if world is None else world)

    def __call__(self, goal7, free, q_start, dtv, world=None, q_end=None):
        return self._call(goal7, free, q_start, dtv, world, q_end)

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
        n_free = self.n_free
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
        lo_np, hi_np = p.dof_clip_bounds()

        def clip_x(x):
            # knot rows repeat the dof pattern: row r -> dof r % D. The
            # spline lives in the control-point convex hull, so clipping
            # knots to the joint box keeps the trajectory in bounds.
            return jnp.stack(
                [jnp.clip(x[r], lo_np[r % D], hi_np[r % D]) for r in range(nfD)]
            )

        def kernel(
            seed_ref, tbl_ref, g_ref, goal_ref, qs_ref, qe_ref, dt_ref, x_ref,
            dpair_ref, margin_ref, wc, ws, wp, wy,
            out_x, out_c, out_pe, out_re, out_fe, out_dt,
        ):
            pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
            tbl = tbl_ref[...]
            G = g_ref[...]
            goal = goal_ref[0]
            qs = qs_ref[0]
            qe = qe_ref[0]
            dtv = dt_ref[0][0]
            refs = (wc, ws, wp, wy)
            dpair = dpair_ref[...]
            margin = margin_ref[...]

            def cost_fn(xx):
                return self._lane_eval(
                    tbl, G, goal, qs, qe, dtv, xx, refs, "cost",
                    dpair=dpair, margin=margin,
                )

            def cost_grad(xx):
                return self._lane_eval(
                    tbl, G, goal, qs, qe, dtv, xx, refs, "grad",
                    dpair=dpair, margin=margin,
                )

            # MPPI noise must be IDENTICAL across a slot's h-lanes (the
            # optimizer state is h-replicated): broadcast each slot
            # leader's draw via the slot-sum matmul, then the optional
            # STOMP knot smoothing
            lead = (
                jax.lax.broadcasted_iota(jnp.int32, (SUB, LANE), 1)
                % self._h_pad == 0
            ).astype(jnp.float32)

            def eps_rep(eps):
                eps = self._group_sum(eps * lead, G)
                return eps_transform(eps) if eps_transform is not None else eps

            x = x_ref[0]
            if mppi_iters > 0:
                x, _ = self._ik._mppi_loop(
                    cost_fn, clip_x, x, mppi_iters, n_particles,
                    init_std, std_decay, min_std, temperature, step_size,
                    eps_transform=eps_rep,
                )
            best_x, _ = self._ik._lbfgs_loop(
                cost_fn, clip_x, x, lbfgs_iters, history, max_step,
                n_linesearch, ls_base, ls_ratio, cost_grad=cost_grad,
            )
            cost, pe, re, fe, dt_ret = self._lane_eval(
                tbl, G, goal, qs, qe, dtv, best_x, refs, "metrics",
                dpair=dpair, margin=margin,
            )
            out_x[0] = best_x
            out_c[0] = cost
            out_pe[0] = pe
            out_re[0] = re
            out_fe[0] = fe
            out_dt[0] = dt_ret

        def solve(goal7, free, q_start, dtv, seed, world=None, q_end=None):
            NP = free.shape[0]
            gb, xb, qb, eb, db, nb, Npad = self._traj_pack(
                goal7, free, q_start, q_end, dtv
            )
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
            )(seed_arr, self._lane_tbl, self._G, gb, qb, eb, db, xb,
              self._ik._D_pair, self._ik._margin, *self._world_args(world))
            xb_, cb, peb, reb, feb, dtb = out
            x = self._unpack_rows(xb_, nb, Npad, NP)
            flat = lambda a: self._unpack_rows(a, nb, Npad, NP)
            return x, flat(cb), flat(peb), flat(reb), flat(feb), flat(dtb)

        return solve
