"""Batched Levenberg-Marquardt step + LM seed-IK solver.

Parity: reference `LevenbergMarquardtStep`
(`curobo/_src/optim/util/levenberg_marquardt_step.py:15,77`) and
`SeedIKSolver` (`solver/seed_ik/seed_ik_solver.py:48`) — batched LM
iterations on the pose residual using analytic Jacobians, used to warm-start
the main IK optimizer.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from curobo_tpu.math import quaternion as qm
from curobo_tpu.robot import kinematics as kin_mod
from curobo_tpu.robot.params import KinematicsParams
from curobo_tpu.types.pose import Pose


@dataclasses.dataclass(frozen=True)
class LMConfig:
    n_iters: int = 20
    damping: float = 1e-3
    # adaptive damping multipliers
    damping_up: float = 2.0
    damping_down: float = 0.5
    step_clip: float = 0.5
    position_weight: float = 1.0
    rotation_weight: float = 0.5


def lm_step(
    J: jnp.ndarray,  # (..., R, D) residual Jacobian
    r: jnp.ndarray,  # (..., R) residuals
    damping: jnp.ndarray,  # (...,)
) -> jnp.ndarray:
    """One damped Gauss-Newton (LM) step via batched Cholesky solve.

    Returns delta (..., D) minimizing |J d + r|^2 + damping |d|^2.

    When the residual dim R < D (redundant robots: G1 is R=24 vs D=49),
    the mathematically identical dual form is used:
        (J^T J + l I)^-1 J^T = J^T (J J^T + l I)^-1
    so the Cholesky factors an (R, R) matrix instead of (D, D) — ~8x
    less factorization work, and batched small-matrix Cholesky is the
    serial part of the LM stage on TPU.
    """
    D = J.shape[-1]
    R = J.shape[-2]
    if R < D:
        JJt = jnp.einsum("...ri,...si->...rs", J, J)
        A = JJt + damping[..., None, None] * jnp.eye(R, dtype=J.dtype)
        L = jnp.linalg.cholesky(A)
        y = jax.scipy.linalg.cho_solve((L, True), r[..., None])[..., 0]
        return -jnp.einsum("...ri,...r->...i", J, y)
    JtJ = jnp.einsum("...ri,...rj->...ij", J, J)
    A = JtJ + damping[..., None, None] * jnp.eye(D, dtype=J.dtype)
    b = -jnp.einsum("...ri,...r->...i", J, r)
    L = jnp.linalg.cholesky(A)
    return jax.scipy.linalg.cho_solve((L, True), b[..., None])[..., 0]


class SeedIK:
    """LM warm-seed IK: fast pose-only convergence, no collision terms."""

    def __init__(self, params: KinematicsParams, cfg: LMConfig = LMConfig()):
        self.params = params
        self.cfg = cfg
        self._solve_jit = jax.jit(self._solve)

    def _residual_and_jac(self, q, goal_pos, goal_quat):
        """goal_pos (..., T, 3) / goal_quat (..., T, 4) over ALL tool
        frames — multi-tool residual (T*6,) like the reference's
        multi-link seed solve (`seed_ik_solver.py:48` with
        `override_iters_for_multi_link_ik`). Single-tool callers pass
        T=1."""
        p = self.params
        st = kin_mod.compute_kinematics(p, q, compute_jacobian=True)
        D = q.shape[-1]
        T = goal_pos.shape[-2]
        dp = (st.tool_pose.position - goal_pos) * self.cfg.position_weight
        dr = (
            qm.quat_error(goal_quat, st.tool_pose.quaternion)
            * self.cfg.rotation_weight
        )  # (..., T, 3)
        r = jnp.concatenate([dp, dr], axis=-1)  # (..., T, 6)
        J = st.jacobian  # (..., T, 6, D)
        # The rotation residual is the log-map error expressed in the GOAL
        # frame; the angular-velocity Jacobian rows are world-frame omega.
        # Rotate them: J_rot ~= R_goal^T J_w (small-error right-Jacobian
        # approximation — damping absorbs the rest).
        Rg = qm.quat_to_matrix(goal_quat)  # (..., T, 3, 3)
        J_rot = jnp.einsum("...ji,...jd->...id", Rg, J[..., 3:, :])
        J = jnp.concatenate([J[..., :3, :], J_rot], axis=-2)
        W = jnp.concatenate(
            [
                jnp.full((3,), self.cfg.position_weight, q.dtype),
                jnp.full((3,), self.cfg.rotation_weight, q.dtype),
            ]
        )
        J = J * W[:, None]
        # fold tool frames into one residual stack: (..., T*6[, D])
        lead = r.shape[:-2]
        return r.reshape(lead + (T * 6,)), J.reshape(lead + (T * 6, D))

    def _residual_only(self, q, goal_pos, goal_quat):
        """Residual without the Jacobian — the LM acceptance check needs
        only the cost, and the Jacobian is the expensive half of the
        iteration at humanoid scale (49 dof x 4 tools x 12.8k configs)."""
        p = self.params
        st = kin_mod.compute_kinematics(p, q)
        T = goal_pos.shape[-2]
        dp = (st.tool_pose.position - goal_pos) * self.cfg.position_weight
        dr = (
            qm.quat_error(goal_quat, st.tool_pose.quaternion)
            * self.cfg.rotation_weight
        )
        r = jnp.concatenate([dp, dr], axis=-1)
        return r.reshape(r.shape[:-2] + (T * 6,))

    def _solve(self, q0, goal_pos, goal_quat):
        p = self.params
        cfg = self.cfg
        lo, hi = p.joint_limits.lower, p.joint_limits.upper

        def body(i, carry):
            q, damping, best_q, best_c = carry
            r, J = self._residual_and_jac(q, goal_pos, goal_quat)
            c = jnp.sum(r * r, axis=-1)
            d = lm_step(J, r, damping)
            dn = jnp.max(jnp.abs(d), axis=-1, keepdims=True)
            d = d * jnp.minimum(1.0, cfg.step_clip / jnp.maximum(dn, 1e-9))
            q_new = jnp.clip(q + d, lo, hi)
            r2 = self._residual_only(q_new, goal_pos, goal_quat)
            c_new = jnp.sum(r2 * r2, axis=-1)
            improved = c_new < c
            q = jnp.where(improved[..., None], q_new, q)
            damping = jnp.where(
                improved, damping * cfg.damping_down, damping * cfg.damping_up
            )
            damping = jnp.clip(damping, 1e-6, 1e3)
            better = c_new < best_c
            best_q = jnp.where(better[..., None], q_new, best_q)
            best_c = jnp.minimum(best_c, c_new)
            return q, damping, best_q, best_c

        damping0 = jnp.full(q0.shape[:-1], cfg.damping, q0.dtype)
        r0 = self._residual_only(q0, goal_pos, goal_quat)
        c0 = jnp.sum(r0 * r0, axis=-1)
        carry = (q0, damping0, q0, c0)
        _, _, best_q, best_c = jax.lax.fori_loop(0, cfg.n_iters, body, carry)
        return best_q, best_c

    def solve(self, goal_pose: Pose, q0: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """goal_pose batch (...,) or (..., T), q0 (..., D) ->
        (q (..., D), sq-residual (...,))."""
        gp, gq = goal_pose.position, goal_pose.quaternion
        if gp.ndim == q0.ndim:  # no tool axis: single-tool caller
            gp, gq = gp[..., None, :], gq[..., None, :]
        return self._solve_jit(q0, gp, gq)
