"""Motion retargeter: track multi-link pose targets (teleop / mocap).

Parity: reference `MotionRetargeter` (`curobo/_src/motion/
motion_retargeter.py:56` — solve_frame/solve_sequence with global-IK,
local-IK and MPC modes, per-tool weighted `ToolPoseCriteria`).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from curobo_tpu.opt.lbfgs import LBFGSConfig, lbfgs_optimize
from curobo_tpu.robot import kinematics as kin_mod
from curobo_tpu.robot.params import KinematicsParams
from curobo_tpu.types.pose import Pose
from curobo_tpu.types.state import JointState


@dataclasses.dataclass(frozen=True)
class RetargetConfig:
    # per-tool (position_weight, rotation_weight); broadcast if single
    tool_weights: Tuple[Tuple[float, float], ...] = ((50.0, 10.0),)
    # smoothness regularization to the previous frame's solution
    smoothness_weight: float = 5.0
    null_space_weight: float = 0.05
    bound_weight: float = 1000.0
    self_collision_weight: float = 500.0
    lbfgs: LBFGSConfig = LBFGSConfig(history=8, n_iters=20, max_step=0.3)


class MotionRetargeter:
    """Local-IK retargeting: warm-started frame-to-frame tracking of
    multiple tool-frame targets (e.g. humanoid hands + head)."""

    def __init__(self, params: KinematicsParams, cfg: RetargetConfig = RetargetConfig()):
        self.params = params
        self.cfg = cfg
        self._solve_jit = jax.jit(self._solve_frame)

    def _cost(self, q, goal_pos, goal_quat, q_prev):
        p, cfg = self.params, self.cfg
        st = kin_mod.compute_kinematics(p, q)
        T = p.n_tools
        weights = cfg.tool_weights
        if len(weights) == 1:
            weights = weights * T
        cost = 0.0
        for t in range(T):
            dp = st.tool_pose.position[..., t, :] - goal_pos[..., t, :]
            from curobo_tpu.math import quaternion as qm

            dr = qm.quat_error(goal_quat[..., t, :], st.tool_pose.quaternion[..., t, :])
            wp, wr = weights[t]
            cost = cost + wp * jnp.sum(dp * dp, axis=-1) + wr * jnp.sum(dr * dr, axis=-1)
        # smoothness + retract + bounds + self collision
        cost = cost + cfg.smoothness_weight * jnp.sum((q - q_prev) ** 2, axis=-1)
        if cfg.null_space_weight > 0:
            dn = (q - p.retract_config) * p.null_space_weight
            cost = cost + cfg.null_space_weight * jnp.sum(dn * dn, axis=-1)
        lim = p.joint_limits
        viol = jnp.maximum(lim.lower - q, 0.0) + jnp.maximum(q - lim.upper, 0.0)
        cost = cost + cfg.bound_weight * jnp.sum(viol * viol, axis=-1)
        from curobo_tpu.geom.self_collision import self_collision_cost

        cost = cost + cfg.self_collision_weight * self_collision_cost(
            p.self_collision, st.spheres
        )
        return cost

    def _solve_frame(self, q_prev, goal_pos, goal_quat):
        cost = lambda q: self._cost(q, goal_pos, goal_quat, q_prev)
        q, c = lbfgs_optimize(cost, q_prev, self.cfg.lbfgs)
        return q, c

    # ------------------------------------------------------------------
    def solve_frame(
        self, goal_poses: Pose, q_prev: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """goal_poses batched (B, T) over the robot's tool frames;
        q_prev (B, D) warm start -> (q (B, D), cost (B,)).

        Parity: reference `solve_frame:122` (local-IK mode).
        """
        return self._solve_jit(q_prev, goal_poses.position, goal_poses.quaternion)

    def solve_sequence(
        self, goal_sequence: Pose, q0: jnp.ndarray
    ) -> JointState:
        """goal_sequence (F, T) pose sequence -> JointState trajectory (F, D).

        Parity: reference `solve_sequence:153` — frame-chained warm starts.
        """
        F = goal_sequence.position.shape[0]
        qs = []
        q = q0
        for f in range(F):
            frame = Pose(
                goal_sequence.position[f][None], goal_sequence.quaternion[f][None]
            )
            q, _ = self.solve_frame(frame, q[None] if q.ndim == 1 else q)
            q = q[0]
            qs.append(q)
        traj = jnp.stack(qs)
        return JointState.from_position(traj, self.params.joint_names)
