"""Batch motion planner: fixed-bucket vectorized planning over many problems.

Parity: reference `BatchMotionPlanner` (`curobo/_src/motion/
motion_planner_batch.py:38` — vectorized plan_pose/cspace over
max_batch_size with fallback goal substitution). Problems are planned in
fixed-size buckets (padded with copies of the first problem) so every
bucket reuses the same compiled solve regardless of the requested batch.
"""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from curobo_tpu.geom import world as world_mod
from curobo_tpu.motion.planner import MotionPlanConfig, MotionPlanner, MotionPlanResult
from curobo_tpu.types.pose import Pose
from curobo_tpu.types.state import JointState


class BatchMotionPlanner:
    def __init__(
        self,
        params,
        cfg: MotionPlanConfig = MotionPlanConfig(),
        max_batch_size: int = 64,
    ):
        self.planner = MotionPlanner(params, cfg)
        self.max_batch_size = max_batch_size

    @property
    def cfg(self):
        return self.planner.cfg

    def _pad(self, tree, n_pad):
        if n_pad == 0:
            return tree
        return jax.tree.map(
            lambda a: jnp.concatenate(
                [a, jnp.broadcast_to(a[:1], (n_pad,) + a.shape[1:])], axis=0
            ),
            tree,
        )

    def plan_pose(
        self,
        world: world_mod.WorldData,
        goal_poses: Pose,  # (B,) any B
        start_state: JointState,  # (B, D)
        key: Optional[jax.Array] = None,
    ) -> MotionPlanResult:
        B = goal_poses.position.shape[0]
        M = self.max_batch_size
        if key is None:
            key = jax.random.PRNGKey(0)

        chunks: List[MotionPlanResult] = []
        for i0 in range(0, B, M):
            i1 = min(i0 + M, B)
            n = i1 - i0
            pad = M - n
            goals_c = self._pad(goal_poses[i0:i1], pad)
            start_c = self._pad(start_state[i0:i1], pad)
            key, sub = jax.random.split(key)
            res = self.planner.plan_pose(world, goals_c, start_c, key=sub)
            chunks.append(jax.tree.map(lambda a: a[:n] if hasattr(a, "shape") and a.ndim >= 1 and a.shape[0] == M else a, res))

        if len(chunks) == 1:
            return chunks[0]
        # concatenate along the problem axis; interpolated horizons may
        # differ between chunks -> resample to the longest
        H = max(c.trajectory.position.shape[1] for c in chunks)

        def fix_traj(js: JointState) -> JointState:
            h = js.position.shape[1]
            if h == H:
                return js
            pad = H - h
            return js._map(
                lambda a: jnp.concatenate(
                    [a, jnp.broadcast_to(a[:, -1:], (a.shape[0], pad) + a.shape[2:])],
                    axis=1,
                )
            )

        def cat(field):
            vals = [getattr(c, field) for c in chunks]
            if isinstance(vals[0], JointState):
                vals = [fix_traj(v) for v in vals]
                return jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0), *vals)
            if isinstance(vals[0], (float, int)):
                return float(np.sum(vals))
            return jnp.concatenate(vals, axis=0)

        return MotionPlanResult(
            success=cat("success"),
            trajectory=cat("trajectory"),
            solver_trajectory=cat("solver_trajectory"),
            motion_time=cat("motion_time"),
            position_error=cat("position_error"),
            rotation_error=cat("rotation_error"),
            ik_success=cat("ik_success"),
            plan_time=cat("plan_time"),
        )
