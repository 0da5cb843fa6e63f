"""Per-tool pose goal criteria.

Parity: reference `ToolPoseCriteria` (`curobo/_src/cost/tool_pose_criteria.py:18`)
and named multi-link `ToolPose`/`GoalToolPose` (`types/tool_pose.py:23,183`).
TPU redesign: instead of per-link python objects consulted inside the cost,
criteria stack into two dense arrays — (T, 6) axis weight factors and
(T, 2) convergence tolerances — that ride on the `Goal` pytree and
broadcast straight into the batched pose cost (`cost/terms.py:pose_error`).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class ToolPoseCriteria:
    """How one tool frame's pose error enters the objective.

    pose_axes_weight_factor: 6 scale factors (x, y, z position axes then 3
    rotation-vector axes), multiplied with the rollout's pose weights.
    convergence_tolerance: (position m, rotation rad) slack subtracted from
    the reported error before threshold checks — a tool within tolerance
    counts as exactly on-goal.
    """

    pose_axes_weight_factor: Tuple[float, ...] = (1.0,) * 6
    convergence_tolerance: Tuple[float, float] = (0.0, 0.0)

    def __post_init__(self):
        if len(self.pose_axes_weight_factor) != 6:
            raise ValueError(
                f"pose_axes_weight_factor needs 6 floats, got "
                f"{self.pose_axes_weight_factor}"
            )
        if len(self.convergence_tolerance) != 2:
            raise ValueError(
                f"convergence_tolerance needs 2 floats, got "
                f"{self.convergence_tolerance}"
            )

    @staticmethod
    def disabled() -> "ToolPoseCriteria":
        """A tool whose pose does not matter (weight zero, infinite slack)."""
        return ToolPoseCriteria(
            pose_axes_weight_factor=(0.0,) * 6,
            convergence_tolerance=(float(np.inf), float(np.inf)),
        )


def stack_criteria(
    criteria: Sequence[ToolPoseCriteria],
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Stack per-tool criteria -> (tool_weight (T, 6), tool_tolerance (T, 2))
    ready for `Goal`/`pose_error` (reference `StackedToolPoseCriteria`,
    `cost/tool_pose_criteria.py:218`)."""
    w = np.asarray([c.pose_axes_weight_factor for c in criteria], np.float32)
    tol = np.asarray([c.convergence_tolerance for c in criteria], np.float32)
    return jnp.asarray(w), jnp.asarray(tol)


def criteria_for_tools(
    tool_names: Sequence[str],
    by_name: Dict[str, ToolPoseCriteria],
    default: Optional[ToolPoseCriteria] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Resolve a name-keyed criteria dict against the robot's tool-frame
    order (unnamed tools get ``default``, or neutral criteria)."""
    default = default or ToolPoseCriteria()
    return stack_criteria([by_name.get(n, default) for n in tool_names])
