"""JointState / RobotState pytrees.

API parity target: reference `curobo/_src/state/state_joint.py:66`
(`JointState`) and `state_robot.py:168` (`RobotState`). Joint names are
static pytree metadata so reordering compiles away under jit.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from curobo_tpu.types.pose import Pose


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class JointState:
    """Batched joint-space state / trajectory.

    All arrays share leading shape (..., dof); a trajectory adds a horizon
    axis: (..., horizon, dof). ``dt`` is a per-problem timestep (...,) used
    by retiming-aware costs.
    """

    position: jnp.ndarray
    velocity: Optional[jnp.ndarray] = None
    acceleration: Optional[jnp.ndarray] = None
    jerk: Optional[jnp.ndarray] = None
    dt: Optional[jnp.ndarray] = None
    joint_names: Tuple[str, ...] = dataclasses.field(
        default=(), metadata=dict(static=True)
    )

    # ---- constructors -------------------------------------------------
    @staticmethod
    def from_position(position: jnp.ndarray, joint_names: Sequence[str] = ()) -> "JointState":
        return JointState(
            position=position,
            velocity=jnp.zeros_like(position),
            acceleration=jnp.zeros_like(position),
            jerk=jnp.zeros_like(position),
            joint_names=tuple(joint_names),
        )

    @staticmethod
    def zeros(shape, joint_names: Sequence[str] = (), dtype=jnp.float32) -> "JointState":
        z = jnp.zeros(shape, dtype=dtype)
        return JointState.from_position(z, joint_names)

    # ---- shape --------------------------------------------------------
    @property
    def dof(self) -> int:
        return self.position.shape[-1]

    @property
    def shape(self):
        return self.position.shape

    def _map(self, fn) -> "JointState":
        return JointState(
            position=fn(self.position),
            velocity=None if self.velocity is None else fn(self.velocity),
            acceleration=None if self.acceleration is None else fn(self.acceleration),
            jerk=None if self.jerk is None else fn(self.jerk),
            dt=self.dt,
            joint_names=self.joint_names,
        )

    def reshape(self, *shape) -> "JointState":
        return self._map(lambda a: a.reshape(shape))

    def __getitem__(self, idx) -> "JointState":
        return self._map(lambda a: a[idx])

    def tile_seeds(self, n_seeds: int) -> "JointState":
        """(B, ..., dof) -> (B, n_seeds, ..., dof)."""
        def tile(a):
            return jnp.broadcast_to(a[:, None], (a.shape[0], n_seeds) + a.shape[1:])
        return self._map(tile)

    # ---- name-based reordering (static; resolved at trace time) -------
    def reorder(self, joint_names: Sequence[str]) -> "JointState":
        """Return a state with columns permuted to match ``joint_names``."""
        if tuple(joint_names) == self.joint_names:
            return self
        if not self.joint_names:
            raise ValueError("JointState has no joint_names to reorder by")
        missing = [n for n in joint_names if n not in self.joint_names]
        if missing:
            raise ValueError(
                f"joints {missing} not in JointState (has {list(self.joint_names)})"
            )
        idx = [self.joint_names.index(n) for n in joint_names]
        out = self._map(lambda a: a[..., idx])
        return dataclasses.replace(out, joint_names=tuple(joint_names))

    def select_joints(self, joint_names: Sequence[str]) -> "JointState":
        return self.reorder(joint_names)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class RobotState:
    """Full robot state: joint state + derived task-space quantities.

    Parity: reference `curobo/_src/state/state_robot.py:168`.
    """

    joint_state: JointState
    tool_poses: Optional[Pose] = None  # (..., n_tools) batched pose
    robot_spheres: Optional[jnp.ndarray] = None  # (..., n_spheres, 4) xyzr
    link_poses: Optional[Pose] = None  # (..., n_links)
    torque: Optional[jnp.ndarray] = None  # (..., dof)
