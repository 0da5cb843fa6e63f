"""Trajectory utilities: smoothing, resampling, execution buffering.

Parity: reference `curobo/_src/util/trajectory.py` (`linear_smooth`,
interpolation kinds), `util/trajectory_execution_manager.py:20`
(`TrajectoryExecutionManager` ring buffer) and `util/state_filter.py:45`
(`JointStateFilter`).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from curobo_tpu.types.state import JointState


def linear_resample(traj: JointState, n_out: int) -> JointState:
    """Arc-length-uniform linear resampling of a position trajectory."""
    q = traj.position  # (..., H, D)
    H = q.shape[-2]
    t_in = jnp.linspace(0.0, 1.0, H)
    t_out = jnp.linspace(0.0, 1.0, n_out)
    # vectorized interp over all leading axes + dof
    def interp_1d(col):  # (H,) -> (n_out,)
        return jnp.interp(t_out, t_in, col)

    flat = q.reshape(-1, H, q.shape[-1])
    out = jax.vmap(lambda traj_b: jax.vmap(interp_1d, in_axes=1, out_axes=1)(traj_b))(flat)
    out = out.reshape(q.shape[:-2] + (n_out, q.shape[-1]))
    dt = None
    if traj.dt is not None:
        dt = traj.dt * (H - 1) / max(n_out - 1, 1)
    return dataclasses.replace(
        JointState.from_position(out, traj.joint_names), dt=dt
    )


def linear_smooth(traj: JointState, window: int = 5, passes: int = 2) -> JointState:
    """Moving-average smoothing with pinned endpoints.

    Parity: reference `linear_smooth` (`util/trajectory.py:24`).
    """
    q = traj.position
    pad = window // 2
    kernel = jnp.ones(window) / window
    out = q
    for _ in range(passes):
        padded = jnp.concatenate(
            [
                jnp.repeat(out[..., :1, :], pad, axis=-2),
                out,
                jnp.repeat(out[..., -1:, :], pad, axis=-2),
            ],
            axis=-2,
        )
        sm = jnp.zeros_like(out)
        for k in range(window):
            sm = sm + kernel[k] * padded[..., k : k + q.shape[-2], :]
        # pin endpoints exactly
        sm = sm.at[..., 0, :].set(q[..., 0, :]).at[..., -1, :].set(q[..., -1, :])
        out = sm
    return dataclasses.replace(traj, position=out)


@dataclasses.dataclass
class JointStateFilter:
    """Exponential blend of measured vs commanded state (MPC input filter)."""

    alpha: float = 0.9  # weight on the new measurement
    state: Optional[JointState] = None

    def __call__(self, measured: JointState) -> JointState:
        if self.state is None:
            self.state = measured
            return measured
        a = self.alpha
        blended = JointState(
            position=a * measured.position + (1 - a) * self.state.position,
            velocity=(
                a * measured.velocity + (1 - a) * self.state.velocity
                if measured.velocity is not None and self.state.velocity is not None
                else measured.velocity
            ),
            joint_names=measured.joint_names,
        )
        self.state = blended
        return blended


class TrajectoryExecutionManager:
    """Ring buffer of commands ahead of execution (MPC -> robot bridge).

    Parity: reference `TrajectoryExecutionManager`
    (`util/trajectory_execution_manager.py:20`).
    """

    def __init__(self, control_dt: float, buffer_horizon: int = 8):
        self.control_dt = control_dt
        self.buffer_horizon = buffer_horizon
        self._plan: Optional[np.ndarray] = None  # (H, D) positions
        self._vel: Optional[np.ndarray] = None
        self._cursor = 0

    def update_plan(self, plan: JointState) -> None:
        """Accept a fresh MPC plan (B=1 or unbatched)."""
        q = np.asarray(plan.position)
        v = np.asarray(plan.velocity) if plan.velocity is not None else None
        if q.ndim == 3:
            q = q[0]
            v = v[0] if v is not None else None
        self._plan = q
        self._vel = v
        self._cursor = 1  # step 0 is the current state

    def next_command(self):
        """Pop the next (position, velocity) command; holds last when
        the buffer drains (safe behavior between MPC updates)."""
        if self._plan is None:
            raise RuntimeError("no plan set")
        i = min(self._cursor, len(self._plan) - 1, self.buffer_horizon)
        self._cursor += 1
        v = self._vel[i] if self._vel is not None else None
        return self._plan[i], v

    @property
    def steps_remaining(self) -> int:
        if self._plan is None:
            return 0
        return max(min(len(self._plan) - 1, self.buffer_horizon) - self._cursor + 1, 0)
