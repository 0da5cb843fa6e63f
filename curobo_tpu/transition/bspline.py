"""Clamped B-spline trajectory parameterization (knots -> dense trajectory).

Parity: reference B-spline CUDA kernels
(`curobo/_src/curobolib/kernels/trajectory/bspline/bspline_kernel.cuh:22`,
boundary constraints `bspline_boundary_constraint.cuh`, wrapper
`cuda_ops/trajectory.py:299` `BSplineIdxKernel`, strategy
`StateFromBSplineKnot`, `transition/fns_state_transition.py:310`).

TPU design (SURVEY §7 step 4): basis evaluation is precomputed on the host
(Cox-de Boor via scipy) into dense (H x n_ctrl) matrices for value/vel/acc/
jerk; trajectory evaluation is then a single MXU matmul per derivative, and
the analytic-gradient CUDA backward becomes autodiff through the matmul.
Boundary conditions pin the first 3 control points to the start state
(pos/vel/acc = q0/0/0), optionally the last 3 to a goal state.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np
from scipy.interpolate import BSpline as ScipyBSpline

from curobo_tpu.types.state import JointState

N_PIN = 3  # control points pinned at each constrained end (pos/vel/acc)


@functools.lru_cache(maxsize=64)
def _basis_matrices(
    n_ctrl: int, degree: int, horizon: int
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """(B0, B1, B2, B3): (H, n_ctrl) basis value/1st/2nd/3rd-derivative
    matrices for a clamped uniform B-spline on t in [0, 1]."""
    if n_ctrl <= degree:
        raise ValueError(f"n_ctrl ({n_ctrl}) must exceed degree ({degree})")
    n_interior = n_ctrl - degree - 1
    knots = np.concatenate(
        [
            np.zeros(degree + 1),
            (np.arange(1, n_interior + 1)) / (n_interior + 1),
            np.ones(degree + 1),
        ]
    )
    ts = np.linspace(0.0, 1.0, horizon)
    # clamp the right endpoint inside the domain for derivative evaluation
    ts_eval = np.minimum(ts, 1.0 - 1e-9)
    mats = []
    eye = np.eye(n_ctrl)
    for order in range(4):
        M = np.zeros((horizon, n_ctrl))
        for i in range(n_ctrl):
            spl = ScipyBSpline(knots, eye[i], degree, extrapolate=False)
            d = spl.derivative(order) if order > 0 else spl
            M[:, i] = np.nan_to_num(d(ts_eval))
        mats.append(M)
    return tuple(mats)


@dataclasses.dataclass(frozen=True)
class BSplineConfig:
    degree: int = 5
    n_control: int = 16  # total control points incl. pinned boundary points
    horizon: int = 32  # dense evaluation steps

    @property
    def n_free(self) -> int:
        return self.n_control - N_PIN

    @property
    def n_free_cspace(self) -> int:
        """Free knots when both ends are pinned (cspace goal)."""
        return self.n_control - 2 * N_PIN


class BSplineTransition:
    """Maps free knots + boundary states to a dense JointState trajectory."""

    def __init__(self, cfg: BSplineConfig, dtype=jnp.float32):
        self.cfg = cfg
        B0, B1, B2, B3 = _basis_matrices(cfg.n_control, cfg.degree, cfg.horizon)
        self.B0 = jnp.asarray(B0, dtype)
        self.B1 = jnp.asarray(B1, dtype)
        self.B2 = jnp.asarray(B2, dtype)
        self.B3 = jnp.asarray(B3, dtype)

    # ------------------------------------------------------------------
    def assemble_control(
        self,
        free_knots: jnp.ndarray,  # (..., n_free, D)
        q_start: jnp.ndarray,  # (..., D)
        q_goal: Optional[jnp.ndarray] = None,  # (..., D) pins the far end
    ) -> jnp.ndarray:
        """Prepend (and optionally append) pinned control points.

        free_knots may carry extra leading axes (line-search / particle
        folds); boundary states broadcast against them.
        """
        D = free_knots.shape[-1]
        lead = jnp.broadcast_shapes(free_knots.shape[:-2], q_start.shape[:-1])
        free_b = jnp.broadcast_to(free_knots, lead + free_knots.shape[-2:])
        start = jnp.broadcast_to(q_start[..., None, :], lead + (N_PIN, D))
        parts = [start, free_b]
        if q_goal is not None:
            goal = jnp.broadcast_to(q_goal[..., None, :], lead + (N_PIN, D))
            parts.append(goal)
        return jnp.concatenate(parts, axis=-2)

    def evaluate(
        self,
        control: jnp.ndarray,  # (..., n_control, D)
        dt: jnp.ndarray,  # (...,) per-problem step duration
        joint_names=(),
    ) -> JointState:
        """Dense trajectory: one matmul per derivative order."""
        T = (dt * (self.cfg.horizon - 1))[..., None, None]  # total duration
        pos = jnp.einsum("hc,...cd->...hd", self.B0, control)
        vel = jnp.einsum("hc,...cd->...hd", self.B1, control) / T
        acc = jnp.einsum("hc,...cd->...hd", self.B2, control) / T**2
        jerk = jnp.einsum("hc,...cd->...hd", self.B3, control) / T**3
        return JointState(
            position=pos, velocity=vel, acceleration=acc, jerk=jerk,
            dt=dt, joint_names=tuple(joint_names),
        )

    def rollout(
        self,
        free_knots: jnp.ndarray,
        q_start: jnp.ndarray,
        dt: jnp.ndarray,
        q_goal: Optional[jnp.ndarray] = None,
        joint_names=(),
    ) -> JointState:
        ctrl = self.assemble_control(free_knots, q_start, q_goal)
        return self.evaluate(ctrl, dt, joint_names)

    # ------------------------------------------------------------------
    def linear_seed(
        self, q_start: jnp.ndarray, q_end: jnp.ndarray, q_goal_pinned: bool = False
    ) -> jnp.ndarray:
        """Free knots approximating the straight line q_start -> q_end.

        A B-spline with collinear, uniformly spaced control points traces the
        line, so seeding is just a linspace over the free slots.
        """
        n = self.cfg.n_control
        alphas = np.linspace(0.0, 1.0, n)
        a = jnp.asarray(alphas, q_start.dtype)[:, None]
        ctrl = q_start[..., None, :] * (1.0 - a) + q_end[..., None, :] * a
        if q_goal_pinned:
            return ctrl[..., N_PIN : n - N_PIN, :]
        return ctrl[..., N_PIN:, :]

    def path_seed(self, waypoints: jnp.ndarray, q_goal_pinned: bool = False) -> jnp.ndarray:
        """Free knots approximating a waypoint path (..., P, D).

        Control points are placed at uniform arc positions along the
        piecewise-linear path, so the spline tracks graph-planner paths
        (reference graph-seeded trajopt, `motion_planner.py:386`).
        """
        n = self.cfg.n_control
        P = waypoints.shape[-2]
        # uniform param positions of the control points along the path
        t = np.linspace(0.0, 1.0, n) * (P - 1)
        i0 = np.clip(np.floor(t).astype(int), 0, P - 2)
        frac = jnp.asarray(t - i0, waypoints.dtype)[:, None]
        w0 = waypoints[..., i0, :]
        w1 = waypoints[..., i0 + 1, :]
        ctrl = w0 * (1.0 - frac) + w1 * frac
        if q_goal_pinned:
            return ctrl[..., N_PIN : n - N_PIN, :]
        return ctrl[..., N_PIN:, :]

    def evaluate_at(
        self, control: jnp.ndarray, dt: jnp.ndarray, t_query: jnp.ndarray,
    ) -> jnp.ndarray:
        """Evaluate positions at arbitrary normalized times t in [0, 1].

        Used by the control-rate interpolator (reference
        `util/warp_interpolation.py:16`): builds the basis on the fly with
        Cox–de Boor recursion in jnp (differentiable, jit-safe).
        """
        cfg = self.cfg
        degree = cfg.degree
        n_ctrl = cfg.n_control
        n_interior = n_ctrl - degree - 1
        knots = jnp.asarray(
            np.concatenate(
                [
                    np.zeros(degree + 1),
                    (np.arange(1, n_interior + 1)) / (n_interior + 1),
                    np.ones(degree + 1),
                ]
            ),
            control.dtype,
        )
        t = jnp.clip(t_query, 0.0, 1.0 - 1e-6)  # (..., Q)
        # Cox–de Boor: N_{i,0}
        left = knots[:-1]
        right = knots[1:]
        N = ((t[..., None] >= left) & (t[..., None] < right)).astype(control.dtype)
        for k in range(1, degree + 1):
            d1 = knots[k:-1] - knots[: -k - 1]
            d2 = knots[k + 1 :] - knots[1:-k]
            a = jnp.where(d1 > 0, (t[..., None] - knots[: -k - 1]) / jnp.where(d1 > 0, d1, 1.0), 0.0)
            b = jnp.where(d2 > 0, (knots[k + 1 :] - t[..., None]) / jnp.where(d2 > 0, d2, 1.0), 0.0)
            N = a * N[..., :-1] + b * N[..., 1:]
        return jnp.einsum("...qc,...cd->...qd", N, control)
