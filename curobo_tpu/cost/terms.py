"""Cost terms: pose / c-space / bounds / collision, all batched pure fns.

Parity targets (reference `curobo/_src/cost/`):
- `ToolPoseCost` (`cost_tool_pose.py:91`) incl. goalset argmin and per-axis
  weighting (`wp_tool_pose.py:438` goalset kernel).
- c-space costs (`cost_cspace_*.py`), bound costs (`wp_cspace_state.py`).
- `SceneCollisionCost` (`cost_scene_collision.py:24`) discrete + swept.
- `SelfCollisionCost` (`cost_self_collision.py:23`).

Each term is a stateless function over pytrees; weights live in small static
config dataclasses so everything inlines under jit.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp

from curobo_tpu.geom import world as world_mod
from curobo_tpu.geom.self_collision import self_collision_cost
from curobo_tpu.math import quaternion as qm
from curobo_tpu.robot.params import JointLimits, SelfCollisionParams


# ---------------------------------------------------------------------------
# Pose cost (+ goalset)
# ---------------------------------------------------------------------------
@dataclasses.dataclass(frozen=True)
class PoseCostConfig:
    position_weight: float = 50.0
    rotation_weight: float = 30.0
    # Optional per-axis weights (len-3 tuples); None = isotropic.
    position_axis_weight: Optional[Tuple[float, float, float]] = None
    rotation_axis_weight: Optional[Tuple[float, float, float]] = None
    # use square-root-of-quadratic (metric-like) vs quadratic accumulation
    quadratic: bool = True


def pose_error(
    tool_pos: jnp.ndarray,  # (..., T, 3)
    tool_quat: jnp.ndarray,  # (..., T, 4)
    goal_pos: jnp.ndarray,  # (..., G, T, 3) goalset axis G
    goal_quat: jnp.ndarray,  # (..., G, T, 4)
    cfg: PoseCostConfig = PoseCostConfig(),
    tool_weight: Optional[jnp.ndarray] = None,  # (T, 6) ToolPoseCriteria
    tool_tolerance: Optional[jnp.ndarray] = None,  # (T, 2)
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (cost (...,), pos_err (...,), rot_err (...,)).

    Goalset semantics: error against each of G goals, argmin over G of the
    weighted cost (reference `wp_tool_pose.py` goalset argmin). pos_err /
    rot_err are reported for the selected goal, max-ed over tool frames.

    tool_weight / tool_tolerance carry per-tool `ToolPoseCriteria`
    (reference `cost/tool_pose_criteria.py:18`): 6 axis weight factors
    scale the error axes in the cost; tolerances are subtracted from the
    per-tool reported errors so an in-tolerance tool counts as on-goal.
    """
    dp = goal_pos - tool_pos[..., None, :, :]  # (..., G, T, 3)
    if cfg.position_axis_weight is not None:
        dp = dp * jnp.asarray(cfg.position_axis_weight)
    if tool_weight is not None:
        dp = dp * tool_weight[..., :, :3]
    pos_err2 = jnp.sum(dp * dp, axis=-1)  # (..., G, T)

    rot_vec = qm.quat_error(goal_quat, tool_quat[..., None, :, :])  # (..., G, T, 3)
    if cfg.rotation_axis_weight is not None:
        rot_vec = rot_vec * jnp.asarray(cfg.rotation_axis_weight)
    if tool_weight is not None:
        rot_vec = rot_vec * tool_weight[..., :, 3:]
    rot_err2 = jnp.sum(rot_vec * rot_vec, axis=-1)  # (..., G, T)

    if cfg.quadratic:
        per_goal = cfg.position_weight * pos_err2 + cfg.rotation_weight * rot_err2
    else:
        per_goal = cfg.position_weight * jnp.sqrt(
            jnp.maximum(pos_err2, 1e-16)
        ) + cfg.rotation_weight * jnp.sqrt(jnp.maximum(rot_err2, 1e-16))
    per_goal = jnp.sum(per_goal, axis=-1)  # sum over tool frames -> (..., G)

    best = jnp.argmin(per_goal, axis=-1)  # (...,)
    cost = jnp.min(per_goal, axis=-1)
    # Metrics for the chosen goal (per-tool tolerance slack applied).
    pe_t = jnp.sqrt(
        jnp.take_along_axis(pos_err2, best[..., None, None], axis=-2)
    )[..., 0, :]  # (..., T)
    re_t = jnp.sqrt(
        jnp.take_along_axis(rot_err2, best[..., None, None], axis=-2)
    )[..., 0, :]
    if tool_tolerance is not None:
        pe_t = jnp.maximum(pe_t - tool_tolerance[..., :, 0], 0.0)
        re_t = jnp.maximum(re_t - tool_tolerance[..., :, 1], 0.0)
    return cost, jnp.max(pe_t, axis=-1), jnp.max(re_t, axis=-1)


# ---------------------------------------------------------------------------
# C-space costs
# ---------------------------------------------------------------------------
@dataclasses.dataclass(frozen=True)
class CSpaceCostConfig:
    weight: float = 50.0


def cspace_error(
    q: jnp.ndarray, goal_q: jnp.ndarray, joint_weight: jnp.ndarray,
    cfg: CSpaceCostConfig = CSpaceCostConfig(),
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Weighted squared distance to a joint-space goal. -> (cost, err)."""
    d = (q - goal_q) * joint_weight
    err2 = jnp.sum(d * d, axis=-1)
    return cfg.weight * err2, jnp.sqrt(jnp.maximum(err2, 1e-16))


def null_space_cost(
    q: jnp.ndarray, retract_q: jnp.ndarray, null_weight: jnp.ndarray, weight: float
) -> jnp.ndarray:
    d = (q - retract_q) * null_weight
    return weight * jnp.sum(d * d, axis=-1)


# ---------------------------------------------------------------------------
# Bound costs
# ---------------------------------------------------------------------------
@dataclasses.dataclass(frozen=True)
class BoundCostConfig:
    weight: float = 5000.0
    # fraction of the range used as soft margin from each limit
    margin: float = 0.0
    velocity_weight: float = 0.0
    acceleration_weight: float = 0.0
    jerk_weight: float = 0.0


def bound_cost(
    position: jnp.ndarray,  # (..., D)
    limits: JointLimits,
    cfg: BoundCostConfig,
    velocity: Optional[jnp.ndarray] = None,
    acceleration: Optional[jnp.ndarray] = None,
    jerk: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Quadratic penalty outside (possibly margin-shrunk) limits -> (...)."""
    if cfg.margin != 0.0:
        # guard unbounded joints: margin * inf would poison the whole cost
        rng = limits.upper - limits.lower
        rng = jnp.where(jnp.isfinite(rng), rng, 0.0)
        lo = limits.lower + cfg.margin * rng
        hi = limits.upper - cfg.margin * rng
    else:
        lo, hi = limits.lower, limits.upper
    viol = jnp.maximum(lo - position, 0.0) + jnp.maximum(position - hi, 0.0)
    c = cfg.weight * jnp.sum(viol * viol, axis=-1)
    if velocity is not None and cfg.velocity_weight > 0:
        v = jnp.maximum(jnp.abs(velocity) - limits.velocity, 0.0)
        c = c + cfg.velocity_weight * jnp.sum(v * v, axis=-1)
    if acceleration is not None and cfg.acceleration_weight > 0:
        a = jnp.maximum(jnp.abs(acceleration) - limits.acceleration, 0.0)
        c = c + cfg.acceleration_weight * jnp.sum(a * a, axis=-1)
    if jerk is not None and cfg.jerk_weight > 0:
        j = jnp.maximum(jnp.abs(jerk) - limits.jerk, 0.0)
        c = c + cfg.jerk_weight * jnp.sum(j * j, axis=-1)
    return c


def bound_violation(
    position: jnp.ndarray, limits: JointLimits, eps: float = 0.0
) -> jnp.ndarray:
    """Boolean feasibility helper: True where any joint violates (..., )."""
    return jnp.any(
        (position < limits.lower - eps) | (position > limits.upper + eps), axis=-1
    )


# ---------------------------------------------------------------------------
# Collision cost terms
# ---------------------------------------------------------------------------
@dataclasses.dataclass(frozen=True)
class CollisionCostConfig:
    weight: float = 100.0
    activation_distance: float = 0.025
    # substeps for swept (continuous) collision between horizon steps
    sweep_steps: int = 4
    # motion-aware (speed-metric) scaling of swept cost
    speed_metric: bool = False


def scene_collision_cost(
    world: world_mod.WorldData, spheres: jnp.ndarray, cfg: CollisionCostConfig
) -> jnp.ndarray:
    """Discrete collision cost summed over robot spheres: (..., S, 4) -> (...)."""
    per = world_mod.collision_cost(world, spheres, cfg.activation_distance)
    return cfg.weight * jnp.sum(per, axis=-1)


def swept_scene_collision_cost(
    world: world_mod.WorldData, spheres: jnp.ndarray, cfg: CollisionCostConfig
) -> jnp.ndarray:
    """Continuous collision along a trajectory: (..., H, S, 4) -> (..., H).

    Interpolates sphere centers between consecutive steps with
    ``cfg.sweep_steps`` substeps and accumulates the activated cost, matching
    the reference swept kernel's semantics
    (`geom/collision/wp_sweep_collision_kernel.py:83`, SWEEP_STEPS).
    Optionally scales by inter-step sphere speed (CHOMP speed metric,
    `wp_speed_metric.py:10`).
    """
    prev = jnp.concatenate([spheres[..., :1, :, :], spheres[..., :-1, :, :]], axis=-3)
    K = cfg.sweep_steps
    # (K,) interpolation fractions in (0, 1], endpoint at the current step.
    alphas = jnp.arange(1, K + 1, dtype=spheres.dtype) / K
    # (..., H, K, S, 4)
    interp = (
        prev[..., :, None, :, :] * (1.0 - alphas)[:, None, None]
        + spheres[..., :, None, :, :] * alphas[:, None, None]
    )
    per = world_mod.collision_cost(world, interp, cfg.activation_distance)
    per = jnp.sum(per, axis=-2) / K  # mean over substeps -> (..., H, S)
    if cfg.speed_metric:
        speed = jnp.linalg.norm(
            spheres[..., :3] - prev[..., :3], axis=-1
        )  # (..., H, S)
        per = per * (speed + 1e-3)
    return cfg.weight * jnp.sum(per, axis=-1)


@dataclasses.dataclass(frozen=True)
class SelfCollisionCostConfig:
    weight: float = 500.0
    activation_distance: float = 0.0


def self_collision_cost_term(
    sc: SelfCollisionParams, spheres: jnp.ndarray, cfg: SelfCollisionCostConfig
) -> jnp.ndarray:
    return cfg.weight * self_collision_cost(sc, spheres, cfg.activation_distance)
