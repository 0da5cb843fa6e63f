"""Robot rollout: wires kinematics + world + cost terms into objectives.

Parity: reference `RobotRollout` (`curobo/_src/rollout/rollout_robot.py:39`)
+ `RobotCostManager` (`cost_manager_robot.py:39`) + `GoalRegistry`
(`goal_registry.py:27`). The reference overlaps cost terms on CUDA streams;
here every term is a pure jnp function inside one jit so XLA's scheduler
overlaps them — no manual streams.

Shapes: objectives accept arbitrary leading batch dims; a trajectory adds a
horizon axis before dof: (..., H, D).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from curobo_tpu.cost import support_polygon as sp_mod
from curobo_tpu.cost import terms
from curobo_tpu.geom import world as world_mod
from curobo_tpu.geom.self_collision import self_collision_distance
from curobo_tpu.robot import kinematics as kin_mod
from curobo_tpu.robot.params import KinematicsParams
from curobo_tpu.types.pose import Pose
from curobo_tpu.types.state import JointState


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Goal:
    """Batched optimization goal (pose and/or c-space).

    goal_pos/goal_quat carry a goalset axis G (G=1 for single goals):
    (B, G, T, 3/4) where T = number of tool frames.
    """

    goal_pos: jnp.ndarray
    goal_quat: jnp.ndarray
    goal_cspace: Optional[jnp.ndarray] = None  # (B, D)
    current_position: Optional[jnp.ndarray] = None  # (B, D) (MPC / regularization)
    # per-tool criteria (reference ToolPoseCriteria): axis weight factors
    # (T, 6) and (pos, rot) convergence slack (T, 2); batch-free constants
    tool_weight: Optional[jnp.ndarray] = None
    tool_tolerance: Optional[jnp.ndarray] = None

    @staticmethod
    def from_pose(pose: Pose, n_tools: int = 1, criteria=None) -> "Goal":
        """Build from a Pose with batch shape (B,), (B, T) or (B, G, T).

        criteria: optional sequence of `ToolPoseCriteria` (one per tool
        frame, reference `cost/tool_pose_criteria.py:18`)."""
        pos, quat = pose.position, pose.quaternion
        if pos.ndim == 2:  # (B, 3) single tool, single goal
            pos = pos[:, None, None, :]
            quat = quat[:, None, None, :]
        elif pos.ndim == 3:  # (B, T, 3)
            pos = pos[:, None, :, :]
            quat = quat[:, None, :, :]
        tw = tt = None
        if criteria is not None:
            from curobo_tpu.types.tool_pose import stack_criteria

            tw, tt = stack_criteria(criteria)
        return Goal(goal_pos=pos, goal_quat=quat, tool_weight=tw, tool_tolerance=tt)

    @property
    def batch(self) -> int:
        return self.goal_pos.shape[0]

    def tile_seeds(self, n_seeds: int) -> "Goal":
        """(B, ...) -> (B, S, ...) broadcast over a seed axis. Per-tool
        criteria are batch-free constants and pass through unchanged."""

        def tile(a):
            if a is None:
                return None
            return jnp.broadcast_to(a[:, None], (a.shape[0], n_seeds) + a.shape[1:])

        return Goal(
            goal_pos=tile(self.goal_pos),
            goal_quat=tile(self.goal_quat),
            goal_cspace=tile(self.goal_cspace),
            current_position=tile(self.current_position),
            tool_weight=self.tool_weight,
            tool_tolerance=self.tool_tolerance,
        )


@dataclasses.dataclass(frozen=True)
class RobotRolloutConfig:
    """Static cost configuration (inlined at trace time)."""

    pose_cost: terms.PoseCostConfig = terms.PoseCostConfig()
    cspace_cost: terms.CSpaceCostConfig = terms.CSpaceCostConfig()
    bound_cost: terms.BoundCostConfig = terms.BoundCostConfig()
    collision_cost: terms.CollisionCostConfig = terms.CollisionCostConfig()
    self_collision_cost: terms.SelfCollisionCostConfig = terms.SelfCollisionCostConfig()
    null_space_weight: float = 0.0
    # pose cost applied to intermediate horizon steps, scaled by run_weight
    pose_run_weight: float = 0.0
    # smoothness (squared vel/acc/jerk) weights for trajectory objectives
    velocity_weight: float = 0.0
    acceleration_weight: float = 0.0
    jerk_weight: float = 0.0
    use_swept_collision: bool = True
    # humanoid balance: CoM-inside-support-polygon penalty (reference
    # `cost_support_polygon.py:109`). The hull is baked static (tuple of
    # (x, y) CCW vertices, built once per stance via
    # `cost.support_polygon.stance_hull`).
    support_polygon: Optional["sp_mod.SupportPolygonConfig"] = None
    support_hull: Optional[tuple] = None  # ((x, y), ...) CCW
    # inverse-dynamics torque-limit penalty (reference --use-dynamics mode,
    # `transition/robot_state_transition.py:170` + RNEA)
    torque_limit_weight: float = 0.0
    # payload mass attached at the last link's CoM (torque-limited benchmark)
    payload_mass: float = 0.0
    # convergence thresholds (metrics)
    position_threshold: float = 0.005
    rotation_threshold: float = 0.05


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class RolloutResult:
    """Costs + metrics for a batch of candidates."""

    cost: jnp.ndarray  # (...,) total
    pos_err: jnp.ndarray  # (...,) terminal position error (max over tools)
    rot_err: jnp.ndarray  # (...,)
    cspace_err: Optional[jnp.ndarray]  # (...,)
    feasible: jnp.ndarray  # (...,) bool: bounds + collisions clear
    in_collision: jnp.ndarray  # (...,) bool
    self_colliding: jnp.ndarray  # (...,) bool
    out_of_bounds: jnp.ndarray  # (...,) bool

    @property
    def success(self) -> jnp.ndarray:
        return self.feasible

    def converged(self, pos_thresh: float, rot_thresh: float) -> jnp.ndarray:
        return (
            (self.pos_err <= pos_thresh)
            & (self.rot_err <= rot_thresh)
            & self.feasible
        )


class RobotRollout:
    """Objective factory for a (robot, world, cost-config) triple.

    The world is passed per-call (it is a pytree and may be donated/updated
    between solves without retracing).
    """

    def __init__(self, params: KinematicsParams, cfg: RobotRolloutConfig):
        self.params = params
        self.cfg = cfg

    # -- single-state objective (IK) ------------------------------------
    def evaluate_config(
        self,
        world: world_mod.WorldData,
        goal: Goal,
        q: jnp.ndarray,  # (..., D)
        collision_eps: float = 0.0,
    ) -> RolloutResult:
        p, cfg = self.params, self.cfg
        with jax.named_scope("rollout.fk"):
            state = kin_mod.compute_kinematics(p, q)
        pose_c, pos_err, rot_err = terms.pose_error(
            state.tool_pose.position,
            state.tool_pose.quaternion,
            goal.goal_pos,
            goal.goal_quat,
            cfg.pose_cost,
            tool_weight=goal.tool_weight,
            tool_tolerance=goal.tool_tolerance,
        )
        cost = pose_c

        cspace_err = None
        if goal.goal_cspace is not None:
            cs_c, cspace_err = terms.cspace_error(
                q, goal.goal_cspace, p.cspace_weight, cfg.cspace_cost
            )
            cost = cost + cs_c
        if cfg.null_space_weight > 0.0:
            cost = cost + terms.null_space_cost(
                q, p.retract_config, p.null_space_weight, cfg.null_space_weight
            )

        cost = cost + terms.bound_cost(q, p.joint_limits, cfg.bound_cost)
        cost = cost + terms.scene_collision_cost(world, state.spheres, cfg.collision_cost)
        cost = cost + terms.self_collision_cost_term(
            p.self_collision, state.spheres, cfg.self_collision_cost
        )
        if cfg.support_polygon is not None and cfg.support_polygon.weight > 0:
            com = kin_mod.compute_com(p, state.link_rot, state.link_pos)
            hull = jnp.asarray(cfg.support_hull, dtype=jnp.float32)
            cost = cost + sp_mod.support_polygon_cost(
                com[..., :2], hull, cfg.support_polygon
            )

        # metrics / feasibility (no activation margin)
        live = state.spheres[..., 3] >= 0
        clearance = world_mod.sphere_clearance(world, state.spheres)
        in_collision = jnp.any((clearance < -collision_eps) & live, axis=-1)
        self_d = self_collision_distance(p.self_collision, state.spheres)
        self_colliding = self_d > collision_eps
        oob = terms.bound_violation(q, p.joint_limits, eps=1e-4)
        feasible = ~(in_collision | self_colliding | oob)

        return RolloutResult(
            cost=cost,
            pos_err=pos_err,
            rot_err=rot_err,
            cspace_err=cspace_err,
            feasible=feasible,
            in_collision=in_collision,
            self_colliding=self_colliding,
            out_of_bounds=oob,
        )

    # -- multi-env variants (reference SolveMode.MULTI_ENV) -------------
    def evaluate_config_env(
        self,
        worlds: world_mod.WorldData,  # leading env axis E on every array
        env_idx: jnp.ndarray,  # (B,) int32 environment per problem
        goal: Goal,  # (B, ...)
        q: jnp.ndarray,  # (B, ..., D)
        collision_eps: float = 0.0,
    ) -> RolloutResult:
        """Per-problem environment routing: gather each problem's world and
        vmap the single-world objective over the problem axis."""
        world_b = jax.tree.map(lambda a: a[env_idx], worlds)
        return jax.vmap(
            lambda w, g, qq: self.evaluate_config(w, g, qq, collision_eps)
        )(world_b, goal, q)

    def evaluate_trajectory_env(
        self,
        worlds: world_mod.WorldData,
        env_idx: jnp.ndarray,
        goal: Goal,
        traj: JointState,
        collision_eps: float = 0.0,
    ) -> RolloutResult:
        world_b = jax.tree.map(lambda a: a[env_idx], worlds)
        return jax.vmap(
            lambda w, g, t: self.evaluate_trajectory(w, g, t, collision_eps)
        )(world_b, goal, traj)

    # -- trajectory objective (trajopt / MPC) ---------------------------
    def evaluate_trajectory(
        self,
        world: world_mod.WorldData,
        goal: Goal,
        traj: JointState,  # arrays (..., H, D)
        collision_eps: float = 0.0,
    ) -> RolloutResult:
        p, cfg = self.params, self.cfg
        q = traj.position
        with jax.named_scope("rollout.fk"):
            state = kin_mod.compute_kinematics(p, q)  # (..., H, ...)

        # terminal pose cost (+ optional run weight on intermediate steps)
        pose_c_all, pos_err_all, rot_err_all = terms.pose_error(
            state.tool_pose.position,
            state.tool_pose.quaternion,
            goal.goal_pos[..., None, :, :, :],  # broadcast over H
            goal.goal_quat[..., None, :, :, :],
            cfg.pose_cost,
            tool_weight=goal.tool_weight,
            tool_tolerance=goal.tool_tolerance,
        )
        cost = pose_c_all[..., -1]
        if cfg.pose_run_weight > 0.0:
            cost = cost + cfg.pose_run_weight * jnp.mean(
                pose_c_all[..., :-1], axis=-1
            )
        pos_err = pos_err_all[..., -1]
        rot_err = rot_err_all[..., -1]

        cspace_err = None
        if goal.goal_cspace is not None:
            cs_c, cspace_err_all = terms.cspace_error(
                q, goal.goal_cspace[..., None, :], p.cspace_weight, cfg.cspace_cost
            )
            cost = cost + cs_c[..., -1]
            cspace_err = cspace_err_all[..., -1]

        # bounds over the whole trajectory (incl. derivatives)
        bc = terms.bound_cost(
            q, p.joint_limits, cfg.bound_cost,
            velocity=traj.velocity, acceleration=traj.acceleration, jerk=traj.jerk,
        )
        cost = cost + jnp.sum(bc, axis=-1)

        # smoothness
        if cfg.velocity_weight > 0.0 and traj.velocity is not None:
            cost = cost + cfg.velocity_weight * jnp.mean(
                jnp.sum(traj.velocity**2, axis=-1), axis=-1
            )
        if cfg.acceleration_weight > 0.0 and traj.acceleration is not None:
            cost = cost + cfg.acceleration_weight * jnp.mean(
                jnp.sum(traj.acceleration**2, axis=-1), axis=-1
            )
        if cfg.jerk_weight > 0.0 and traj.jerk is not None:
            cost = cost + cfg.jerk_weight * jnp.mean(
                jnp.sum(traj.jerk**2, axis=-1), axis=-1
            )

        # inverse-dynamics torque limits (RNEA over the trajectory)
        if cfg.torque_limit_weight > 0.0 and traj.velocity is not None:
            from curobo_tpu.robot.dynamics import compute_inverse_dynamics

            dyn_params = p
            if cfg.payload_mass > 0.0:
                import dataclasses as _dc

                last = p.n_links - 1
                dyn_params = _dc.replace(
                    p, link_mass=p.link_mass.at[last].add(cfg.payload_mass)
                )
            tau = compute_inverse_dynamics(
                dyn_params, q, traj.velocity, traj.acceleration
            )
            over = jnp.maximum(jnp.abs(tau) - p.joint_limits.effort, 0.0)
            cost = cost + cfg.torque_limit_weight * jnp.sum(
                jnp.sum(over * over, axis=-1), axis=-1
            )

        # collisions
        if cfg.use_swept_collision:
            cc = terms.swept_scene_collision_cost(world, state.spheres, cfg.collision_cost)
        else:
            cc = terms.scene_collision_cost(world, state.spheres, cfg.collision_cost)
        cost = cost + jnp.sum(cc, axis=-1)
        sc = terms.self_collision_cost_term(
            p.self_collision, state.spheres, cfg.self_collision_cost
        )
        cost = cost + jnp.sum(sc, axis=-1)
        if cfg.support_polygon is not None and cfg.support_polygon.weight > 0:
            com = kin_mod.compute_com(p, state.link_rot, state.link_pos)
            hull = jnp.asarray(cfg.support_hull, dtype=jnp.float32)
            spc = sp_mod.support_polygon_cost(
                com[..., :2], hull, cfg.support_polygon
            )  # (..., H)
            cost = cost + jnp.sum(spc, axis=-1)

        # feasibility over every step
        live = state.spheres[..., 3] >= 0
        clearance = world_mod.sphere_clearance(world, state.spheres)
        in_collision = jnp.any(
            jnp.any((clearance < -collision_eps) & live, axis=-1), axis=-1
        )
        self_d = self_collision_distance(p.self_collision, state.spheres)
        self_colliding = jnp.any(self_d > collision_eps, axis=-1)
        oob = jnp.any(terms.bound_violation(q, p.joint_limits, eps=1e-4), axis=-1)
        feasible = ~(in_collision | self_colliding | oob)

        return RolloutResult(
            cost=cost,
            pos_err=pos_err,
            rot_err=rot_err,
            cspace_err=cspace_err,
            feasible=feasible,
            in_collision=in_collision,
            self_colliding=self_colliding,
            out_of_bounds=oob,
        )
