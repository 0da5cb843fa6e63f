"""Motion planner: IK -> seed selection/repair -> trajectory optimization.

Parity: reference `MotionPlanner` (`curobo/_src/motion/motion_planner.py:43`,
`plan_pose:207`, retry loop `_plan_pose_single:233`): IK for goal configs,
failed-seed repair from successful ones, trajopt with finetune, control-rate
interpolation. Graph-planner seeding (attempt escalation) plugs in via the
optional `graph_seed_fn` hook (`_get_graph_seed_trajectories:386` analog).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Optional

import jax
import jax.numpy as jnp

from curobo_tpu.geom import world as world_mod
from curobo_tpu.solver.ik import IKConfig, IKSolver
from curobo_tpu.solver.trajopt import TrajOptConfig, TrajOptResult, TrajOptSolver
from curobo_tpu.types.pose import Pose
from curobo_tpu.types.state import JointState


@dataclasses.dataclass(frozen=True)
class MotionPlanConfig:
    ik: IKConfig = IKConfig()
    trajopt: TrajOptConfig = TrajOptConfig()
    n_trajopt_seeds: int = 4
    max_attempts: int = 2
    # attempt index at which PRM graph seeding kicks in (reference
    # `enable_graph_attempt`, `motion_planner.py:233-296`); -1 disables
    enable_graph_attempt: int = 1
    # retry escalation (r5): attempt 0 failed with the standard budget, so
    # retries solve HARDER, not just differently — IK with seed_scale x
    # the seeds, trajopt over more seeds. Costs nothing on the common
    # attempt-0-success path; the retry programs compile during warmup.
    # (4x: the measured hard tail — cubby goals whose basin only ~5 % of
    # seeds reach — needs ~128 seeds for a reliable hit.)
    retry_ik_seed_scale: int = 4
    n_trajopt_seeds_retry: int = 8
    interpolation_dt: float = 0.02
    # pin the interpolated horizon so repeated plans never retrace on the
    # data-dependent motion time (True = bound from trajopt max_dt)
    static_interpolation: bool = True


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MotionPlanResult:
    success: jnp.ndarray  # (B,)
    trajectory: JointState  # (B, H_interp, D) control-rate interpolated
    solver_trajectory: JointState  # (B, H, D) at solver dt
    motion_time: jnp.ndarray  # (B,)
    position_error: jnp.ndarray
    rotation_error: jnp.ndarray
    ik_success: jnp.ndarray
    plan_time: float = dataclasses.field(metadata=dict(static=True), default=0.0)


class MotionPlanner:
    def __init__(self, params, cfg: MotionPlanConfig = MotionPlanConfig()):
        self.params = params
        self.cfg = cfg
        self.ik = IKSolver(params, cfg.ik)
        self.ik_retry = self.ik
        if cfg.retry_ik_seed_scale > 1 and cfg.max_attempts > 1:
            self.ik_retry = IKSolver(
                params,
                dataclasses.replace(
                    cfg.ik, n_seeds=cfg.ik.n_seeds * cfg.retry_ik_seed_scale
                ),
            )
        self.trajopt = TrajOptSolver(params, cfg.trajopt)
        self._prm = None  # built lazily on first graph-seeded attempt
        # glue jits: each eager op between the solver jits is a separate
        # device dispatch — through a remote tunnel that dominates warm
        # B=1 plan latency
        import functools

        self._select_seeds_jit = jax.jit(
            self._select_seeds, static_argnums=(1,)
        )
        self._merge_best_jit = jax.jit(self._merge_best)
        # interpolate was an EAGER chain of ~30 small ops — ~127 ms of
        # dispatch per plan through a remote tunnel (r5 attribution);
        # one jit makes it a single dispatch
        self._interp_jit = jax.jit(
            self.trajopt.interpolate, static_argnums=(2, 3)
        )

    @staticmethod
    def _merge_best(res: TrajOptResult, best: TrajOptResult) -> TrajOptResult:
        B = res.success.shape[0]
        better = res.success & (~best.success | (res.motion_time < best.motion_time))

        def pick(a, b):
            if isinstance(a, jnp.ndarray) and a.ndim >= 1 and a.shape[0] == B:
                return jnp.where(
                    better.reshape((B,) + (1,) * (a.ndim - 1)), a, b
                )
            return b

        return jax.tree.map(pick, res, best)

    def _graph_seed_paths(self, world, q_start, seeds):
        """PRM paths from start to each seed config -> (B, S, P, D) waypoints.

        Parity: reference `_get_graph_seed_trajectories` (`motion_planner.py:386`).
        """
        from curobo_tpu.graph.prm import PRMConfig, PRMGraphPlanner

        if self._prm is None:
            self._prm = PRMGraphPlanner(self.params, PRMConfig(n_nodes=256))
        B, S, D = seeds.shape
        flat_goal = seeds.reshape(B * S, D)
        flat_start = jnp.broadcast_to(q_start[:, None], (B, S, D)).reshape(B * S, D)
        res = self._prm.plan(world, flat_start, flat_goal)
        P = res.paths.shape[1]
        return res.paths.reshape(B, S, P, D)

    # ------------------------------------------------------------------
    def _select_seeds(self, ik_res, n: int) -> jnp.ndarray:
        """(B, n, D) trajopt end-config seeds: successful IK seeds first,
        failures repaired with the problem's best solution."""
        sols = ik_res.seed_solutions  # (B, S, D)
        succ = ik_res.seed_success  # (B, S)
        order = jnp.argsort(~succ, axis=-1, stable=True)  # successes first
        top = order[:, :n]
        seeds = jnp.take_along_axis(sols, top[..., None], axis=1)
        ok = jnp.take_along_axis(succ, top, axis=1)
        # repair: failed slots <- best solution of the problem
        repaired = jnp.where(ok[..., None], seeds, ik_res.solution[:, None, :])
        return repaired

    # ------------------------------------------------------------------
    def plan_pose(
        self,
        world: world_mod.WorldData,
        goal_pose: Pose,  # (B,)
        start_state: JointState,  # (B, D)
        key: Optional[jax.Array] = None,
        attribute: bool = False,
    ) -> MotionPlanResult:
        """attribute=True blocks the device after every phase and records
        wall-ms per phase in `self.last_attribution` (ik / seed-select /
        graph-seed / trajopt / merge / interpolate, per attempt). Blocking
        serializes the async dispatch queue, so attributed runs are slower
        than production runs — use for diagnosis, not headline timing."""
        cfg = self.cfg
        t0 = time.perf_counter()
        if key is None:
            key = jax.random.PRNGKey(0)
        q_start = start_state.position
        B = q_start.shape[0]

        attr: dict = {}

        def mark(name, val):
            if attribute:
                jax.block_until_ready(val)
                now = time.perf_counter()
                attr[name] = attr.get(name, 0.0) + (now - mark.t) * 1e3
                mark.t = now

        mark.t = t0

        best: Optional[TrajOptResult] = None
        interp = None
        ik_success = jnp.zeros((B,), dtype=bool)
        for attempt in range(cfg.max_attempts):
            k_ik, k_to, key = jax.random.split(key, 3)
            ik_solver = self.ik if attempt == 0 else self.ik_retry
            n_to_seeds = (
                cfg.n_trajopt_seeds if attempt == 0
                else max(cfg.n_trajopt_seeds_retry, cfg.n_trajopt_seeds)
            )
            ik_res = ik_solver.solve_pose(
                world, goal_pose, key=k_ik,
                seed_state=q_start if attempt == 0 else None,
            )
            mark("ik_ms", ik_res.solution)
            ik_success = ik_success | ik_res.success
            seeds = self._select_seeds_jit(ik_res, n_to_seeds)
            mark("seed_select_ms", seeds)
            seed_paths = None
            if cfg.enable_graph_attempt >= 0 and attempt >= cfg.enable_graph_attempt:
                seed_paths = self._graph_seed_paths(world, q_start, seeds)
                mark("graph_seed_ms", seed_paths)
            res = self.trajopt.solve_pose(
                world, goal_pose, q_start, seeds, key=k_to, seed_paths=seed_paths
            )
            mark("trajopt_ms", res.trajectory.position)
            best = res if best is None else self._merge_best_jit(res, best)
            # speculative interpolation BEFORE the host success check: the
            # bool() fetch below is the plan's one mandatory device sync
            # (it drains the whole async queue), so enqueueing interp
            # first makes it free in the common success case instead of a
            # second blocking round-trip (~25 ms through a remote tunnel)
            h_out = self._interp_steps()
            if h_out is not None:
                interp = self._interp_jit(
                    best, q_start, cfg.interpolation_dt, h_out
                )
            else:  # data-dependent horizon: stays eager by design
                interp = self.trajopt.interpolate(
                    best, q_start, cfg.interpolation_dt
                )
            mark("interpolate_ms", interp.position)
            all_ok = attempt == cfg.max_attempts - 1 or bool(
                jnp.all(best.success)
            )
            mark("merge_sync_ms", None)
            if all_ok:
                break
        self.last_attempts = attempt + 1
        if attribute:
            attr["attempts"] = attempt + 1
        if attribute:
            self.last_attribution = attr
        return MotionPlanResult(
            success=best.success,
            trajectory=interp,
            solver_trajectory=best.trajectory,
            motion_time=best.motion_time,
            position_error=best.position_error,
            rotation_error=best.rotation_error,
            ik_success=ik_success,
            plan_time=time.perf_counter() - t0,
        )

    def _interp_steps(self) -> Optional[int]:
        if not self.cfg.static_interpolation:
            return None
        tcfg = self.cfg.trajopt
        t_max = tcfg.max_dt * (tcfg.bspline.horizon - 1)
        import numpy as np

        return int(np.ceil(t_max / self.cfg.interpolation_dt)) + 1

    # ------------------------------------------------------------------
    def plan_grasp(
        self,
        world: world_mod.WorldData,
        grasp_pose: Pose,  # (B,)
        start_state: JointState,
        approach_offset: float = 0.1,
        key: Optional[jax.Array] = None,
    ):
        """Two-phase grasp: plan to a pre-grasp pose offset along the tool's
        approach (-z) axis, then a straight collision-checked approach to
        the grasp pose. Parity: reference `plan_grasp` (`motion_planner.py:419`).

        Returns (approach_plan: MotionPlanResult, grasp_traj: JointState,
        grasp_success (B,)).
        """
        from curobo_tpu.math import quaternion as qm

        if key is None:
            key = jax.random.PRNGKey(0)
        # pre-grasp: offset along the grasp frame's -z (approach) axis
        z_axis = qm.quat_rotate(grasp_pose.quaternion, jnp.asarray([0.0, 0.0, 1.0]))
        pregrasp = Pose(
            grasp_pose.position - approach_offset * z_axis, grasp_pose.quaternion
        )
        k1, k2 = jax.random.split(key)
        approach = self.plan_pose(world, pregrasp, start_state, key=k1)

        # grasp phase: IK at the grasp pose seeded from the pre-grasp end,
        # then straight-line cspace approach (collision-validated)
        q_pre = approach.solver_trajectory.position[:, -1]
        ik_res = self.ik.solve_pose(world, grasp_pose, key=k2, seed_state=q_pre)
        H = 12
        alphas = jnp.linspace(0.0, 1.0, H)[None, :, None]
        seg = q_pre[:, None] * (1 - alphas) + ik_res.solution[:, None] * alphas
        from curobo_tpu.collision.robot_scene import RobotSceneCollision

        rsc = RobotSceneCollision(self.params)
        seg_ok = rsc.validate_trajectory(world, seg)
        grasp_traj = JointState.from_position(seg, self.params.joint_names)
        success = approach.success & ik_res.success & seg_ok
        return approach, grasp_traj, success

    # ------------------------------------------------------------------
    def plan_cspace(
        self,
        world: world_mod.WorldData,
        goal_state: JointState,  # (B, D)
        start_state: JointState,  # (B, D)
        key: Optional[jax.Array] = None,
    ) -> MotionPlanResult:
        """Parity: reference `plan_cspace` (`motion_planner.py:325`)."""
        cfg = self.cfg
        t0 = time.perf_counter()
        q_start = start_state.position
        res = self.trajopt.solve_cspace(world, goal_state.position, q_start, key=key)
        interp = self.trajopt.interpolate(res, q_start, cfg.interpolation_dt)
        B = q_start.shape[0]
        return MotionPlanResult(
            success=res.success,
            trajectory=interp,
            solver_trajectory=res.trajectory,
            motion_time=res.motion_time,
            position_error=res.position_error,
            rotation_error=res.rotation_error,
            ik_success=jnp.ones((B,), dtype=bool),
            plan_time=time.perf_counter() - t0,
        )
