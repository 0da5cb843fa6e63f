"""Trajectory optimization solver: B-spline knots + swept collision + retiming.

Parity: reference `TrajOptSolver` (`curobo/_src/solver/solver_trajopt.py:40`,
`_solve_impl:258`): seed trajectories -> per-seed dt estimate -> finetune
loop (dt scaling, re-optimize, keep per-problem best feasible) ->
interpolation + metrics. The inner optimize (MPPI stage + L-BFGS over free
knots) is one jit; the finetune loop stays host-side Python around the
jitted solve exactly like the reference's Python loop around CUDA-graph
replays.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from curobo_tpu import runtime
from curobo_tpu.geom import world as world_mod
from curobo_tpu.opt.lbfgs import LBFGSConfig, lbfgs_optimize
from curobo_tpu.opt.mppi import MPPIConfig, mppi_optimize
from curobo_tpu.robot.params import KinematicsParams
from curobo_tpu.rollout.robot_rollout import Goal, RobotRollout, RobotRolloutConfig
from curobo_tpu.cost import terms
from curobo_tpu.transition.bspline import BSplineConfig, BSplineTransition
from curobo_tpu.types.pose import Pose
from curobo_tpu.types.state import JointState

BIG = 1.0e8


@dataclasses.dataclass(frozen=True)
class TrajOptConfig:
    n_seeds: int = 4
    bspline: BSplineConfig = BSplineConfig(degree=5, n_control=16, horizon=32)
    use_particle_stage: bool = False
    # Pallas trajectory mega-kernel (ops/pallas_traj.py): the whole seed
    # solve (L-BFGS over free knots + metrics + dt retiming) is ONE kernel
    # dispatch. World is baked; falls back to blast when unsupported.
    use_pallas: bool = True
    mppi: MPPIConfig = MPPIConfig(n_particles=16, n_iters=4, init_std=0.1)
    # with pin_goal the terminal pose is exact by construction; L-BFGS
    # only shapes the path (collision/limits/smoothness) — 56 iters
    # matches 80-iter success on the motion suite at ~30 % less kernel
    # time
    lbfgs: LBFGSConfig = LBFGSConfig(history=15, n_iters=56, max_step=0.5)
    rollout: RobotRolloutConfig = RobotRolloutConfig(
        pose_cost=terms.PoseCostConfig(position_weight=2000.0, rotation_weight=1000.0),
        bound_cost=terms.BoundCostConfig(
            weight=5000.0, velocity_weight=50.0, acceleration_weight=5.0, jerk_weight=0.05
        ),
        collision_cost=terms.CollisionCostConfig(weight=500.0, activation_distance=0.02),
        self_collision_cost=terms.SelfCollisionCostConfig(weight=2000.0),
        velocity_weight=0.5,
        acceleration_weight=0.05,
        jerk_weight=0.005,
        use_swept_collision=True,
        pose_run_weight=0.0,
    )
    position_threshold: float = 0.005
    rotation_threshold: float = 0.05
    # pin the spline's far end to the seed config (the IK solution): the
    # terminal state is EXACTLY the collision-free IK result, at rest
    # (N_PIN repeated end knots) — terminal pose error becomes the IK
    # solver's (~0.1 mm), not an optimizer equilibrium (~5 mm). Reference
    # analog: the pose-boosted finetune polish (`finetune_trajopt.yml`).
    pin_goal: bool = True
    # initial trajectory duration heuristic: max joint distance scaled
    min_dt: float = 0.005
    max_dt: float = 0.15
    dt_safety: float = 1.2  # margin on the velocity-limit dt estimate
    finetune_attempts: int = 1
    finetune_dt_scale: float = 0.85
    # pose-weight boost for the LAST finetune round (the reference's
    # separate finetune trajopt raises pose cost to pull terminal error
    # under the success threshold, `finetune_trajopt.yml` /
    # `solver_trajopt.py:258`); 1.0 disables the second compiled
    # objective. With pin_goal the terminal pose is exact by
    # construction, so the boosted objective is redundant — one compiled
    # objective, and finetune rounds serve only to tighten dt.
    finetune_pose_scale: float = 1.0

    @staticmethod
    def from_yaml(path_or_dict) -> "TrajOptConfig":
        from curobo_tpu.util.config_io import dataclass_from_dict, load_yaml

        return dataclass_from_dict(TrajOptConfig, load_yaml(path_or_dict))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TrajOptResult:
    """Per-problem best trajectory + metrics."""

    trajectory: JointState  # (B, H, D) at per-problem dt
    success: jnp.ndarray  # (B,)
    dt: jnp.ndarray  # (B,) solver-state step duration
    motion_time: jnp.ndarray  # (B,) = dt * (H - 1)
    position_error: jnp.ndarray  # (B,)
    rotation_error: jnp.ndarray  # (B,)
    cost: jnp.ndarray  # (B,)
    free_knots: jnp.ndarray  # (B, n_free, D) best spline knots (for resample)
    # pinned terminal config (B, D) when cfg.pin_goal, else None
    q_end: Optional[jnp.ndarray] = None


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class _SeedSolveOut:
    free_knots: jnp.ndarray  # (B, S, n_free, D)
    cost: jnp.ndarray  # (B, S)
    feasible: jnp.ndarray
    converged: jnp.ndarray
    pos_err: jnp.ndarray
    rot_err: jnp.ndarray
    dt_retimed: jnp.ndarray  # (B, S) dt that fits vel/acc/jerk limits


class TrajOptSolver:
    def __init__(self, params: KinematicsParams, cfg: TrajOptConfig = TrajOptConfig()):
        self.params = params
        self.cfg = cfg
        self.rollout = RobotRollout(params, cfg.rollout)
        from curobo_tpu.ops.blast import BlastRollout

        self._blast = BlastRollout(params, cfg.rollout)
        self._ft_rollout_cfg = self._scaled_rollout_cfg()
        self.rollout_ft = RobotRollout(params, self._ft_rollout_cfg)
        self._blast_ft = BlastRollout(params, self._ft_rollout_cfg)
        self.transition = BSplineTransition(cfg.bspline)
        self._solve_jit = jax.jit(self._solve_seeds)
        import functools

        # whole solve — finetune rounds, best-seed merge, final rollout +
        # feasibility — as ONE jit: the per-round eager glue (seed takes,
        # merges, the final evaluate_trajectory) otherwise dispatches
        # dozens of eager ops per plan (measured ~1.2 s of a 4.3 s B=1
        # trajopt through the axon tunnel)
        self._finetune_xla = jax.jit(
            functools.partial(
                self._finetune_impl,
                solve_fn=self._solve_seeds,
                solve_fn_ft=functools.partial(self._solve_seeds, finetune=True),
            )
        )
        from curobo_tpu.solver._cache import WorldKeyedCache

        self._pallas_cache = WorldKeyedCache(self._build_pallas_solver)

    def _scaled_rollout_cfg(self):
        """Rollout config with pose weights boosted for the last finetune
        round (reference `finetune_trajopt.yml` semantics)."""
        cfg = self.cfg
        s = cfg.finetune_pose_scale
        if s == 1.0:
            return cfg.rollout
        pc = cfg.rollout.pose_cost
        return dataclasses.replace(
            cfg.rollout,
            pose_cost=dataclasses.replace(
                pc,
                position_weight=pc.position_weight * s,
                rotation_weight=pc.rotation_weight * s,
            ),
        )

    # ------------------------------------------------------------------
    def _build_pallas_solver(self, world):
        import functools

        from curobo_tpu.ops.pallas_traj import PallasTrajCost

        cfg = self.cfg
        mp, lb = cfg.mppi, cfg.lbfgs
        kernel_opts = dict(
            mppi_iters=mp.n_iters if cfg.use_particle_stage else 0,
            n_particles=mp.n_particles,
            init_std=float(mp.init_std),
            std_decay=mp.std_decay,
            min_std=mp.min_std,
            temperature=mp.temperature,
            step_size=mp.step_size,
            lbfgs_iters=lb.n_iters,
            history=lb.history,
            max_step=lb.max_step,
        )
        ptc = PallasTrajCost(
            self.params, cfg.rollout, world, cfg.bspline,
            pin_goal=cfg.pin_goal,
        )
        solve_kernel = ptc.build_solver(**kernel_opts)
        solve_fn = functools.partial(
            self._solve_seeds_pallas, solve_kernel=solve_kernel
        )
        solve_fn_ft = solve_fn
        if cfg.finetune_pose_scale != 1.0 and cfg.finetune_attempts > 0:
            # second compiled objective with boosted pose weights for the
            # last round (no MPPI — it's a precision polish of warm starts)
            ptc_ft = PallasTrajCost(
                self.params, self._ft_rollout_cfg, world, cfg.bspline,
                pin_goal=cfg.pin_goal,
            )
            ft_kernel = ptc_ft.build_solver(
                **{**kernel_opts, "mppi_iters": 0}
            )
            solve_fn_ft = functools.partial(
                self._solve_seeds_pallas, solve_kernel=ft_kernel
            )
        return jax.jit(
            functools.partial(
                self._finetune_impl, solve_fn=solve_fn, solve_fn_ft=solve_fn_ft
            )
        )

    def _use_pallas(self, world, goal) -> bool:
        from curobo_tpu.ops.blast import BlastRollout
        from curobo_tpu.ops.pallas_ik import world_is_supported
        from curobo_tpu.ops.pallas_traj import traj_config_is_supported

        return (
            self.cfg.use_pallas
            # the trajectory kernel tracks ONE tool frame; multi-tool goals
            # route to the blast path, which sums pose cost over tools
            and self.params.n_tools == 1
            and BlastRollout.supports(self.params, goal, self.cfg.rollout)
            and world_is_supported(world)
            and traj_config_is_supported(self.cfg.rollout)
            and goal.goal_cspace is None
            and runtime.pallas_backend_ok()
        )

    def _solve_seeds_pallas(
        self,
        world: world_mod.WorldData,  # unused (baked); call-signature parity
        goal: Goal,
        q_start: jnp.ndarray,
        free0: jnp.ndarray,
        dt: jnp.ndarray,
        key: jax.Array,
        q_end: Optional[jnp.ndarray] = None,  # (B, S, D) pinned terminal
        solve_kernel=None,
    ) -> _SeedSolveOut:
        cfg = self.cfg
        B, S, n_free, D = free0.shape
        goal_s = goal.tile_seeds(S)
        goal7 = jnp.concatenate(
            [goal_s.goal_pos[..., 0, 0, :], goal_s.goal_quat[..., 0, 0, :]], axis=-1
        ).reshape(B * S, 7)
        qs = jnp.broadcast_to(q_start[:, None], (B, S, D)).reshape(B * S, D)
        seed_scalar = jax.random.randint(key, (), 0, 2**31 - 1)
        x, c, pe, re, fe, dt_ret = solve_kernel(
            goal7, free0.reshape(B * S, n_free * D), qs, dt.reshape(B * S),
            seed_scalar, world,
            q_end=None if q_end is None else q_end.reshape(B * S, D),
        )
        shape2 = (B, S)
        pe = pe.reshape(shape2)
        re = re.reshape(shape2)
        feas = fe.reshape(shape2) > 0.5
        conv = (
            (pe <= cfg.position_threshold) & (re <= cfg.rotation_threshold) & feas
        )
        return _SeedSolveOut(
            free_knots=x.reshape(B, S, n_free, D),
            cost=c.reshape(shape2),
            feasible=feas,
            converged=conv,
            pos_err=pe,
            rot_err=re,
            dt_retimed=jnp.clip(
                dt_ret.reshape(shape2), cfg.min_dt, cfg.max_dt
            ),
        )

    def _traj_rollout(self, goal: Goal, finetune: bool = False):
        """Pick the B-last fast path when the problem shape supports it."""
        from curobo_tpu.ops.blast import BlastRollout

        if (
            BlastRollout.supports(self.params, goal, self.cfg.rollout)
            and self.cfg.rollout.torque_limit_weight == 0.0
        ):
            return self._blast_ft if finetune else self._blast
        return self.rollout_ft if finetune else self.rollout

    # ------------------------------------------------------------------
    def estimate_dt(self, q_start: jnp.ndarray, q_end: jnp.ndarray) -> jnp.ndarray:
        """Per-problem dt from the velocity-limit time of the joint motion.

        Parity: reference per-seed dt estimate (`solver_trajopt.py:322-333`).
        """
        cfg = self.cfg
        H = cfg.bspline.horizon
        dq = jnp.abs(q_end - q_start)
        # time to traverse at velocity limit (per joint), take the max; the
        # B-spline's peak velocity exceeds the mean by ~1.75x for clamped ends.
        t_vel = jnp.max(dq / self.params.joint_limits.velocity, axis=-1) * 1.75
        t_acc = jnp.sqrt(
            jnp.max(6.0 * dq / self.params.joint_limits.acceleration, axis=-1)
        )
        T = cfg.dt_safety * jnp.maximum(t_vel, t_acc)
        return jnp.clip(T / (H - 1), cfg.min_dt, cfg.max_dt)

    def _retime_dt(self, traj: JointState, dt: jnp.ndarray) -> jnp.ndarray:
        """Smallest dt under which the (shape-fixed) spline respects limits."""
        lim = self.params.joint_limits
        rv = jnp.max(jnp.abs(traj.velocity) / lim.velocity, axis=(-1, -2))
        ra = jnp.max(jnp.abs(traj.acceleration) / lim.acceleration, axis=(-1, -2))
        rj = jnp.max(jnp.abs(traj.jerk) / lim.jerk, axis=(-1, -2))
        scale = jnp.maximum(rv, jnp.maximum(jnp.sqrt(ra), jnp.cbrt(rj)))
        return jnp.clip(dt * scale * 1.01, self.cfg.min_dt, self.cfg.max_dt)

    # ------------------------------------------------------------------
    def _solve_seeds(
        self,
        world: world_mod.WorldData,
        goal: Goal,  # (B,)
        q_start: jnp.ndarray,  # (B, D)
        free0: jnp.ndarray,  # (B, S, n_free, D) initial knots
        dt: jnp.ndarray,  # (B, S)
        key: jax.Array,
        q_end: Optional[jnp.ndarray] = None,  # (B, S, D) pinned terminal
        finetune: bool = False,
    ) -> _SeedSolveOut:
        cfg = self.cfg
        B, S, n_free, D = free0.shape
        goal_s = goal.tile_seeds(S)
        qs = jnp.broadcast_to(q_start[:, None], (B, S, D))
        rollout = self._traj_rollout(goal, finetune=finetune)

        def traj_of(x):
            # x: (..., B, S, n_free * D) with optional leading axes
            knots = x.reshape(x.shape[:-1] + (n_free, D))
            return self.transition.rollout(knots, qs, dt, q_goal=q_end)

        def cost(x):
            traj = traj_of(x)
            return rollout.evaluate_trajectory(world, goal_s, traj).cost

        x = free0.reshape(B, S, n_free * D)
        if cfg.use_particle_stage:
            with jax.named_scope("trajopt.mppi"):
                x, _ = mppi_optimize(cost, x, key, cfg.mppi)
        with jax.named_scope("trajopt.lbfgs"):
            x, _ = lbfgs_optimize(cost, x, cfg.lbfgs)

        with jax.named_scope("trajopt.metrics"):
            traj = traj_of(x)
            res = rollout.evaluate_trajectory(world, goal_s, traj)
        conv = res.converged(cfg.position_threshold, cfg.rotation_threshold)
        dt_ret = self._retime_dt(traj, dt)
        return _SeedSolveOut(
            free_knots=x.reshape(B, S, n_free, D),
            cost=res.cost,
            feasible=res.feasible,
            converged=conv,
            pos_err=res.pos_err,
            rot_err=res.rot_err,
            dt_retimed=dt_ret,
        )

    # ------------------------------------------------------------------
    def solve_pose(
        self,
        world: world_mod.WorldData,
        goal_pose: Pose,  # (B,)
        q_start: jnp.ndarray,  # (B, D)
        seed_q: jnp.ndarray,  # (B, S, D) end configurations (IK solutions)
        key: Optional[jax.Array] = None,
        seed_paths: Optional[jnp.ndarray] = None,  # (B, S, P, D) waypoint paths
    ) -> TrajOptResult:
        """Plan trajectories from q_start to pose goals, seeded by IK results
        (and optionally by graph-planner waypoint paths)."""
        from curobo_tpu.util.checks import check_joint_config, check_pose_batch

        check_pose_batch("goal_pose", goal_pose)
        q_start = check_joint_config("q_start", q_start, self.params.n_dof)
        seed_q = check_joint_config("seed_q", seed_q, self.params.n_dof)
        goal = Goal.from_pose(goal_pose)
        return self._solve(world, goal, q_start, seed_q, key, seed_paths)

    def solve_cspace(
        self,
        world: world_mod.WorldData,
        goal_q: jnp.ndarray,  # (B, D)
        q_start: jnp.ndarray,  # (B, D)
        key: Optional[jax.Array] = None,
    ) -> TrajOptResult:
        """Plan to a joint-space goal (pose cost replaced by cspace cost).

        Parity: reference `TrajOptSolver.solve_cspace` (`solver_trajopt.py:830`).
        """
        # Synthesize the goal pose from FK of the goal config so pose metrics
        # stay meaningful, and add the cspace target.
        from curobo_tpu.robot import kinematics as kin_mod

        st = kin_mod.compute_kinematics(self.params, goal_q)
        pose = Pose(st.tool_pose.position, st.tool_pose.quaternion)
        goal = Goal.from_pose(Pose(pose.position[:, 0], pose.quaternion[:, 0]))
        goal = dataclasses.replace(goal, goal_cspace=goal_q)
        seed_q = goal_q[:, None]  # single seed: the goal config itself
        return self._solve(world, goal, q_start, seed_q, key)

    # ------------------------------------------------------------------
    def _solve(self, world, goal, q_start, seed_q, key, seed_paths=None) -> TrajOptResult:
        world = world.anonymized()  # names are static jit keys
        if key is None:
            key = jax.random.PRNGKey(0)

        use_pallas = self._use_pallas(world, goal) and not self._pallas_cache.is_broken(
            world
        )
        impl = self._pallas_cache.get(world) if use_pallas else self._finetune_xla
        try:
            return impl(world, goal, q_start, seed_q, seed_paths, key)
        except jax.errors.JaxRuntimeError as e:
            if not use_pallas:
                raise
            from curobo_tpu.util.logging import log_warn

            log_warn(
                "pallas trajopt solver failed for this world envelope "
                f"({str(e)[:160]}); falling back to the XLA path"
            )
            self._pallas_cache.mark_broken(world)
            return self._finetune_xla(world, goal, q_start, seed_q, seed_paths, key)

    def _finetune_impl(
        self, world, goal, q_start, seed_q, seed_paths, key, solve_fn=None,
        solve_fn_ft=None,
    ) -> TrajOptResult:
        """Seed construction + finetune rounds + per-problem best-seed
        merge + final rollout and feasibility, traced as one program
        (jitted per compute path). Seed construction lives INSIDE the jit
        (r5: the eager linear_seed/estimate_dt prologue was ~10 dispatches
        per plan). The LAST round runs the pose-boosted finetune objective
        (solve_fn_ft) when configured."""
        cfg = self.cfg
        B, S, D = seed_q.shape
        pin = cfg.pin_goal
        if seed_paths is not None:
            free0 = self.transition.path_seed(seed_paths, q_goal_pinned=pin)
        else:
            free0 = self.transition.linear_seed(
                jnp.broadcast_to(q_start[:, None], (B, S, D)), seed_q,
                q_goal_pinned=pin,
            )
        q_end = seed_q if pin else None
        dt = jnp.broadcast_to(self.estimate_dt(q_start[:, None], seed_q), (B, S))
        best = None  # per-problem best tracker (traced)
        for attempt in range(cfg.finetune_attempts + 1):
            fn = (
                solve_fn_ft
                if (solve_fn_ft is not None and attempt == cfg.finetune_attempts
                    and attempt > 0)
                else solve_fn
            )
            out = fn(world, goal, q_start, free0, dt, key, q_end)
            ok = out.converged  # (B, S)
            # candidate score: feasible+converged -> motion time, else BIG
            mt = out.dt_retimed * (cfg.bspline.horizon - 1)
            score = jnp.where(ok, mt, BIG + out.pos_err)
            si = jnp.argmin(score, axis=-1)  # (B,)

            def take(a):
                return jnp.take_along_axis(
                    a, si.reshape((B,) + (1,) * (a.ndim - 1)), axis=1
                )[:, 0]

            cand = {
                "free_knots": take(out.free_knots),
                "dt": take(out.dt_retimed),
                "score": take(score),
                "pos_err": take(out.pos_err),
                "rot_err": take(out.rot_err),
                "cost": take(out.cost),
                "success": take(ok),
            }
            if q_end is not None:
                cand["q_end"] = take(q_end)
            if best is None:
                best = cand
            else:
                better = cand["score"] < best["score"]
                best = {
                    k: jnp.where(
                        better.reshape((B,) + (1,) * (v.ndim - 1)), cand[k], v
                    )
                    for k, v in best.items()
                }

            if attempt < cfg.finetune_attempts:
                # warm-start next round from the current solutions, with the
                # retimed dt tightened toward minimum motion time
                free0 = out.free_knots
                dt = jnp.clip(
                    out.dt_retimed * cfg.finetune_dt_scale, cfg.min_dt, cfg.max_dt
                )

        # materialize the best trajectory at its retimed dt
        best_q_end = best.get("q_end")
        traj = self.transition.rollout(
            best["free_knots"], q_start, best["dt"], q_goal=best_q_end,
            joint_names=self.params.joint_names,
        )
        # final feasibility at the retimed dt
        res = self._traj_rollout(goal).evaluate_trajectory(world, goal, traj)
        conv = res.converged(cfg.position_threshold, cfg.rotation_threshold)
        return TrajOptResult(
            trajectory=traj,
            success=conv & best["success"],
            dt=best["dt"],
            motion_time=best["dt"] * (cfg.bspline.horizon - 1),
            position_error=res.pos_err,
            rotation_error=res.rot_err,
            cost=res.cost,
            free_knots=best["free_knots"],
            q_end=best_q_end,
        )

    # ------------------------------------------------------------------
    def interpolate(
        self, result: TrajOptResult, q_start: jnp.ndarray, dt_out: float,
        h_out: Optional[int] = None,
    ) -> JointState:
        """Resample best trajectories to a fixed control rate.

        Parity: reference control-rate resampler (`util/warp_interpolation.py:125`).
        All problems are resampled onto the max horizon so shapes stay static;
        per-problem times beyond motion_time clamp to the final state.
        h_out pins the output horizon (static shape across calls — no
        retrace per batch; the reference's fixed interpolation buffer).
        """
        if h_out is not None:
            H_out = h_out
        else:
            H_out = int(np.ceil(float(jnp.max(result.motion_time)) / dt_out)) + 1
        ctrl = self.transition.assemble_control(
            result.free_knots, q_start, q_goal=result.q_end
        )
        t = jnp.arange(H_out) * dt_out  # (H_out,)
        t_norm = t / result.motion_time[:, None]  # (B, H_out)
        q = self.transition.evaluate_at(ctrl, result.dt, jnp.clip(t_norm, 0.0, 1.0))
        vel = jnp.gradient(q, axis=-2) / dt_out
        acc = jnp.gradient(vel, axis=-2) / dt_out
        return JointState(
            position=q, velocity=vel, acceleration=acc,
            dt=jnp.full(result.dt.shape, dt_out),
            joint_names=self.params.joint_names,
        )
