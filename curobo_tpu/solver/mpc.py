"""Model-predictive control solver: warm-started receding-horizon MPPI.

Parity: reference `MPCSolver` (`curobo/_src/solver/solver_mpc.py:33`,
`optimize_action_sequence:581`, `_solve_impl:661`): shift-by-one warm start,
state filtering (`util/state_filter.py:45`), feasibility mask + safe
deceleration fallback (:700-760). The per-tick solve (sampling + rollout +
distribution update) is one jit — the CUDA-graph-replay analog — so the
host does only state upload / command download per tick.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from curobo_tpu.cost import terms
from curobo_tpu import runtime
from curobo_tpu.geom import world as world_mod
from curobo_tpu.opt.lbfgs import LBFGSConfig, lbfgs_optimize
from curobo_tpu.opt.mppi import MPPIConfig, mppi_optimize, smooth_sample_transform
from curobo_tpu.robot.params import KinematicsParams
from curobo_tpu.rollout.robot_rollout import Goal, RobotRollout, RobotRolloutConfig
from curobo_tpu.transition.bspline import BSplineConfig, BSplineTransition
from curobo_tpu.types.pose import Pose
from curobo_tpu.types.state import JointState


@dataclasses.dataclass(frozen=True)
class MPCConfig:
    bspline: BSplineConfig = BSplineConfig(degree=3, n_control=10, horizon=24)
    # Pallas trajectory mega-kernel per tick: the whole MPPI+L-BFGS tick
    # optimization is ONE kernel dispatch (ops/pallas_traj.py).
    use_pallas: bool = True
    # exploration stage (escapes local minima around obstacles)
    use_particle_stage: bool = True
    mppi: MPPIConfig = MPPIConfig(
        n_particles=64, n_iters=2, init_std=0.08, std_decay=0.9, temperature=0.02
    )
    # gradient refinement per tick (reference lbfgs_mpc.yml mode)
    use_gradient_stage: bool = True
    lbfgs: LBFGSConfig = LBFGSConfig(history=8, n_iters=8, max_step=0.3)
    control_dt: float = 0.03  # horizon step duration
    rollout: RobotRolloutConfig = RobotRolloutConfig(
        pose_cost=terms.PoseCostConfig(position_weight=150.0, rotation_weight=60.0),
        bound_cost=terms.BoundCostConfig(
            weight=5000.0, velocity_weight=20.0, acceleration_weight=0.5
        ),
        collision_cost=terms.CollisionCostConfig(weight=1000.0, activation_distance=0.03),
        self_collision_cost=terms.SelfCollisionCostConfig(weight=5000.0),
        velocity_weight=0.1,
        acceleration_weight=0.01,
        jerk_weight=0.0,
        use_swept_collision=True,
        pose_run_weight=0.5,
    )
    # state filter blending (measured vs predicted), 1.0 = trust measurement
    state_filter_alpha: float = 1.0
    # deceleration fallback: max fraction of velocity kept per step
    brake_decay: float = 0.75
    cold_start_iters: int = 4  # extra MPPI iteration multiplier on first tick

    @staticmethod
    def from_yaml(path_or_dict) -> "MPCConfig":
        from curobo_tpu.util.config_io import dataclass_from_dict, load_yaml

        return dataclass_from_dict(MPCConfig, load_yaml(path_or_dict))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MPCState:
    """Carried across ticks (warm start)."""

    free_knots: jnp.ndarray  # (B, n_free, D)
    q_filtered: jnp.ndarray  # (B, D)
    key: jax.Array


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MPCResult:
    command: JointState  # (B, D) next command (position + velocity)
    plan: JointState  # (B, H, D) full horizon plan
    cost: jnp.ndarray  # (B,)
    feasible: jnp.ndarray  # (B,) plan passes collision/bounds
    pos_err: jnp.ndarray
    rot_err: jnp.ndarray


class MPCSolver:
    def __init__(self, params: KinematicsParams, cfg: MPCConfig = MPCConfig()):
        self.params = params
        self.cfg = cfg
        self.rollout = RobotRollout(params, cfg.rollout)
        from curobo_tpu.ops.blast import BlastRollout

        self._blast = BlastRollout(params, cfg.rollout)
        self.transition = BSplineTransition(cfg.bspline)
        # STOMP-style smooth noise over the knot axis: random particles stay
        # low-acceleration, so exploration isn't killed by bound costs.
        self._smooth_L = smooth_sample_transform(cfg.bspline.n_free, params.n_dof)
        self._step_jit = jax.jit(self._step_impl)
        from curobo_tpu.solver._cache import WorldKeyedCache

        self._pallas_cache = WorldKeyedCache(self._build_pallas_step)
        self._ticker_cache = WorldKeyedCache(self._build_ticker_pallas)
        self._generic_ticker = jax.jit(self._ticks_impl)

    # ------------------------------------------------------------------
    def _build_pallas_step(self, world):
        import functools

        return jax.jit(
            functools.partial(
                self._step_impl_pallas,
                solve_kernel=self._build_pallas_kernel(world),
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

    def _step_impl_pallas(
        self,
        world: world_mod.WorldData,
        goal: Goal,
        state: MPCState,
        q_measured: jnp.ndarray,
        qd_measured: jnp.ndarray,
        solve_kernel=None,
    ) -> Tuple[MPCResult, MPCState]:
        cfg = self.cfg
        p = self.params
        B, D = q_measured.shape
        dt = jnp.full((B,), cfg.control_dt)
        a = cfg.state_filter_alpha
        q0 = a * q_measured + (1.0 - a) * state.q_filtered

        goal7 = jnp.concatenate(
            [goal.goal_pos[..., 0, 0, :], goal.goal_quat[..., 0, 0, :]], axis=-1
        )
        key, sub = jax.random.split(state.key)
        seed_scalar = jax.random.randint(sub, (), 0, 2**31 - 1)
        x, c, pe, re, fe, _ = solve_kernel(
            goal7, state.free_knots.reshape(B, -1), q0, dt, seed_scalar, world
        )
        knots = x.reshape(B, cfg.bspline.n_free, D)
        traj = self.transition.rollout(knots, q0, dt, joint_names=p.joint_names)
        return self._finish_step(
            knots, traj, q0, qd_measured, fe > 0.5, c, pe, re, key, dt
        )

    # ------------------------------------------------------------------
    def setup(self, q_start: jnp.ndarray, key=None) -> MPCState:
        """Initialize warm-start state. Parity: `MPCSolver.setup` (:261)."""
        B, D = q_start.shape
        free = self.transition.linear_seed(q_start, q_start)  # hold position
        if key is None:
            key = jax.random.PRNGKey(0)
        return MPCState(free_knots=free, q_filtered=q_start, key=key)

    def make_goal(self, goal_pose: Pose) -> Goal:
        return Goal.from_pose(goal_pose)

    # ------------------------------------------------------------------
    def _step_impl(
        self,
        world: world_mod.WorldData,
        goal: Goal,
        state: MPCState,
        q_measured: jnp.ndarray,  # (B, D)
        qd_measured: jnp.ndarray,  # (B, D)
    ) -> Tuple[MPCResult, MPCState]:
        cfg = self.cfg
        p = self.params
        B, D = q_measured.shape
        dt = jnp.full((B,), cfg.control_dt)

        # state filter (reference JointStateFilter)
        a = cfg.state_filter_alpha
        q0 = a * q_measured + (1.0 - a) * state.q_filtered

        from curobo_tpu.ops.blast import BlastRollout

        rollout = (
            self._blast
            if BlastRollout.supports(p, goal, cfg.rollout)
            and cfg.rollout.torque_limit_weight == 0.0
            else self.rollout
        )

        def cost(x):  # (..., B, n_free*D)
            knots = x.reshape(x.shape[:-1] + (cfg.bspline.n_free, D))
            traj = self.transition.rollout(knots, q0, dt)
            return rollout.evaluate_trajectory(world, goal, traj).cost

        n_free = cfg.bspline.n_free

        def smooth_eps(eps):  # (P, B, n_free * D) -> smooth over knot axis
            e = eps.reshape(eps.shape[:-1] + (n_free, D))
            e = jnp.einsum("kj,...jd->...kd", self._smooth_L, e)
            return e.reshape(eps.shape)

        key, sub = jax.random.split(state.key)
        x = state.free_knots.reshape(B, -1)
        if cfg.use_particle_stage:
            with jax.named_scope("mpc.mppi"):
                x, _ = mppi_optimize(
                    cost, x, sub, cfg.mppi, eps_transform=smooth_eps
                )
        if cfg.use_gradient_stage:
            x, _ = lbfgs_optimize(cost, x, cfg.lbfgs)
        knots = x.reshape(B, cfg.bspline.n_free, D)
        traj = self.transition.rollout(knots, q0, dt, joint_names=p.joint_names)
        res = rollout.evaluate_trajectory(world, goal, traj)
        return self._finish_step(
            knots, traj, q0, qd_measured, res.feasible,
            res.cost, res.pos_err, res.rot_err, key, dt,
        )

    def _finish_step(
        self, knots, traj, q0, qd_measured, feasible, cost, pos_err, rot_err,
        key, dt,
    ) -> Tuple[MPCResult, MPCState]:
        """Shared tick tail: brake fallback + command extraction + warm start."""
        cfg = self.cfg
        p = self.params
        # safe deceleration fallback for infeasible plans: exponential
        # velocity bleed-off from the measured state.
        H = cfg.bspline.horizon
        decay = cfg.brake_decay ** jnp.arange(1, H + 1)
        # integrate the braking velocity profile
        brake_v = qd_measured[:, None, :] * decay[:, None]  # (B, H, D)
        brake_q = q0[:, None, :] + jnp.cumsum(brake_v, axis=1) * cfg.control_dt
        plan_q = jnp.where(feasible[:, None, None], traj.position, brake_q)
        plan_v = jnp.where(feasible[:, None, None], traj.velocity, brake_v)
        plan_a = jnp.where(
            feasible[:, None, None],
            traj.acceleration,
            jnp.zeros_like(traj.acceleration),
        )
        plan = JointState(
            position=plan_q, velocity=plan_v, acceleration=plan_a,
            dt=dt, joint_names=p.joint_names,
        )

        command = JointState(
            position=plan_q[:, 1], velocity=plan_v[:, 1],
            acceleration=plan_a[:, 1], joint_names=p.joint_names,
        )

        # warm start: carry the optimized free knots to the next tick
        # unchanged — re-pinning the start state to the advanced robot state
        # is itself the receding-horizon shift (control points are basis
        # coefficients, not curve samples, so value-refitting would distort
        # the plan; cf. reference shift-by-1 at `gradient_opt_core.py:558`).
        new_state = MPCState(
            free_knots=knots, q_filtered=plan_q[:, 1], key=key
        )
        result = MPCResult(
            command=command, plan=plan, cost=cost,
            feasible=feasible, pos_err=pos_err, rot_err=rot_err,
        )
        return result, new_state

    # ------------------------------------------------------------------
    # Device-resident closed-loop rollout: `lax.scan` over ticks with the
    # measured state fed back from the previous command (perfect-tracking
    # assumption). One dispatch runs the WHOLE control episode — this is
    # both the deployment shape for on-device control loops and the honest
    # way to measure tick throughput when every blocking host<->device
    # round-trip costs ~25 ms of tunnel RTT (the reference's analog keeps
    # the tick inside one CUDA-graph replay, `solver_mpc.py:661`).
    def _ticks_body(self, impl, worlds, goal, state0, q0, qd0):
        def body(carry, w_t):
            state, q, qd = carry
            res, state = impl(w_t, goal, state, q, qd)
            return (state, res.command.position, res.command.velocity), res

        (state, _, _), results = jax.lax.scan(body, (state0, q0, qd0), worlds)
        return results, state

    def _ticks_impl(self, worlds, goal, state0, q0, qd0):
        return self._ticks_body(self._step_impl, worlds, goal, state0, q0, qd0)

    def _build_ticker_pallas(self, worlds):
        import functools

        w0 = jax.tree.map(lambda a: a[0], worlds)
        impl = functools.partial(
            self._step_impl_pallas,
            solve_kernel=self._build_pallas_kernel(w0),
        )
        return jax.jit(functools.partial(self._ticks_body, impl))

    def _build_pallas_kernel(self, world):
        from curobo_tpu.ops.pallas_traj import PallasTrajCost
        import numpy as np

        cfg = self.cfg
        ptc = PallasTrajCost(self.params, cfg.rollout, world, cfg.bspline)
        mp, lb = cfg.mppi, cfg.lbfgs
        return ptc.build_solver(
            mppi_iters=mp.n_iters if cfg.use_particle_stage else 0,
            n_particles=mp.n_particles,
            init_std=float(mp.init_std),
            std_decay=mp.std_decay,
            min_std=mp.min_std,
            temperature=mp.temperature,
            step_size=mp.step_size,
            lbfgs_iters=lb.n_iters if cfg.use_gradient_stage else 0,
            history=lb.history,
            max_step=lb.max_step,
            eps_smooth=np.asarray(self._smooth_L),
        )

    def run_ticks(
        self,
        worlds: world_mod.WorldData,  # leaves stacked (T, ...) — one per tick
        goal: Goal,
        state: MPCState,
        joint_state: JointState,  # measured (B, D) at tick 0
    ) -> Tuple[MPCResult, MPCState]:
        """Run T ticks in ONE dispatch. Returns per-tick stacked MPCResult
        (leading T axis) + the final warm-start state."""
        worlds = worlds.anonymized()  # names are static jit keys
        q0 = joint_state.position
        qd0 = (
            joint_state.velocity
            if joint_state.velocity is not None
            else jnp.zeros_like(q0)
        )
        w0 = jax.tree.map(lambda a: a[0], worlds)
        if self._use_pallas(w0, goal) and not self._ticker_cache.is_broken(worlds):
            ticker = self._ticker_cache.get(worlds)
            try:
                return ticker(worlds, goal, state, q0, qd0)
            except jax.errors.JaxRuntimeError as e:
                from curobo_tpu.util.logging import log_warn

                log_warn(
                    "pallas MPC ticker failed for this world envelope "
                    f"({str(e)[:160]}); falling back to the XLA path"
                )
                self._ticker_cache.mark_broken(worlds)
        return self._generic_ticker(worlds, goal, state, q0, qd0)

    # ------------------------------------------------------------------
    def step(
        self,
        world: world_mod.WorldData,
        goal: Goal,
        state: MPCState,
        joint_state: JointState,  # measured (B, D)
    ) -> Tuple[MPCResult, MPCState]:
        """One control tick. Parity: `optimize_action_sequence` (:581)."""
        from curobo_tpu.util.checks import check_joint_config

        world = world.anonymized()  # names are static jit keys

        check_joint_config("joint_state.position", joint_state.position, self.params.n_dof)
        qd = (
            joint_state.velocity
            if joint_state.velocity is not None
            else jnp.zeros_like(joint_state.position)
        )
        if self._use_pallas(world, goal) and not self._pallas_cache.is_broken(world):
            step = self._pallas_cache.get(world)
            try:
                return step(world, goal, state, joint_state.position, qd)
            except jax.errors.JaxRuntimeError as e:
                from curobo_tpu.util.logging import log_warn

                log_warn(
                    "pallas MPC step failed for this world envelope "
                    f"({str(e)[:160]}); falling back to the XLA path"
                )
                self._pallas_cache.mark_broken(world)
        return self._step_jit(world, goal, state, joint_state.position, qd)
