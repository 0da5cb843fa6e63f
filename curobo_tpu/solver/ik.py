"""Collision-free batched inverse kinematics solver.

Parity: reference `IKSolver` (`curobo/_src/solver/solver_ik.py:98`,
`_solve_impl:363`): goal buffer -> seeds -> MPPI stage -> L-BFGS stage ->
metrics -> per-problem best-seed selection (`stable_topk` analog). The whole
solve — both optimizer stages, metrics and seed selection — is one jit
(the CUDA-graph analog); seeds fold into the batch axis and shard across a
device mesh with the problems axis.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from curobo_tpu import runtime
from curobo_tpu.cost import terms
from curobo_tpu.geom import world as world_mod
from curobo_tpu.opt.lbfgs import LBFGSConfig, lbfgs_optimize
from curobo_tpu.opt.mppi import MPPIConfig, mppi_optimize
from curobo_tpu.robot.params import KinematicsParams
from curobo_tpu.rollout.robot_rollout import Goal, RobotRollout, RobotRolloutConfig
from curobo_tpu.types.pose import Pose
from curobo_tpu.util.sampling import halton_sequence

BIG = 1.0e8


@dataclasses.dataclass(frozen=True)
class IKConfig:
    n_seeds: int = 32
    # B-last fused compute path (ops/blast.py) when the problem shape
    # supports it (single tool, single goal) — large TPU speedup.
    use_blast: bool = True
    # Pallas mega-kernel (ops/pallas_ik.py): the whole solve (MPPI stage +
    # L-BFGS + metrics) is ONE fused TPU kernel. World values are kernel
    # inputs; kernels compile once per obstacle-capacity envelope.
    use_pallas: bool = True
    use_particle_stage: bool = True
    # gradient (L-BFGS) polish stage; False = particle-only solve (no
    # backward graph — e.g. gradient-hostile costs, or CPU tests where
    # the vjp of a humanoid-scale rollout is minutes of XLA compile)
    use_gradient_stage: bool = True
    # LM seed-IK warm start: batched Levenberg-Marquardt on the pose-only
    # residual refines every seed before the optimizer stages (reference
    # `use_lm_seed`, `seed_ik/seed_ik_solver.py:48,578`) — the main lever
    # for success rate at low iteration counts.
    use_lm_seed: bool = False
    lm_seed_iters: int = 10
    # LM trust-region step cap (rad/m per iteration). Floating-base robots
    # need > the 0.5 default: the base must translate meters to the goal,
    # and pose error is linear in it (G1 protocol: 1.5 converges all
    # sampled goals to <= 3.5 mm in 60 iters; 0.5 starves).
    lm_step_clip: float = 0.5
    # LM seed POOL (reference `seed_solver_num_seeds`, 128 for G1): refine
    # this many seeds with LM and keep the best `n_seeds` by LM residual
    # for the optimizer stages. 0 = refine exactly n_seeds in place.
    lm_seed_pool: int = 0
    # Pallas-path analog of the LM warm start: a pose-only (no collision
    # terms) in-kernel L-BFGS stage before MPPI/L-BFGS — same role at
    # ~10x lower per-eval cost, and no extra kernel dispatch.
    warmup_iters: int = 0
    # in-kernel backtracking line-search budget (evals per L-BFGS iter);
    # the candidate ladder is ls_base * ls_ratio**k, k < kernel_linesearch
    kernel_linesearch: int = 6
    kernel_ls_base: float = 1.5
    kernel_ls_ratio: float = 0.45
    mppi: MPPIConfig = MPPIConfig(n_particles=32, n_iters=8, init_std=0.6)
    lbfgs: LBFGSConfig = LBFGSConfig(history=12, n_iters=40)
    # IK treats scene collision as a CONSTRAINT at contact (activation 0),
    # not a standoff: the reference's IK config
    # (`configs/task/ik/lbfgs_ik.yml`: scene_collision activation 0.00,
    # weight 5000). A nonzero activation pushes goals within `activation`
    # of an obstacle off the pose target — near-surface (e.g. tabletop
    # grasp) goals become unsolvable by exactly that margin.
    rollout: RobotRolloutConfig = RobotRolloutConfig(
        collision_cost=terms.CollisionCostConfig(
            weight=500.0, activation_distance=0.0
        )
    )
    position_threshold: float = 0.005
    rotation_threshold: float = 0.05

    @staticmethod
    def from_yaml(path_or_dict) -> "IKConfig":
        from curobo_tpu.util.config_io import dataclass_from_dict, load_yaml

        return dataclass_from_dict(IKConfig, load_yaml(path_or_dict))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class IKResult:
    """Per-problem best solution + per-seed data for downstream seeding."""

    solution: jnp.ndarray  # (B, D)
    success: jnp.ndarray  # (B,) bool
    position_error: jnp.ndarray  # (B,)
    rotation_error: jnp.ndarray  # (B,)
    cost: jnp.ndarray  # (B,)
    seed_solutions: jnp.ndarray  # (B, S, D) all optimized seeds
    seed_success: jnp.ndarray  # (B, S) bool


class IKSolver:
    """Batched collision-aware IK. Build once per (robot, config); the world
    and goals are per-call pytree arguments (no retrace on world updates)."""

    def __init__(
        self,
        params: KinematicsParams,
        cfg: IKConfig = IKConfig(),
    ):
        self.params = params
        self.cfg = cfg
        self.rollout = RobotRollout(params, cfg.rollout)
        from curobo_tpu.ops.blast import BlastRollout

        self._blast = BlastRollout(params, cfg.rollout)
        # Halton seed bank in joint space (host constant).
        self._seed_bank = jnp.asarray(
            halton_sequence(max(cfg.n_seeds - 1, 1), params.n_dof),
            dtype=jnp.float32,
        )
        self._seed_ik = None
        if cfg.use_lm_seed:
            from curobo_tpu.opt.lm import LMConfig, SeedIK

            self._seed_ik = SeedIK(
                params,
                LMConfig(n_iters=cfg.lm_seed_iters, step_clip=cfg.lm_step_clip),
            )
        self._solve_jit = jax.jit(self._solve_impl)
        # pallas path: capacity-envelope-keyed kernel cache (`solver/_cache.py`)
        from curobo_tpu.solver._cache import WorldKeyedCache

        self._pallas_cache = WorldKeyedCache(self._build_pallas_solver)

    # ------------------------------------------------------------------
    def _build_pallas_solver(self, world):
        import functools

        from curobo_tpu.ops.pallas_ik import PallasIKCost

        pik = PallasIKCost(self.params, self.cfg.rollout, world)
        lb = self.cfg.lbfgs
        mp = self.cfg.mppi
        solve_kernel = pik.build_solver(
            mppi_iters=mp.n_iters if self.cfg.use_particle_stage else 0,
            n_particles=mp.n_particles,
            init_std=float(mp.init_std),
            std_decay=mp.std_decay,
            min_std=mp.min_std,
            temperature=mp.temperature,
            step_size=mp.step_size,
            lbfgs_iters=lb.n_iters,
            history=lb.history,
            max_step=lb.max_step,
            warmup_iters=self.cfg.warmup_iters,
            n_linesearch=self.cfg.kernel_linesearch,
            ls_base=self.cfg.kernel_ls_base,
            ls_ratio=self.cfg.kernel_ls_ratio,
        )
        return jax.jit(
            functools.partial(self._solve_impl_pallas, solve_kernel=solve_kernel)
        )

    def _get_pallas_solver(self, world):
        return self._pallas_cache.get(world)

    def _solve_impl_pallas(
        self,
        world: world_mod.WorldData,
        goal: Goal,
        seeds: jnp.ndarray,
        key: jax.Array,
        solve_kernel=None,
    ) -> IKResult:
        """Solve with the fused Pallas kernel: MPPI stage + in-kernel
        L-BFGS + metrics, all in ONE dispatch per solve. The world flows
        in as kernel SMEM inputs — no rebuild on world updates."""
        cfg = self.cfg
        B, S, D = seeds.shape
        goal_s = goal.tile_seeds(S)
        seeds, _ = self._lm_warm_start(goal_s, seeds)
        # (B, S, T*7): per-tool [pos, quat] blocks (kernel sums pose cost
        # over tools, T=1 callers unchanged)
        T = self.params.n_tools
        goal7 = jnp.concatenate(
            [goal_s.goal_pos[..., 0, :, :], goal_s.goal_quat[..., 0, :, :]],
            axis=-1,
        ).reshape(B, S, T * 7)

        g7 = goal7.reshape(-1, T * 7)
        q0 = seeds.reshape(-1, D)
        seed_scalar = jax.random.randint(key, (), 0, 2**31 - 1)
        q, c, pe, re, fe = solve_kernel(g7, q0, seed_scalar, world)
        x = q.reshape(B, S, D)
        cost = c.reshape(B, S)
        pos_err = pe.reshape(B, S)
        rot_err = re.reshape(B, S)
        feasible = fe.reshape(B, S) > 0.5

        conv = (
            (pos_err <= cfg.position_threshold)
            & (rot_err <= cfg.rotation_threshold)
            & feasible
        )
        score = jnp.where(conv, cost, BIG + pos_err)
        best = jnp.argmin(score, axis=-1)

        def take(a):
            return jnp.take_along_axis(
                a, best.reshape(best.shape + (1,) * (a.ndim - 1)), axis=1
            )[:, 0]

        return IKResult(
            solution=take(x),
            success=take(conv),
            position_error=take(pos_err),
            rotation_error=take(rot_err),
            cost=take(cost),
            seed_solutions=x,
            seed_success=conv,
        )

    # ------------------------------------------------------------------
    def generate_seeds(self, batch: int, seed_state: Optional[jnp.ndarray] = None,
                       n: Optional[int] = None) -> jnp.ndarray:
        """(B, S, D): seed 0 = retract (or provided state), rest Halton.
        n overrides the seed count (LM seed-pool oversampling)."""
        p = self.params
        S = n if n is not None else self.cfg.n_seeds
        # clamp unbounded (continuous) ANGULAR joints to +-pi for seeding;
        # prismatic dofs (floating base) seed over their full range
        lo_c, hi_c = p.dof_clip_bounds(angular_cap=np.pi)
        lo_c, hi_c = jnp.asarray(lo_c), jnp.asarray(hi_c)
        if S - 1 > self._seed_bank.shape[0]:
            self._seed_bank = jnp.asarray(
                halton_sequence(S - 1, p.n_dof), dtype=jnp.float32
            )
        halton = lo_c + (hi_c - lo_c) * self._seed_bank[: S - 1]  # (S-1, D)
        first = (
            p.retract_config if seed_state is None else seed_state
        )  # (D,) or (B, D)
        first = jnp.broadcast_to(first, (batch, p.n_dof))
        rest = jnp.broadcast_to(halton, (batch, S - 1, p.n_dof))
        return jnp.concatenate([first[:, None], rest], axis=1)

    # ------------------------------------------------------------------
    def _lm_warm_start(self, goal_s: Goal, seeds: jnp.ndarray):
        """Pose-only LM refinement of every seed (inlines into the solve
        jit). Single-goal only (any tool count — the multi-tool residual
        stacks all frames); goal sets pass through.

        Returns (seeds, lm_cost-or-None)."""
        if self._seed_ik is None:
            return seeds, None
        gp, gq = goal_s.goal_pos, goal_s.goal_quat
        if gp.shape[-3] != 1:
            return seeds, None
        return self._seed_ik._solve(seeds, gp[..., 0, :, :], gq[..., 0, :, :])

    def _solve_impl(
        self,
        world: world_mod.WorldData,
        goal: Goal,  # batch (B,)
        seeds: jnp.ndarray,  # (B, S, D) — or (B, P, D) with an LM pool
        key: jax.Array,
    ) -> IKResult:
        cfg = self.cfg
        p = self.params
        B, S, D = seeds.shape
        goal_s = goal.tile_seeds(S)  # (B, S, ...)
        seeds, lm_cost = self._lm_warm_start(goal_s, seeds)
        if lm_cost is not None and S > cfg.n_seeds:
            # LM seed pool: keep the best n_seeds by LM residual
            # (reference `seed_ik_solver.py:578` top-k handoff)
            S = cfg.n_seeds
            idx = jnp.argsort(lm_cost, axis=-1)[:, :S]  # (B, S)
            seeds = jnp.take_along_axis(seeds, idx[..., None], axis=1)
            goal_s = goal.tile_seeds(S)

        from curobo_tpu.ops.blast import BlastRollout

        rollout = (
            self._blast
            if cfg.use_blast and BlastRollout.supports(p, goal, cfg.rollout)
            else self.rollout
        )

        lo, hi = p.dof_clip_bounds()
        lo, hi = jnp.asarray(lo), jnp.asarray(hi)

        def cost(x):  # (B, S, D) or with extra leading particle/cand axes
            return rollout.evaluate_config(world, goal_s, x).cost

        x = seeds
        if cfg.use_particle_stage:
            with jax.named_scope("ik.mppi"):
                x, _ = mppi_optimize(cost, x, key, cfg.mppi, lower=lo, upper=hi)
        if cfg.use_gradient_stage:
            with jax.named_scope("ik.lbfgs"):
                x, _ = lbfgs_optimize(cost, x, cfg.lbfgs, lower=lo, upper=hi)

        # metrics + seed selection
        with jax.named_scope("ik.metrics"):
            res = rollout.evaluate_config(world, goal_s, x)
        conv = res.converged(cfg.position_threshold, cfg.rotation_threshold)
        score = jnp.where(conv, res.cost, BIG + res.pos_err)
        best = jnp.argmin(score, axis=-1)  # (B,)

        def take(a):
            return jnp.take_along_axis(
                a, best.reshape(best.shape + (1,) * (a.ndim - 1)), axis=1
            )[:, 0]

        return IKResult(
            solution=take(x),
            success=take(conv),
            position_error=take(res.pos_err),
            rotation_error=take(res.rot_err),
            cost=take(res.cost),
            seed_solutions=x,
            seed_success=conv,
        )

    # ------------------------------------------------------------------
    def solve_pose(
        self,
        world: world_mod.WorldData,
        goal_pose: Pose,  # batch (B,) or (B, T) or (B, G, T)
        key: Optional[jax.Array] = None,
        seed_state: Optional[jnp.ndarray] = None,
    ) -> IKResult:
        """Solve batched IK for tool pose goals.

        Parity: reference `IKSolver.solve_pose` (`solver_ik.py:631`).
        """
        from curobo_tpu.util.checks import check_joint_config, check_pose_batch

        check_pose_batch("goal_pose", goal_pose)
        if seed_state is not None:
            seed_state = check_joint_config("seed_state", seed_state, self.params.n_dof)
        goal = Goal.from_pose(goal_pose)
        B = goal.batch
        if key is None:
            key = jax.random.PRNGKey(0)
        take_pallas = False
        if self.cfg.use_pallas:
            from curobo_tpu.ops.blast import BlastRollout
            from curobo_tpu.ops.pallas_ik import (
                rollout_config_is_supported,
                world_is_supported,
            )

            # the kernel bakes an isotropic quadratic pose objective
            # (summed over ALL tool frames, r5); fall back to blast for
            # axis weights / metric pose cost / goalsets / cspace goals so
            # all paths optimize the SAME objective.
            take_pallas = (
                goal.goal_pos.shape[-3] == 1  # single goal per tool
                and goal.tool_weight is None
                and BlastRollout.supports(self.params, goal, self.cfg.rollout)
                and world_is_supported(world)
                and rollout_config_is_supported(self.cfg.rollout)
                and goal.goal_cspace is None
                and runtime.pallas_backend_ok()
                and not self._pallas_cache.is_broken(world)
            )
        world = world.anonymized()  # names are static jit keys
        n_gen = self.cfg.n_seeds
        if (
            not take_pallas
            and self._seed_ik is not None
            and self.cfg.lm_seed_pool > self.cfg.n_seeds
        ):
            n_gen = self.cfg.lm_seed_pool
        seeds = self.generate_seeds(B, seed_state, n=n_gen)
        if take_pallas:
            solve = self._get_pallas_solver(world)
            try:
                return solve(world, goal, seeds, key)
            except jax.errors.JaxRuntimeError as e:
                from curobo_tpu.util.logging import log_warn

                log_warn(
                    "pallas IK solver failed for this world envelope "
                    f"({str(e)[:160]}); falling back to the XLA path"
                )
                self._pallas_cache.mark_broken(world)
        return self._solve_jit(world, goal, seeds, key)
