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
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

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
    use_particle_stage: bool = True
    mppi: MPPIConfig = MPPIConfig(n_particles=32, n_iters=8, init_std=0.6)
    lbfgs: LBFGSConfig = LBFGSConfig(history=12, n_iters=40)
    rollout: RobotRolloutConfig = RobotRolloutConfig()
    position_threshold: float = 0.005
    rotation_threshold: float = 0.05


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
        self._solve_jit = jax.jit(self._solve_impl)

    # ------------------------------------------------------------------
    def generate_seeds(self, batch: int, seed_state: Optional[jnp.ndarray] = None
                       ) -> jnp.ndarray:
        """(B, S, D): seed 0 = retract (or provided state), rest Halton."""
        p = self.params
        S = self.cfg.n_seeds
        lo, hi = p.joint_limits.lower, p.joint_limits.upper
        # clamp unbounded (continuous) joints for seeding purposes
        lo_c = jnp.maximum(lo, -np.pi)
        hi_c = jnp.minimum(hi, np.pi)
        halton = lo_c + (hi_c - lo_c) * self._seed_bank[: S - 1]  # (S-1, D)
        first = (
            p.retract_config if seed_state is None else seed_state
        )  # (D,) or (B, D)
        first = jnp.broadcast_to(first, (batch, p.n_dof))
        rest = jnp.broadcast_to(halton, (batch, S - 1, p.n_dof))
        return jnp.concatenate([first[:, None], rest], axis=1)

    # ------------------------------------------------------------------
    def _solve_impl(
        self,
        world: world_mod.WorldData,
        goal: Goal,  # batch (B,)
        seeds: jnp.ndarray,  # (B, S, D)
        key: jax.Array,
    ) -> IKResult:
        cfg = self.cfg
        p = self.params
        B, S, D = seeds.shape
        goal_s = goal.tile_seeds(S)  # (B, S, ...)

        from curobo_tpu.ops.blast import BlastRollout

        rollout = (
            self._blast
            if cfg.use_blast and BlastRollout.supports(p, goal)
            else self.rollout
        )

        lo = jnp.maximum(p.joint_limits.lower, -2.0 * np.pi)
        hi = jnp.minimum(p.joint_limits.upper, 2.0 * np.pi)

        def cost(x):  # (B, S, D) or with extra leading particle/cand axes
            return rollout.evaluate_config(world, goal_s, x).cost

        x = seeds
        if cfg.use_particle_stage:
            x, _ = mppi_optimize(cost, x, key, cfg.mppi, lower=lo, upper=hi)
        x, _ = lbfgs_optimize(cost, x, cfg.lbfgs, lower=lo, upper=hi)

        # metrics + seed selection
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
        goal = Goal.from_pose(goal_pose)
        B = goal.batch
        seeds = self.generate_seeds(B, seed_state)
        if key is None:
            key = jax.random.PRNGKey(0)
        return self._solve_jit(world, goal, seeds, key)
