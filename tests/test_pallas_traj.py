"""Trajectory mega-kernel consistency tests (block-level, CPU).

The Pallas trajectory kernel's body (`_lane_eval` / `_step_cost`, the
lane-horizon layout) is plain jnp, so it is tested here by direct tracing —
the SAME code Mosaic lowers on TPU — against the blast trajectory objective
(itself oracle-tested against the generic rollout in tests/test_blast.py).
Interpret-mode emulation is avoided: its XLA CPU compiles take minutes.

The in-kernel solver loops (`_lbfgs_loop`, `_mppi_loop`) are tested the
same way, with the MPPI sampler injected (the on-core TPU PRNG has no CPU
lowering).
"""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from curobo_tpu.geom import types as gt
from curobo_tpu.geom import world as wm
from curobo_tpu.robot.kinematics import Kinematics, compute_kinematics
from curobo_tpu.rollout.robot_rollout import Goal
from curobo_tpu.types.pose import Pose

CONTENT = os.path.join(os.path.dirname(__file__), "..", "curobo_tpu", "content", "robots")


@pytest.fixture(scope="module")
def setup():
    from curobo_tpu.ops.blast import BlastRollout
    from curobo_tpu.ops.pallas_traj import PallasTrajCost
    from curobo_tpu.solver.trajopt import TrajOptConfig
    from curobo_tpu.transition.bspline import BSplineConfig, BSplineTransition

    kin = Kinematics.from_robot_yaml(os.path.join(CONTENT, "ur10e.yml"))
    world = wm.compile_scene(
        gt.Scene().add(
            gt.Cuboid(name="table", pose=[0.4, 0, -0.1, 1, 0, 0, 0], dims=[1.2, 1.2, 0.2]),
            gt.SphereObstacle(name="ball", pose=[0.35, 0.2, 0.45, 1, 0, 0, 0], radius=0.08),
        )
    )
    tcfg = TrajOptConfig()
    # exercise swept collision + speed metric + bound margin (the terms the
    # round-1 kernel got wrong) on a small spline to keep compiles fast
    cfg = dataclasses.replace(
        tcfg.rollout,
        collision_cost=dataclasses.replace(tcfg.rollout.collision_cost, sweep_steps=2),
        bound_cost=dataclasses.replace(tcfg.rollout.bound_cost, margin=0.02),
    )
    bsp = BSplineConfig(degree=3, n_control=6, horizon=8)
    blast = BlastRollout(kin.params, cfg)
    ptc = PallasTrajCost(kin.params, cfg, world, bsp)
    trans = BSplineTransition(bsp)
    return kin, world, cfg, bsp, blast, ptc, trans


@pytest.fixture(scope="module")
def problem(setup):
    kin, world, cfg, bsp, blast, ptc, trans = setup
    NP = ptc._cap  # one full lane-horizon block (SUB x slots problems)
    D = kin.params.n_dof
    nfD = bsp.n_free * D
    rng = np.random.RandomState(0)
    q_start = jnp.asarray(rng.uniform(-1.5, 1.5, (NP, D)), jnp.float32)
    q_end = jnp.asarray(rng.uniform(-1.5, 1.5, (NP, D)), jnp.float32)
    free0 = trans.linear_seed(q_start, q_end)
    free0 = free0 + jnp.asarray(rng.normal(0, 0.05, free0.shape), jnp.float32)
    dtv = jnp.asarray(rng.uniform(0.02, 0.1, (NP,)), jnp.float32)

    st = compute_kinematics(kin.params, q_end)
    goal = Goal.from_pose(
        Pose(st.tool_pose.position[:, 0], st.tool_pose.quaternion[:, 0])
    )
    goal7 = jnp.concatenate(
        [st.tool_pose.position[:, 0], st.tool_pose.quaternion[:, 0]], axis=-1
    )
    free_flat = free0.reshape(NP, -1)

    from curobo_tpu.ops.pallas_ik import pack_world_arrays

    gb, xb, qb, eb, db, nb, Npad = ptc._traj_pack(
        goal7, free_flat, q_start, None, dtv
    )
    assert nb == 1 and Npad == NP
    blocks = dict(
        goal=gb[0], qs=qb[0], qe=eb[0], x=xb[0], dt=db[0][0],
        w=pack_world_arrays(world),
    )
    return dict(
        NP=NP, D=D, nfD=nfD, q_start=q_start, free0=free0, free_flat=free_flat,
        dtv=dtv, goal=goal, goal7=goal7, blocks=blocks,
    )


def _eval(ptc, b, x, mode):
    return ptc._lane_eval(
        ptc._lane_tbl, ptc._G, b["goal"], b["qs"], b["qe"], b["dt"], x,
        b["w"], mode,
    )


def _rows(ptc, a, NP):
    return np.asarray(ptc._unpack_rows(a[None], 1, NP, NP))


class TestTrajKernelConsistency:
    def test_cost_matches_blast(self, setup, problem):
        kin, world, cfg, bsp, blast, ptc, trans = setup
        p = problem
        b = p["blocks"]
        ck_blk = jax.jit(lambda x: _eval(ptc, b, x, "cost"))(b["x"])
        ck = _rows(ptc, ck_blk, p["NP"])
        traj = trans.rollout(p["free0"], p["q_start"], p["dtv"])
        cb = blast.evaluate_trajectory(world, p["goal"], traj).cost
        rel = np.abs(ck - np.asarray(cb)) / (np.abs(np.asarray(cb)) + 1e-2)
        assert np.median(rel) < 1e-4
        assert np.max(rel) < 1e-3

    def test_cost_replicated_across_h_lanes(self, setup, problem):
        """Every lane of a slot must carry the slot's cost (the in-kernel
        optimizer loops rely on h-replication)."""
        kin, world, cfg, bsp, blast, ptc, trans = setup
        p = problem
        b = p["blocks"]
        ck_blk = np.asarray(jax.jit(lambda x: _eval(ptc, b, x, "cost"))(b["x"]))
        grp = ck_blk.reshape(ck_blk.shape[0], ptc._slots, ptc._h_pad)
        np.testing.assert_allclose(
            grp, np.broadcast_to(grp[..., :1], grp.shape), rtol=1e-5, atol=1e-4
        )

    def test_grad_matches_blast(self, setup, problem):
        kin, world, cfg, bsp, blast, ptc, trans = setup
        p = problem
        b = p["blocks"]
        _, gk_blk = jax.jit(lambda x: _eval(ptc, b, x, "grad"))(b["x"])
        gk = _rows(ptc, gk_blk, p["NP"])

        def blast_cost(ff):
            knots = ff.reshape(p["NP"], bsp.n_free, p["D"])
            traj = trans.rollout(knots, p["q_start"], p["dtv"])
            return blast.evaluate_trajectory(world, p["goal"], traj).cost

        gb = jax.grad(lambda f: jnp.sum(blast_cost(f)))(p["free_flat"])
        rel = np.abs(gk - np.asarray(gb)) / (np.abs(np.asarray(gb)) + 1.0)
        assert np.median(rel) < 1e-4
        assert np.percentile(rel, 99) < 1e-2

    def test_pinned_goal_cost_grad_match_blast(self, setup, problem):
        """pin_goal=True kernel (q_end pinned terminal) vs the blast
        objective through the q_goal-pinned spline."""
        from curobo_tpu.ops.pallas_traj import PallasTrajCost
        from curobo_tpu.transition.bspline import BSplineConfig, BSplineTransition

        kin, world, cfg, bsp_, blast, ptc, trans_ = setup
        p = problem
        D, NP = p["D"], p["NP"]
        rng = np.random.RandomState(3)
        q_end = jnp.asarray(rng.uniform(-1.5, 1.5, (NP, D)), jnp.float32)
        # double pinning consumes 2*N_PIN control points; use a spline with
        # interior knots left over
        bsp = BSplineConfig(degree=3, n_control=10, horizon=8)
        trans = BSplineTransition(bsp)
        ptc_pin = PallasTrajCost(kin.params, cfg, world, bsp, pin_goal=True)
        nf = bsp.n_free_cspace
        free0 = trans.linear_seed(p["q_start"], q_end, q_goal_pinned=True)
        free_flat = free0.reshape(NP, -1)
        gb_, xb, qb, eb, db, nb, Npad = ptc_pin._traj_pack(
            p["goal7"], free_flat, p["q_start"], q_end, p["dtv"]
        )
        b = dict(goal=gb_[0], qs=qb[0], qe=eb[0], x=xb[0], dt=db[0][0],
                 w=p["blocks"]["w"])
        ck_blk, gk_blk = jax.jit(lambda x: _eval(ptc_pin, b, x, "grad"))(b["x"])
        ck = _rows(ptc_pin, ck_blk, NP)
        gk = _rows(ptc_pin, gk_blk, NP)

        def blast_cost(ff):
            knots = ff.reshape(NP, nf, D)
            traj = trans.rollout(knots, p["q_start"], p["dtv"], q_goal=q_end)
            return blast.evaluate_trajectory(world, p["goal"], traj).cost

        cb = blast_cost(free_flat)
        rel = np.abs(ck - np.asarray(cb)) / (np.abs(np.asarray(cb)) + 1e-2)
        assert np.max(rel) < 1e-3
        gb2 = jax.grad(lambda f: jnp.sum(blast_cost(f)))(free_flat)
        rel_g = np.abs(gk - np.asarray(gb2)) / (np.abs(np.asarray(gb2)) + 1.0)
        assert np.percentile(rel_g, 99) < 1e-2
        # terminal state of the pinned spline is exactly q_end, at rest
        traj = trans.rollout(free0, p["q_start"], p["dtv"], q_goal=q_end)
        np.testing.assert_allclose(
            np.asarray(traj.position[:, -1]), np.asarray(q_end), atol=1e-5
        )
        assert float(jnp.abs(traj.velocity[:, -1]).max()) < 1e-3

    def test_metrics_match_blast(self, setup, problem):
        kin, world, cfg, bsp, blast, ptc, trans = setup
        p = problem
        b = p["blocks"]
        _, pe, re, fe, dtr = jax.jit(lambda x: _eval(ptc, b, x, "metrics"))(b["x"])
        traj = trans.rollout(p["free0"], p["q_start"], p["dtv"])
        res = blast.evaluate_trajectory(world, p["goal"], traj)
        np.testing.assert_allclose(
            _rows(ptc, pe, p["NP"]), np.asarray(res.pos_err), atol=1e-5
        )
        np.testing.assert_allclose(
            _rows(ptc, re, p["NP"]), np.asarray(res.rot_err), atol=1e-5
        )
        agree = np.mean((_rows(ptc, fe, p["NP"]) > 0.5) == np.asarray(res.feasible))
        assert agree == 1.0

    def test_retiming_matches_solver(self, setup, problem):
        from curobo_tpu.solver.trajopt import TrajOptConfig, TrajOptSolver

        kin, world, cfg, bsp, blast, ptc, trans = setup
        p = problem
        b = p["blocks"]
        _, _, _, _, dtr = jax.jit(lambda x: _eval(ptc, b, x, "metrics"))(b["x"])
        tcfg = TrajOptConfig()
        solver = TrajOptSolver.__new__(TrajOptSolver)
        solver.params = kin.params
        solver.cfg = tcfg
        traj = trans.rollout(p["free0"], p["q_start"], p["dtv"])
        dt_ref = np.asarray(solver._retime_dt(traj, p["dtv"]))
        dt_k = np.clip(_rows(ptc, dtr, p["NP"]), tcfg.min_dt, tcfg.max_dt)
        np.testing.assert_allclose(dt_k, dt_ref, rtol=1e-4, atol=1e-5)


class TestTrajInKernelSolvers:
    """The lane-horizon layout removed the per-step fori_loop, so the
    solver-loop x objective composition now compiles quickly enough to run
    by default on the CPU backend."""

    def _clip(self, kin, nfD, D):
        lo = np.maximum(np.asarray(kin.params.joint_limits.lower), -2 * np.pi)
        hi = np.minimum(np.asarray(kin.params.joint_limits.upper), 2 * np.pi)

        def clip_x(x):
            return jnp.stack(
                [jnp.clip(x[r], lo[r % D], hi[r % D]) for r in range(nfD)]
            )

        return clip_x

    def test_lbfgs_loop_descends_and_matches_xla(self, setup, problem):
        """In-kernel L-BFGS on the trajectory objective: monotone best cost,
        and final cost comparable to the XLA lbfgs_optimize path."""
        from curobo_tpu.opt.lbfgs import LBFGSConfig, lbfgs_optimize

        kin, world, cfg, bsp, blast, ptc, trans = setup
        p = problem
        b = p["blocks"]
        nfD, D = p["nfD"], p["D"]
        clip_x = self._clip(kin, nfD, D)

        cost_fn = lambda xx: _eval(ptc, b, xx, "cost")
        cost_grad = lambda xx: _eval(ptc, b, xx, "grad")

        # the loop starts from the CLIPPED point — compare best-tracker
        # semantics against the cost there (fp tolerance at cost scale)
        c0 = jax.jit(lambda x: cost_fn(clip_x(x)))(b["x"])
        run = jax.jit(
            lambda x: ptc._ik._lbfgs_loop(
                cost_fn, clip_x, x, n_iters=4, history=3, max_step=0.4,
                n_linesearch=2, ls_base=1.0, ls_ratio=0.35, cost_grad=cost_grad,
            )
        )
        best_x, best_c = run(b["x"])
        assert float(jnp.mean(best_c)) < float(jnp.mean(c0))
        # never worse than the start (best-tracker semantics)
        tol = 1e-6 * float(jnp.max(c0)) + 1e-5
        assert float(jnp.max(best_c - c0)) <= tol

        # XLA-path reference on the same objective (flattened layout);
        # extra leading candidate axes (the line-search fold) via vmap
        def cost_flat(x):  # (..., N, nfD) -> (..., N)
            if x.ndim > 2:
                return jax.vmap(cost_flat)(x)
            _, xb, _, _, _, nb, Npad = ptc._traj_pack(
                p["goal7"], x, p["q_start"], None, p["dtv"])
            c = _eval(ptc, b, xb[0], "cost")
            return ptc._unpack_rows(c[None], 1, Npad, x.shape[0])

        x_xla, c_xla = lbfgs_optimize(
            cost_flat, p["free_flat"], LBFGSConfig(history=3, n_iters=4, max_step=0.4)
        )
        # same iteration budget, different line searches: require the
        # in-kernel result to be in the same ballpark on average
        best_rows = _rows(ptc, best_c, p["NP"])
        assert float(np.mean(best_rows)) <= 1.3 * float(jnp.mean(c_xla)) + 1e-3

    def test_mppi_loop_descends_deterministically(self, setup, problem):
        kin, world, cfg, bsp, blast, ptc, trans = setup
        p = problem
        b = p["blocks"]
        nfD, D = p["nfD"], p["D"]
        clip_x = self._clip(kin, nfD, D)
        cost_fn = lambda xx: _eval(ptc, b, xx, "cost")

        def normal_fn(key, shape):
            key, sub = jax.random.split(key)
            return key, jax.random.normal(sub, shape, jnp.float32)

        # slot-leader noise replication (the kernel's eps_rep analog)
        from curobo_tpu.ops.pallas_ik import LANE, SUB

        lead = (
            jax.lax.broadcasted_iota(jnp.int32, (SUB, LANE), 1) % ptc._h_pad
            == 0
        ).astype(jnp.float32)

        def eps_rep(eps):
            return ptc._group_sum(eps * lead, ptc._G)

        run = jax.jit(
            lambda x, key: ptc._ik._mppi_loop(
                cost_fn, clip_x, x, n_iters=2, n_particles=4,
                init_std=0.08, std_decay=0.9, min_std=0.005,
                temperature=0.05, step_size=0.9,
                rng=(key, normal_fn), eps_transform=eps_rep,
            )
        )
        c0 = jax.jit(cost_fn)(b["x"])
        x1, c1 = run(b["x"], jax.random.PRNGKey(7))
        x2, c2 = run(b["x"], jax.random.PRNGKey(7))
        np.testing.assert_array_equal(np.asarray(x1), np.asarray(x2))
        assert float(jnp.mean(c1)) <= float(jnp.mean(c0))
        assert float(jnp.max(c1 - c0)) <= 1e-5  # best-tracker: never worse
        # h-replication must survive the solver loop
        x1r = np.asarray(x1).reshape(nfD, -1, ptc._slots, ptc._h_pad)
        np.testing.assert_allclose(
            x1r, np.broadcast_to(x1r[..., :1], x1r.shape), atol=1e-6
        )
