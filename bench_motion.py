"""Motion-generation benchmark: per-problem plan latency + success on the
fixed-seed Franka suite (tabletop / shelf / cubby pick scenes).

Mirrors the reference benchmark protocol
(`/root/reference/benchmark/motion_plan_benchmark.py:333`, metrics per
`curobo/_src/util/benchmark_metrics.py:80,121`): solve each problem
individually (B=1), report success %, plan-time mean/median/p75/p98,
position error, path length, motion time, jerk.

Baseline (BASELINE.md): cuRobo 99.73 % success, p98 plan 81 ms, mean 38 ms
on RTX 6000 Ada over the robometrics datasets.

Run on the TPU: python bench_motion.py [--limit N] [--json-out PATH]
"""

import argparse
import json
import os
import time

import numpy as np

SUITE = os.path.join(
    os.path.dirname(__file__), "curobo_tpu", "content", "problems",
    "franka_motion.json",
)


def build_world(spec, capacity):
    from curobo_tpu.geom import types as gt
    from curobo_tpu.geom import world as wm

    scene = gt.Scene().add(*[gt.Cuboid(**o) for o in spec["cuboids"]])
    return wm.compile_scene(scene, capacities={"cuboid": capacity})


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--limit", type=int, default=0, help="run only N problems")
    ap.add_argument("--json-out", type=str, default="")
    ap.add_argument("--warmup", type=int, default=2)
    # trajopt budget knobs (perf sweeps; defaults = MotionPlanConfig)
    ap.add_argument("--lbfgs-iters", type=int, default=0)
    ap.add_argument("--finetune-attempts", type=int, default=-1)
    ap.add_argument("--trajopt-seeds", type=int, default=0)
    # torque-limited mode (reference benchmark --use-dynamics: 3 kg
    # payload + RNEA torque-limit constraint; baseline 99.73 % / p98
    # 135 ms / max torque 62.26 N*m, `benchmarks.rst:36-54`)
    ap.add_argument("--use-dynamics", action="store_true")
    ap.add_argument("--payload-kg", type=float, default=3.0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from curobo_tpu import runtime as rt

    rt.enable_compilation_cache()

    from curobo_tpu.motion.planner import MotionPlanConfig, MotionPlanner
    from curobo_tpu.robot.kinematics import Kinematics
    from curobo_tpu.types.pose import Pose
    from curobo_tpu.types.state import JointState

    with open(SUITE) as f:
        suite = json.load(f)
    problems = suite["problems"]
    if args.limit:
        problems = problems[: args.limit]
    cap = suite["cuboid_capacity"]

    kin = Kinematics.from_robot_yaml(
        os.path.join(os.path.dirname(__file__), "curobo_tpu", "content",
                     "robots", suite["robot"])
    )
    import dataclasses

    pcfg = MotionPlanConfig()
    tcfg = pcfg.trajopt
    if args.lbfgs_iters:
        tcfg = dataclasses.replace(
            tcfg, lbfgs=dataclasses.replace(tcfg.lbfgs, n_iters=args.lbfgs_iters)
        )
    if args.finetune_attempts >= 0:
        tcfg = dataclasses.replace(tcfg, finetune_attempts=args.finetune_attempts)
    if args.use_dynamics:
        tcfg = dataclasses.replace(
            tcfg,
            rollout=dataclasses.replace(
                tcfg.rollout,
                torque_limit_weight=100.0,
                payload_mass=args.payload_kg,
            ),
        )
    if tcfg is not pcfg.trajopt:
        pcfg = dataclasses.replace(pcfg, trajopt=tcfg)
    if args.trajopt_seeds:
        pcfg = dataclasses.replace(pcfg, n_trajopt_seeds=args.trajopt_seeds)
    planner = MotionPlanner(kin.params, pcfg)

    def traj_max_torque(res):
        """Peak |tau| over the solved trajectory (payload included) —
        reference reports this as the constraint-satisfaction metric."""
        from curobo_tpu.robot.dynamics import compute_inverse_dynamics

        p = kin.params
        dyn = p
        if args.payload_kg > 0:
            dyn = dataclasses.replace(
                p, link_mass=p.link_mass.at[p.n_links - 1].add(args.payload_kg)
            )
        st = res.solver_trajectory
        tau = compute_inverse_dynamics(
            dyn, st.position, st.velocity, st.acceleration
        )
        return float(jnp.max(jnp.abs(tau)))

    def run(prob, key, attribute=False):
        world = build_world(prob["world"], cap)
        goal = Pose(
            jnp.asarray([prob["goal_pose"][:3]], jnp.float32),
            jnp.asarray([prob["goal_pose"][3:]], jnp.float32),
        )
        start = JointState.from_position(
            jnp.asarray([prob["q_start"]], jnp.float32), kin.params.joint_names
        )
        t0 = time.perf_counter()
        res = planner.plan_pose(world, goal, start, key=key, attribute=attribute)
        # np.asarray = REAL device fetch; block_until_ready through the
        # axon tunnel can return before the work runs (bench.py _sync)
        np.asarray(res.trajectory.position)
        return res, time.perf_counter() - t0

    # warmup: compile every shape/path once (kernels are capacity-envelope
    # keyed, so one world compiles for the whole suite)
    for i in range(min(args.warmup, len(problems))):
        run(problems[i], jax.random.PRNGKey(1000 + i))
    # also compile the RETRY path (attempt >= 1: fresh IK seeds + PRM graph
    # seeding + path-seeded trajopt) with an unreachable goal, so a retry
    # mid-suite never pays a first compile (the reference warms its CUDA
    # graphs the same way before timing)
    far = dict(problems[0])
    far["goal_pose"] = [2.5, 2.5, 2.5] + list(far["goal_pose"][3:])
    run(far, jax.random.PRNGKey(999))

    rows = []
    for i, prob in enumerate(problems):
        res, dt_wall = run(prob, jax.random.PRNGKey(i))
        attempts = getattr(planner, "last_attempts", 1)
        q = np.asarray(res.solver_trajectory.position[0])
        # robometrics path length: sum over steps of the joint-space L2 step
        dq = float(np.linalg.norm(np.diff(q, axis=0), axis=-1).sum())
        jerk = (
            float(np.max(np.abs(np.asarray(res.solver_trajectory.jerk[0]))))
            if res.solver_trajectory.jerk is not None
            else 0.0
        )
        row = dict(
            scenario=prob["scenario"],
            success=bool(res.success[0]),
            plan_time=dt_wall,
            position_error=float(res.position_error[0]),
            rotation_error=float(res.rotation_error[0]),
            motion_time=float(res.motion_time[0]),
            path_length=float(dq),
            max_jerk=jerk,
            attempts=attempts,
        )
        if args.use_dynamics:
            row["max_torque"] = traj_max_torque(res)
        rows.append(row)

    ok = [r for r in rows if r["success"]]
    t = np.asarray([r["plan_time"] for r in rows])
    out = dict(
        n_problems=len(rows),
        success_rate=len(ok) / max(len(rows), 1),
        plan_time_mean_ms=float(np.mean(t) * 1e3),
        plan_time_median_ms=float(np.median(t) * 1e3),
        plan_time_p75_ms=float(np.percentile(t, 75) * 1e3),
        plan_time_p98_ms=float(np.percentile(t, 98) * 1e3),
        position_error_mm_mean=float(
            np.mean([r["position_error"] for r in ok]) * 1e3
        )
        if ok
        else -1.0,
        position_error_mm_p98=float(
            np.percentile([r["position_error"] for r in ok], 98) * 1e3
        )
        if ok
        else -1.0,
        # quality metrics vs BASELINE.md means: path length 3.126 rad,
        # motion time 1.250 s, jerk 227.4 (`benchmarks.rst:21-29`)
        motion_time_mean_s=float(np.mean([r["motion_time"] for r in ok]))
        if ok
        else -1.0,
        motion_time_p98_s=float(np.percentile([r["motion_time"] for r in ok], 98))
        if ok
        else -1.0,
        path_length_mean=float(np.mean([r["path_length"] for r in ok]))
        if ok
        else -1.0,
        max_jerk_mean=float(np.mean([r["max_jerk"] for r in ok]))
        if ok
        else -1.0,
        max_jerk_p98=float(np.percentile([r["max_jerk"] for r in ok], 98))
        if ok
        else -1.0,
        use_dynamics=bool(args.use_dynamics),
        max_torque_max=float(np.max([r["max_torque"] for r in ok]))
        if args.use_dynamics and ok
        else -1.0,
        max_torque_mean=float(np.mean([r["max_torque"] for r in ok]))
        if args.use_dynamics and ok
        else -1.0,
        retry_rate=float(np.mean([r["attempts"] > 1 for r in rows])),
        plan_time_first_attempt_p98_ms=float(
            np.percentile(
                [r["plan_time"] for r in rows if r["attempts"] == 1], 98
            )
            * 1e3
        )
        if any(r["attempts"] == 1 for r in rows)
        else -1.0,
        per_scenario={
            fam: dict(
                n=len([r for r in rows if r["scenario"] == fam]),
                success=float(
                    np.mean([r["success"] for r in rows if r["scenario"] == fam])
                ),
            )
            for fam in sorted({r["scenario"] for r in rows})
        },
    )
    # per-phase latency attribution (VERDICT r4 #4): re-plan a sample with
    # blocking syncs between phases; slower than production dispatch but
    # shows where the milliseconds go
    n_attr = min(6, len(problems))
    if n_attr:
        acc = {}
        for i in range(n_attr):
            run(problems[i], jax.random.PRNGKey(i), attribute=True)
            for k, v in planner.last_attribution.items():
                acc.setdefault(k, []).append(v)
        out["attribution_mean"] = {
            k: round(float(np.mean(v)), 2) for k, v in sorted(acc.items())
        }
    print(json.dumps(out))
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(dict(summary=out, rows=rows), f, indent=1)


if __name__ == "__main__":
    main()
