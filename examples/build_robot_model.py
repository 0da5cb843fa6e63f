"""Example: build a curobo-tpu robot config from a URDF.

The framework needs two things a URDF does not carry: collision spheres
per link and a self-collision ignore matrix. `RobotBuilder` generates
both (skeleton/mesh sphere fitting + retract-pose ignore iteration) and
writes the framework's own YAML schema, which every downstream module
(FK, IK, planning, MPC) consumes.

Usage:
    python examples/build_robot_model.py [--test] [--urdf PATH]

Parity: reference `examples/getting_started/build_robot_model.py`
(RobotBuilder / MorphIt sphere fitting / XRDF export).
"""

import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# A minimal 3-dof arm URDF so the example is self-contained.
DEMO_URDF = """<?xml version="1.0"?>
<robot name="demo_arm">
  <link name="base_link"/>
  <link name="link1"/>
  <link name="link2"/>
  <link name="tool"/>
  <joint name="j1" type="revolute">
    <parent link="base_link"/><child link="link1"/>
    <origin xyz="0 0 0.10" rpy="0 0 0"/><axis xyz="0 0 1"/>
    <limit lower="-3.0" upper="3.0" effort="50" velocity="2.0"/>
  </joint>
  <joint name="j2" type="revolute">
    <parent link="link1"/><child link="link2"/>
    <origin xyz="0 0 0.25" rpy="0 0 0"/><axis xyz="0 1 0"/>
    <limit lower="-2.2" upper="2.2" effort="50" velocity="2.0"/>
  </joint>
  <joint name="j3" type="revolute">
    <parent link="link2"/><child link="tool"/>
    <origin xyz="0 0 0.25" rpy="0 0 0"/><axis xyz="0 1 0"/>
    <limit lower="-2.2" upper="2.2" effort="50" velocity="2.0"/>
  </joint>
</robot>
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--test", action="store_true")
    ap.add_argument("--urdf", type=str, default="", help="URDF to import")
    ap.add_argument("--out", type=str, default="", help="output YAML path")
    args = ap.parse_args()

    if args.test:
        os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    import curobo_tpu as ct
    from curobo_tpu.robot.builder import BuilderConfig, RobotBuilder

    if args.urdf:
        urdf_path, base, tools = args.urdf, None, None
        raise SystemExit("pass base link/tool frames by editing this example")
    tmp = tempfile.mkdtemp(prefix="curobo_tpu_builder_")
    urdf_path = os.path.join(tmp, "demo_arm.urdf")
    with open(urdf_path, "w") as f:
        f.write(DEMO_URDF)
    base, tools = "base_link", ["tool"]

    # 1. fit collision spheres + build the ignore matrix + write YAML
    builder = RobotBuilder(
        urdf_path, base, tools, BuilderConfig(spheres_per_link=4)
    )
    out_path = args.out or os.path.join(tmp, "demo_arm.yml")
    cfg = builder.build(out_path=out_path, name="demo_arm")

    spheres = cfg["robot"]["collision"]["spheres"]
    n_sph = sum(len(v) for v in spheres.values())
    print(f"fitted {n_sph} collision spheres over {len(spheres)} links")
    print(f"wrote robot config -> {out_path}")

    # 2. the generated YAML drives the whole stack: load it and run FK
    kin = ct.Kinematics.from_robot_yaml(out_path)
    q = jnp.zeros((1, kin.params.n_dof))
    state = ct.compute_kinematics(kin.params, q)
    tool_p = state.tool_pose.position[0, 0]
    print(f"FK at zero config: tool at {[round(float(x), 3) for x in tool_p]}")

    # 3. retract-pose debug report (reference RobotDebugger analog)
    report = builder.debug_retract_pose(cfg)
    print(f"retract-pose self-collision margin: {report}")

    if args.test:
        assert n_sph > 0 and abs(float(tool_p[2]) - 0.60) < 1e-3
        print("TEST PASSED")


if __name__ == "__main__":
    main()
