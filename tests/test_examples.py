"""Run every example in --test smoke mode as a subprocess.

Parity: reference `curobo/tests/test_examples.py:16-38`.
"""

import os
import subprocess
import sys

import pytest

EXAMPLES = [
    "inverse_kinematics.py",
    "motion_planning.py",
    "model_predictive_control.py",
    "perception_to_planning.py",
    "forward_kinematics.py",
    "humanoid_retargeting.py",
    "volumetric_mapping.py",
    "block_sparse_mapping.py",
    "attached_object.py",
    "multi_env_batch.py",
    "whole_body_balance_ik.py",
    "build_robot_model.py",
    "custom_optimization.py",
    "lidar_volumetric_mapping.py",
    "robot_pose_calibration.py",
    "sphere_fit_comparison.py",
]

ROOT = os.path.join(os.path.dirname(__file__), "..")


@pytest.mark.parametrize("example", EXAMPLES)
def test_example_smoke(example):
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    out = subprocess.run(
        [sys.executable, os.path.join(ROOT, "examples", example), "--test"],
        capture_output=True,
        text=True,
        timeout=600,
        env=env,
        cwd=ROOT,
    )
    assert out.returncode == 0, f"{example} failed:\n{out.stdout}\n{out.stderr}"
    assert "TEST PASSED" in out.stdout
