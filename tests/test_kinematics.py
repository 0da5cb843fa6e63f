"""FK engine tests against an independent numpy oracle.

Mirrors the reference test strategy (SURVEY.md §4: reference-implementation
oracles + finite-difference Jacobian checks, cf.
`curobo/tests/_src/robot/kinematics/test_jacobian_gradcheck.py`).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from curobo_tpu.robot.kinematics import Kinematics, compute_kinematics
from curobo_tpu.robot.model import RobotModelConfig, build_kinematics_params
from curobo_tpu.robot.params import JOINT_PRISMATIC, JOINT_REVOLUTE

CONTENT = os.path.join(os.path.dirname(__file__), "..", "curobo_tpu", "content", "robots")


# ---------------------------------------------------------------------------
# Independent numpy FK oracle (4x4 homogeneous matrices, sequential tree walk)
# ---------------------------------------------------------------------------
def numpy_fk(params, q):
    """q: (n_dof,) -> dict of link name -> 4x4 world transform."""

    def rot_axis(axis, angle):
        axis = np.asarray(axis, dtype=np.float64)
        c, s = np.cos(angle), np.sin(angle)
        K = np.array(
            [
                [0, -axis[2], axis[1]],
                [axis[2], 0, -axis[0]],
                [-axis[1], axis[0], 0],
            ]
        )
        return np.eye(3) * c + s * K + (1 - c) * np.outer(axis, axis)

    out = {}
    mats = [None] * params.n_links
    fixed_rot = np.asarray(params.fixed_rot, dtype=np.float64)
    fixed_pos = np.asarray(params.fixed_pos, dtype=np.float64)
    axes = np.asarray(params.joint_axis, dtype=np.float64)
    mult = np.asarray(params.mimic_mult, dtype=np.float64)
    off = np.asarray(params.mimic_offset, dtype=np.float64)

    for i in range(params.n_links):
        d = params.dof_idx[i]
        val = mult[i] * (q[d] if d >= 0 else 0.0) + off[i]
        T_fixed = np.eye(4)
        T_fixed[:3, :3] = fixed_rot[i]
        T_fixed[:3, 3] = fixed_pos[i]
        T_joint = np.eye(4)
        if params.joint_type[i] == JOINT_REVOLUTE:
            T_joint[:3, :3] = rot_axis(axes[i], val)
        elif params.joint_type[i] == JOINT_PRISMATIC:
            T_joint[:3, 3] = axes[i] * val
        local = T_fixed @ T_joint
        p = params.parent_idx[i]
        mats[i] = local if p < 0 else mats[p] @ local
        out[params.link_names[i]] = mats[i]
    return out


@pytest.fixture(scope="module")
def franka():
    return Kinematics.from_robot_yaml(os.path.join(CONTENT, "franka.yml"))


@pytest.fixture(scope="module", params=["franka", "ur10e", "dual_ur10e"])
def any_robot(request):
    return Kinematics.from_robot_yaml(os.path.join(CONTENT, f"{request.param}.yml"))


class TestModelBuild:
    def test_franka_shape(self, franka):
        p = franka.params
        assert p.n_dof == 7
        assert p.n_links >= 12
        assert p.n_spheres >= 61  # 61 real + 4 attached placeholders
        assert p.tool_frame_names == ("panda_hand",)
        assert len(p.self_collision.pair_a) > 100

    def test_levels_cover_all_links(self, franka):
        p = franka.params
        seen = sorted(i for lv in p.levels for i in lv)
        assert seen == list(range(p.n_links))
        for lv in p.levels[1:]:
            for i in lv:
                assert p.parent_idx[i] in {
                    j for prev in p.levels for j in prev if prev != lv
                }

    def test_locked_fingers_are_constant(self, franka):
        p = franka.params
        li = p.link_names.index("panda_leftfinger")
        assert p.dof_idx[li] == -1 or p.mimic_mult[li] == 0.0


class TestForwardKinematics:
    def test_fk_matches_numpy_oracle(self, any_robot):
        p = any_robot.params
        rng = np.random.RandomState(0)
        lo = np.asarray(p.joint_limits.lower)
        hi = np.asarray(p.joint_limits.upper)
        for trial in range(5):
            q = rng.uniform(lo, hi).astype(np.float32)
            state = compute_kinematics(p, jnp.asarray(q))
            oracle = numpy_fk(p, q)
            for t, name in enumerate(p.tool_frame_names):
                T = oracle[name]
                np.testing.assert_allclose(
                    np.asarray(state.tool_pose.position[t]), T[:3, 3], atol=2e-5
                )
                np.testing.assert_allclose(
                    np.asarray(state.link_rot[p.tool_frame_idx[t]]),
                    T[:3, :3],
                    atol=2e-5,
                )

    def test_fk_batched_matches_single(self, franka):
        p = franka.params
        rng = np.random.RandomState(1)
        q = rng.uniform(-1, 1, size=(16, 7)).astype(np.float32)
        batched = compute_kinematics(p, jnp.asarray(q))
        for i in [0, 7, 15]:
            single = compute_kinematics(p, jnp.asarray(q[i]))
            np.testing.assert_allclose(
                np.asarray(batched.tool_pose.position[i]),
                np.asarray(single.tool_pose.position),
                atol=1e-5,
            )
            np.testing.assert_allclose(
                np.asarray(batched.spheres[i]), np.asarray(single.spheres), atol=1e-5
            )

    def test_spheres_follow_links(self, franka):
        p = franka.params
        q = jnp.zeros((7,))
        state = compute_kinematics(p, q)
        oracle = numpy_fk(p, np.zeros(7))
        centers = np.asarray(p.sphere_centers)
        for s in range(0, p.n_spheres, 7):
            li = p.sphere_link_idx[s]
            T = oracle[p.link_names[li]]
            expect = T[:3, :3] @ centers[s] + T[:3, 3]
            np.testing.assert_allclose(
                np.asarray(state.spheres[s, :3]), expect, atol=2e-5
            )

    def test_known_franka_home_pose(self, franka):
        # At q=0 the Franka flange sits at roughly z≈1.0 m on the z axis
        # (0.333+0.316+0.384+0.107 link offsets minus hand geometry).
        state = compute_kinematics(franka.params, jnp.zeros((7,)))
        pos = np.asarray(state.tool_pose.position[0])
        assert abs(pos[0] - 0.088) < 0.02  # x offset from joint7
        assert 0.8 < pos[2] < 1.1


class TestJacobian:
    def test_jacobian_matches_finite_difference(self, any_robot):
        p = any_robot.params
        rng = np.random.RandomState(2)
        lo, hi = np.asarray(p.joint_limits.lower), np.asarray(p.joint_limits.upper)
        q = rng.uniform(np.maximum(lo, -2), np.minimum(hi, 2)).astype(np.float64)
        state = compute_kinematics(p, jnp.asarray(q, dtype=jnp.float32), compute_jacobian=True)
        J = np.asarray(state.jacobian)  # (T, 6, D)

        eps = 1e-5
        for t in range(p.n_tools):
            for d in range(p.n_dof):
                qp, qm_ = q.copy(), q.copy()
                qp[d] += eps
                qm_[d] -= eps
                Tp = numpy_fk(p, qp)[p.tool_frame_names[t]]
                Tm = numpy_fk(p, qm_)[p.tool_frame_names[t]]
                dv = (Tp[:3, 3] - Tm[:3, 3]) / (2 * eps)
                np.testing.assert_allclose(J[t, :3, d], dv, atol=2e-3)
                # angular velocity: dR R^T = skew(w)
                dR = (Tp[:3, :3] - Tm[:3, :3]) / (2 * eps)
                W = dR @ numpy_fk(p, q)[p.tool_frame_names[t]][:3, :3].T
                w = np.array([W[2, 1], W[0, 2], W[1, 0]])
                np.testing.assert_allclose(J[t, 3:, d], w, atol=2e-3)

    def test_autodiff_gradient_flows(self, franka):
        p = franka.params

        def loss(q):
            st = compute_kinematics(p, q)
            return jnp.sum(st.tool_pose.position**2) + jnp.sum(st.spheres[..., :3] ** 2)

        g = jax.grad(loss)(jnp.full((7,), 0.3))
        assert np.all(np.isfinite(np.asarray(g)))
        assert np.any(np.abs(np.asarray(g)) > 1e-3)

    def test_jacobian_jit_and_batch(self, franka):
        p = franka.params
        f = jax.jit(lambda q: compute_kinematics(p, q, compute_jacobian=True).jacobian)
        J = f(jnp.zeros((4, 3, 7)))
        assert J.shape == (4, 3, 1, 6, 7)
