"""RNEA inverse dynamics tests against an independent Lagrangian oracle.

The oracle computes torques from the energy formulation
tau_j = d/dt(dT/dqd_j) - dT/dq_j + dV/dq_j using only numpy FK and central
finite differences — structurally independent from the Newton-Euler
recursion it validates (reference pattern:
`curobo/tests/_src/robot/dynamics/rnea_numpy_reference.py` — but a
different method, not a copy)."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from curobo_tpu.robot.dynamics import Dynamics, compute_inverse_dynamics
from curobo_tpu.robot.kinematics import Kinematics
from curobo_tpu.robot.params import JOINT_PRISMATIC, JOINT_REVOLUTE

CONTENT = os.path.join(os.path.dirname(__file__), "..", "curobo_tpu", "content", "robots")
G = np.array([0.0, 0.0, -9.81])


@pytest.fixture(scope="module")
def kin():
    return Kinematics.from_robot_yaml(os.path.join(CONTENT, "franka.yml"))


# ---------------------------------------------------------------------------
# numpy FK returning per-link world rotation + CoM world position
# ---------------------------------------------------------------------------
def fk_links(params, q):
    import numpy as onp

    def rot_axis(axis, angle):
        axis = onp.asarray(axis, dtype=onp.float64)
        c, s = onp.cos(angle), onp.sin(angle)
        K = onp.array(
            [[0, -axis[2], axis[1]], [axis[2], 0, -axis[0]], [-axis[1], axis[0], 0]]
        )
        return onp.eye(3) * c + s * K + (1 - c) * onp.outer(axis, axis)

    L = params.n_links
    mats = [None] * L
    fixed_rot = onp.asarray(params.fixed_rot, dtype=onp.float64)
    fixed_pos = onp.asarray(params.fixed_pos, dtype=onp.float64)
    axes = onp.asarray(params.joint_axis, dtype=onp.float64)
    mult = onp.asarray(params.mimic_mult, dtype=onp.float64)
    off = onp.asarray(params.mimic_offset, dtype=onp.float64)
    for i in range(L):
        d = params.dof_idx[i]
        val = mult[i] * (q[d] if d >= 0 else 0.0) + off[i]
        T = onp.eye(4)
        T[:3, :3] = fixed_rot[i]
        T[:3, 3] = fixed_pos[i]
        J = onp.eye(4)
        if params.joint_type[i] == JOINT_REVOLUTE:
            J[:3, :3] = rot_axis(axes[i], val)
        elif params.joint_type[i] == JOINT_PRISMATIC:
            J[:3, 3] = axes[i] * val
        local = T @ J
        p = params.parent_idx[i]
        mats[i] = local if p < 0 else mats[p] @ local
    return mats


def lagrangian_energy(params, q, qd):
    """T(q, qd) and V(q) via numeric differentiation of link frames."""
    eps = 1e-6
    mats0 = fk_links(params, q)
    T = 0.0
    V = 0.0
    L = params.n_links
    coms = np.asarray(params.link_com, dtype=np.float64)
    masses = np.asarray(params.link_mass, dtype=np.float64)
    inertias = np.asarray(params.link_inertia, dtype=np.float64)

    # frame time derivatives via central differences along qd
    matsp = fk_links(params, q + eps * qd)
    matsm = fk_links(params, q - eps * qd)
    for i in range(L):
        m = masses[i]
        R = mats0[i][:3, :3]
        p_com = mats0[i][:3, :3] @ coms[i] + mats0[i][:3, 3]
        # CoM velocity
        p_p = matsp[i][:3, :3] @ coms[i] + matsp[i][:3, 3]
        p_m = matsm[i][:3, :3] @ coms[i] + matsm[i][:3, 3]
        v = (p_p - p_m) / (2 * eps)
        # angular velocity from Rdot R^T
        Rdot = (matsp[i][:3, :3] - matsm[i][:3, :3]) / (2 * eps)
        W = Rdot @ R.T
        w = np.array([W[2, 1], W[0, 2], W[1, 0]])
        I_world = R @ inertias[i] @ R.T
        T += 0.5 * m * v @ v + 0.5 * w @ I_world @ w
        V += -m * G @ p_com
    return T, V


def oracle_tau(params, q, qd, qdd, h=1e-4):
    """tau_j = d/dt(dT/dqd_j) - dT/dq_j + dV/dq_j by finite differences."""
    D = params.n_dof

    def dT_dqd(q_, qd_):
        g = np.zeros(D)
        for j in range(D):
            e = np.zeros(D)
            e[j] = h
            Tp, _ = lagrangian_energy(params, q_, qd_ + e)
            Tm, _ = lagrangian_energy(params, q_, qd_ - e)
            g[j] = (Tp - Tm) / (2 * h)
        return g

    # d/dt (dT/dqd) with q(t), qd(t) advancing along (qd, qdd)
    dt = 1e-4
    gp = dT_dqd(q + dt * qd, qd + dt * qdd)
    gm = dT_dqd(q - dt * qd, qd - dt * qdd)
    term1 = (gp - gm) / (2 * dt)

    term2 = np.zeros(D)
    term3 = np.zeros(D)
    for j in range(D):
        e = np.zeros(D)
        e[j] = h
        Tp, Vp = lagrangian_energy(params, q + e, qd)
        Tm, Vm = lagrangian_energy(params, q - e, qd)
        term2[j] = (Tp - Tm) / (2 * h)
        term3[j] = (Vp - Vm) / (2 * h)
    return term1 - term2 + term3


class TestRNEA:
    def test_gravity_compensation_static(self, kin):
        # At rest: tau = dV/dq (pure gravity torque); oracle with qd=qdd=0.
        rng = np.random.RandomState(0)
        q = rng.uniform(-1.0, 1.0, 7)
        tau = np.asarray(
            compute_inverse_dynamics(
                kin.params, jnp.asarray(q, dtype=jnp.float32),
                jnp.zeros(7), jnp.zeros(7),
            )
        )
        expect = oracle_tau(kin.params, q, np.zeros(7), np.zeros(7))
        np.testing.assert_allclose(tau, expect, atol=5e-3)

    def test_full_dynamics_matches_lagrangian(self, kin):
        rng = np.random.RandomState(1)
        for trial in range(2):
            q = rng.uniform(-1.0, 1.0, 7)
            qd = rng.uniform(-1.0, 1.0, 7)
            qdd = rng.uniform(-2.0, 2.0, 7)
            tau = np.asarray(
                compute_inverse_dynamics(
                    kin.params,
                    jnp.asarray(q, dtype=jnp.float32),
                    jnp.asarray(qd, dtype=jnp.float32),
                    jnp.asarray(qdd, dtype=jnp.float32),
                )
            )
            expect = oracle_tau(kin.params, q, qd, qdd)
            np.testing.assert_allclose(tau, expect, rtol=2e-2, atol=2e-2)

    def test_batched(self, kin):
        rng = np.random.RandomState(2)
        q = jnp.asarray(rng.uniform(-1, 1, (4, 8, 7)), dtype=jnp.float32)
        qd = jnp.zeros_like(q)
        qdd = jnp.zeros_like(q)
        tau = compute_inverse_dynamics(kin.params, q, qd, qdd)
        assert tau.shape == (4, 8, 7)
        single = compute_inverse_dynamics(kin.params, q[0, 0], qd[0, 0], qdd[0, 0])
        np.testing.assert_allclose(np.asarray(tau[0, 0]), np.asarray(single), atol=1e-5)

    def test_zero_gravity_at_rest_is_zero(self, kin):
        q = jnp.asarray(np.random.RandomState(3).uniform(-1, 1, 7), dtype=jnp.float32)
        tau = compute_inverse_dynamics(
            kin.params, q, jnp.zeros(7), jnp.zeros(7), gravity=(0.0, 0.0, 0.0)
        )
        np.testing.assert_allclose(np.asarray(tau), 0.0, atol=1e-5)

    def test_gradient_flows(self, kin):
        import jax

        q = jnp.asarray(np.random.RandomState(4).uniform(-1, 1, 7), dtype=jnp.float32)
        g = jax.grad(
            lambda q: jnp.sum(
                compute_inverse_dynamics(kin.params, q, jnp.zeros(7), jnp.zeros(7)) ** 2
            )
        )(q)
        assert np.isfinite(np.asarray(g)).all()
