"""Trajectory utility tests."""

import jax.numpy as jnp
import numpy as np

from curobo_tpu.types.state import JointState
from curobo_tpu.util.trajectory import (
    JointStateFilter,
    TrajectoryExecutionManager,
    linear_resample,
    linear_smooth,
)


class TestResample:
    def test_linear_resample(self):
        q = jnp.linspace(0, 1, 8)[None, :, None] * jnp.ones((2, 8, 3))
        traj = JointState.from_position(q)
        out = linear_resample(traj, 15)
        assert out.position.shape == (2, 15, 3)
        np.testing.assert_allclose(np.asarray(out.position[0, :, 0]), np.linspace(0, 1, 15), atol=1e-6)


class TestSmooth:
    def test_smooths_noise_pins_endpoints(self):
        rng = np.random.RandomState(0)
        q = jnp.asarray(np.linspace(0, 1, 20)[:, None] + rng.normal(0, 0.05, (20, 2)), dtype=jnp.float32)
        traj = JointState.from_position(q[None])
        sm = linear_smooth(traj)
        # endpoints pinned
        np.testing.assert_allclose(np.asarray(sm.position[0, 0]), np.asarray(q[0]), atol=1e-6)
        np.testing.assert_allclose(np.asarray(sm.position[0, -1]), np.asarray(q[-1]), atol=1e-6)
        # interior smoother (smaller second difference)
        d2 = lambda x: np.abs(np.diff(np.asarray(x), n=2, axis=0)).mean()
        assert d2(sm.position[0]) < d2(q)


class TestFilter:
    def test_blend(self):
        f = JointStateFilter(alpha=0.5)
        s1 = JointState.from_position(jnp.zeros((1, 3)))
        s2 = JointState.from_position(jnp.ones((1, 3)))
        out1 = f(s1)
        out2 = f(s2)
        np.testing.assert_allclose(np.asarray(out2.position), 0.5, atol=1e-6)


class TestExecutionManager:
    def test_ring_buffer(self):
        mgr = TrajectoryExecutionManager(control_dt=0.02, buffer_horizon=4)
        plan = JointState.from_position(jnp.arange(10.0)[:, None] * jnp.ones((10, 2)))
        mgr.update_plan(plan)
        q1, _ = mgr.next_command()
        np.testing.assert_allclose(q1, 1.0)
        q2, _ = mgr.next_command()
        np.testing.assert_allclose(q2, 2.0)
        # drains to the buffer horizon then holds
        for _ in range(10):
            q, _ = mgr.next_command()
        np.testing.assert_allclose(q, 4.0)
        # new plan resets
        mgr.update_plan(plan)
        q, _ = mgr.next_command()
        np.testing.assert_allclose(q, 1.0)
