"""Multi-chip data-parallel training on the emulated 8-device CPU mesh.

Checks SURVEY.md §7.2(9): the sharded step must produce the SAME
parameter update and densification statistics as the single-device step
(identical RNG stream, psum'd grads, lock-step densify inputs).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from humangaussian_tpu.dist.parallel import make_dp_train_step, make_mesh
from test_system import tiny_system


@pytest.fixture(scope="module")
def setup():
    if len(jax.devices()) < 4:
        pytest.skip("needs >= 4 emulated devices")
    system = tiny_system(batch=4)
    state0 = system.init_state(jax.random.PRNGKey(7))
    return system, state0


class TestDataParallel:
    def test_matches_single_device_step(self, setup):
        system, state0 = setup
        mesh = make_mesh(4)
        dp_step = make_dp_train_step(system, mesh)

        s_ref, m_ref = system.train_step(state0)
        s_dp, m_dp = dp_step(state0)

        np.testing.assert_allclose(
            float(m_dp["loss"]), float(m_ref["loss"]), rtol=2e-4
        )
        np.testing.assert_allclose(
            np.asarray(s_dp.scene.means),
            np.asarray(s_ref.scene.means),
            atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(s_dp.densify.grad_accum),
            np.asarray(s_ref.densify.grad_accum),
            atol=1e-6,
        )
        np.testing.assert_array_equal(
            np.asarray(s_dp.densify.max_radii2d),
            np.asarray(s_ref.densify.max_radii2d),
        )

    def test_multiple_steps_and_densify(self, setup):
        system, state0 = setup
        mesh = make_mesh(4)
        dp_step = make_dp_train_step(system, mesh)
        state = state0
        for _ in range(3):
            state, metrics = dp_step(state)
            state, _ = system.maybe_densify(state)
        assert np.isfinite(float(metrics["loss"]))
        assert int(state.step) == 3

    def test_two_device_mesh(self, setup):
        system, state0 = setup
        mesh = make_mesh(2)
        dp_step = make_dp_train_step(system, mesh)
        _, m2 = dp_step(state0)
        _, m_ref = system.train_step(state0)
        np.testing.assert_allclose(
            float(m2["loss"]), float(m_ref["loss"]), rtol=2e-4
        )
