"""End-to-end system tests: full SDS train steps with a tiny diffusion
prior, densification schedule, PLY round-trip, checkpoint round-trip.

This is the integration tier from SURVEY.md §4: an N-step SDS loop with a
stub (tiny, randomly-initialized) guidance model, checking shapes stay
static, losses stay finite, the Gaussian population evolves, and state
round-trips through orbax and PLY.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from humangaussian_tpu.testing import tiny_system


SYSTEM = tiny_system()
STATE0 = SYSTEM.init_state(jax.random.PRNGKey(42))


class TestInit:
    def test_scene_seeded_from_smplx_surface(self):
        scene = STATE0.scene
        assert int(scene.num_alive) == 500
        pts = np.asarray(scene.means)[:500]
        # surface points live inside the scaled toy-body bounding box
        assert np.abs(pts).max() < 2.0
        # gray init color: SH dc of 0.5 gray is 0 (RGB2SH(0.5) = 0)
        np.testing.assert_allclose(np.asarray(scene.sh_dc)[:500], 0.0, atol=1e-6)
        opacity0 = float(jax.nn.sigmoid(scene.opacity_logits[0, 0]))
        assert opacity0 == pytest.approx(0.1, abs=1e-5)


class TestTrainStep:
    def test_three_steps_finite_and_static(self):
        state = STATE0
        losses = []
        for _ in range(3):
            state, metrics = SYSTEM.train_step(state)
            losses.append(float(metrics["loss"]))
        assert all(np.isfinite(l) for l in losses)
        assert int(state.step) == 3
        assert state.scene.capacity == STATE0.scene.capacity
        # densify stats accumulated for visible gaussians
        assert float(state.densify.denom.max()) > 0

    def test_densify_schedule_fires(self):
        state = STATE0
        infos = []
        for _ in range(4):  # steps 0..3; densify at step 3 (start=2, every 3)
            state, _ = SYSTEM.train_step(state)
            state, info = SYSTEM.maybe_densify(state)
            if info is not None:
                infos.append(info)
        assert len(infos) == 1
        assert int(infos[0].n_alive) > 0

    def test_key_advances(self):
        s1, _ = SYSTEM.train_step(STATE0)
        s2, _ = SYSTEM.train_step(s1)
        assert not np.array_equal(np.asarray(s1.key), np.asarray(s2.key))


class TestEval:
    def test_eval_render_shapes(self):
        out, cams = SYSTEM.render_eval(STATE0.scene, "val")
        assert out["image"].shape == (2, 64, 64, 3)
        assert np.all(np.isfinite(np.asarray(out["image"])))


class TestPersistence:
    def test_checkpoint_roundtrip(self, tmp_path):
        from humangaussian_tpu.train.checkpoint import (
            restore_checkpoint,
            save_checkpoint,
        )

        state, _ = SYSTEM.train_step(STATE0)
        path = os.path.join(tmp_path, "ckpt")
        save_checkpoint(path, state)
        restored = restore_checkpoint(path, STATE0)
        np.testing.assert_allclose(
            np.asarray(restored.scene.means), np.asarray(state.scene.means)
        )
        np.testing.assert_allclose(
            np.asarray(restored.adam.mu["means"]),
            np.asarray(state.adam.mu["means"]),
        )
        assert int(restored.step) == int(state.step)

    def test_ply_roundtrip(self, tmp_path):
        from humangaussian_tpu.io.ply import load_ply, save_ply

        path = os.path.join(tmp_path, "scene.ply")
        n = save_ply(STATE0.scene, path)
        assert n == 500
        scene2 = load_ply(path)
        alive = np.asarray(scene2.alive)
        assert alive.sum() == 500
        np.testing.assert_allclose(
            np.asarray(scene2.means)[:500],
            np.asarray(STATE0.scene.means)[:500],
            atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(scene2.opacity_logits)[:500],
            np.asarray(STATE0.scene.opacity_logits)[:500],
            atol=1e-6,
        )

    def test_ply_animation_convention(self, tmp_path):
        from humangaussian_tpu.io.ply import load_ply, save_ply

        path = os.path.join(tmp_path, "scene.ply")
        save_ply(STATE0.scene, path)
        s = load_ply(path, animation_convention=True)
        ref = np.asarray(STATE0.scene.means)[:500]
        got = np.asarray(s.means)[:500]
        np.testing.assert_allclose(got[:, 1], ref[:, 2], atol=1e-6)  # y<->z
        np.testing.assert_allclose(got[:, 2], ref[:, 1], atol=1e-6)
