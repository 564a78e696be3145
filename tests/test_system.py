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

from humangaussian_tpu.data.cameras import RandomCameraConfig
from humangaussian_tpu.guidance.dual_branch import (
    DualBranchGuidance,
    GuidanceConfig,
)
from humangaussian_tpu.guidance.prompt import PromptEmbeddings
from humangaussian_tpu.guidance.schedule import DiffusionSchedule
from humangaussian_tpu.guidance.unet import DualBranchUNet, TINY_TEST_CONFIG
from humangaussian_tpu.guidance.vae import AutoencoderKL, tiny_vae_config
from humangaussian_tpu.ops.projection import RasterizeConfig
from humangaussian_tpu.smplx.model import toy_model
from humangaussian_tpu.smplx.skeleton import Skeleton
from humangaussian_tpu.train.system import (
    GaussianDreamerConfig,
    GaussianDreamerSystem,
)


def tiny_system(capacity=2048, batch=2):
    rng = jax.random.PRNGKey(0)
    unet = DualBranchUNet(TINY_TEST_CONFIG)
    x = jnp.zeros((1, 8, 8, 8))
    uparams = unet.init(
        rng, x, x, jnp.zeros((1,)), jnp.zeros((1, 7, 32)), jnp.zeros((1, 6))
    )
    vae = AutoencoderKL(tiny_vae_config())
    vparams = vae.init(rng, jnp.zeros((1, 16, 16, 3)), rng)
    guidance = DualBranchGuidance(
        unet=unet,
        unet_params=uparams,
        vae=vae,
        vae_params=vparams,
        schedule=DiffusionSchedule.create(),
        cfg=GuidanceConfig(latent_size=8, image_size=16, guidance_scale=7.5),
    )
    emb = PromptEmbeddings(
        text_vd=jax.random.normal(rng, (4, 7, 32)),
        uncond_vd=jax.random.normal(jax.random.PRNGKey(1), (4, 7, 32)),
        text=jnp.zeros((7, 32)),
        uncond=jnp.zeros((7, 32)),
        null=jnp.zeros((7, 32)),
    )
    skel = Skeleton(style="humansd", apose=True).load_smplx(toy_model()).scale(-10)
    cfg = GaussianDreamerConfig(
        capacity=capacity,
        pts_num=500,
        pose_image_size=64,
        tile_capacity=256,
        densify_prune_start_step=2,
        densify_prune_interval=3,
        densify_prune_end_step=100,
        prune_only_start_step=100,
        prune_only_end_step=200,
        prune_only_interval=3,
    )
    cam_cfg = RandomCameraConfig(
        batch_size=batch, height=64, width=64, eval_height=64, eval_width=64,
        n_val_views=2, n_test_views=3,
    )
    raster_cfg = RasterizeConfig(tile=32, max_tiles_per_gaussian=16)
    return GaussianDreamerSystem(
        cfg, skel, guidance, emb, camera_cfg=cam_cfg, raster_cfg=raster_cfg
    )


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
