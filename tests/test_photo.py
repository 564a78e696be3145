"""Vanilla photo-supervised 3DGS: losses, loaders, overfit smoke."""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from humangaussian_tpu.losses import l1_loss, photometric_loss, psnr, ssim


class TestSSIM:
    def test_identity_is_one(self):
        img = jnp.asarray(np.random.RandomState(0).rand(32, 32, 3), jnp.float32)
        assert float(ssim(img, img)) == pytest.approx(1.0, abs=1e-5)

    def test_matches_reference_torch_impl(self):
        torch = pytest.importorskip("torch")
        import torch.nn.functional as F
        from math import exp

        # the reference ssim (gaussiansplatting/utils/loss_utils.py:23-61)
        def t_gaussian(ws, sigma):
            g = torch.tensor(
                [exp(-((x - ws // 2) ** 2) / (2 * sigma**2)) for x in range(ws)]
            )
            return g / g.sum()

        def t_ssim(i1, i2, ws=11):
            ch = i1.size(-3)
            w1 = t_gaussian(ws, 1.5).unsqueeze(1)
            win = w1.mm(w1.t()).float().unsqueeze(0).unsqueeze(0)
            win = win.expand(ch, 1, ws, ws).contiguous()
            mu1 = F.conv2d(i1, win, padding=ws // 2, groups=ch)
            mu2 = F.conv2d(i2, win, padding=ws // 2, groups=ch)
            mu1_sq, mu2_sq, mu12 = mu1**2, mu2**2, mu1 * mu2
            s1 = F.conv2d(i1 * i1, win, padding=ws // 2, groups=ch) - mu1_sq
            s2 = F.conv2d(i2 * i2, win, padding=ws // 2, groups=ch) - mu2_sq
            s12 = F.conv2d(i1 * i2, win, padding=ws // 2, groups=ch) - mu12
            c1, c2 = 0.01**2, 0.03**2
            m = ((2 * mu12 + c1) * (2 * s12 + c2)) / (
                (mu1_sq + mu2_sq + c1) * (s1 + s2 + c2)
            )
            return m.mean().item()

        rng = np.random.RandomState(1)
        a = rng.rand(1, 24, 24, 3).astype(np.float32)
        b = np.clip(a + rng.randn(1, 24, 24, 3).astype(np.float32) * 0.1, 0, 1)
        ours = float(ssim(jnp.asarray(a), jnp.asarray(b)))
        at = torch.tensor(a.transpose(0, 3, 1, 2))
        bt = torch.tensor(b.transpose(0, 3, 1, 2))
        np.testing.assert_allclose(ours, t_ssim(at, bt), atol=1e-4)

    def test_psnr(self):
        a = jnp.zeros((8, 8, 3))
        b = jnp.full((8, 8, 3), 0.1)
        assert float(psnr(a, b)) == pytest.approx(20.0, abs=1e-3)


class TestBlenderLoader:
    def make_dataset(self, tmp_path):
        from PIL import Image

        rng = np.random.RandomState(0)
        frames = []
        for i in range(3):
            img = (rng.rand(32, 32, 4) * 255).astype(np.uint8)
            name = f"r_{i}.png"
            Image.fromarray(img).save(os.path.join(tmp_path, name))
            c2w = np.eye(4)
            c2w[:3, 3] = [0, 0, 2 + i]
            frames.append(
                {"file_path": f"./r_{i}", "transform_matrix": c2w.tolist()}
            )
        meta = {"camera_angle_x": 0.8, "frames": frames}
        with open(os.path.join(tmp_path, "transforms_train.json"), "w") as f:
            json.dump(meta, f)
        return tmp_path

    def test_load(self, tmp_path):
        from humangaussian_tpu.data.photo import load_blender

        root = self.make_dataset(str(tmp_path))
        ds = load_blender(root, white_background=True)
        assert len(ds.train) == 3 and len(ds.test) == 0
        p = ds.train[0]
        assert p.image.shape == (32, 32, 3)
        assert p.fovx == pytest.approx(0.8)
        assert ds.extent > 0


class TestPhotoOverfit:
    def test_loss_decreases_on_fixed_view(self):
        """Optimize a perturbed scene toward renders of a target scene."""
        from humangaussian_tpu.core.camera import camera_from_c2w, look_at_c2w
        from humangaussian_tpu.data.photo import PosedImage
        from humangaussian_tpu.ops.projection import RasterizeConfig
        from humangaussian_tpu.train.photo import (
            PhotoTrainConfig,
            PhotoTrainer,
        )

        rng = np.random.RandomState(0)
        n = 200
        pts = rng.randn(n, 3).astype(np.float32) * 0.3
        colors = rng.rand(n, 3).astype(np.float32)

        cfg = PhotoTrainConfig(
            capacity=256, sh_degree=0, tile_capacity=256,
            densify_from_iter=10_000,  # pure photometric fit
        )
        trainer = PhotoTrainer(
            cfg, extent=2.0,
            raster_cfg=RasterizeConfig(tile=32, max_tiles_per_gaussian=16),
        )
        state = trainer.init_state(jax.random.PRNGKey(0), pts, colors)

        # target = render of the init scene with brighter colors
        target_scene = state.scene._replace(
            sh_dc=state.scene.sh_dc + 0.5,
            opacity_logits=jnp.where(
                state.scene.alive[:, None], 2.0, -10.0
            ),
        )
        c2w = look_at_c2w(
            jnp.array([0.0, 0.0, 2.5]), jnp.zeros(3), jnp.array([0.0, 1.0, 0.0])
        )
        cam = camera_from_c2w(c2w, 0.9, 64, 64)
        gt = np.asarray(trainer.render(target_scene, cam)["image"])
        posed = PosedImage(image=gt, c2w=np.asarray(c2w), fovy=0.9, fovx=0.9)

        losses = []
        for _ in range(30):
            state, metrics = trainer.train_step(state, posed)
            losses.append(float(metrics["loss"]))
        assert losses[-1] < losses[0] * 0.7, losses[:3] + losses[-3:]

    def test_reset_opacity(self):
        from humangaussian_tpu.train.photo import PhotoTrainConfig, PhotoTrainer

        rng = np.random.RandomState(0)
        trainer = PhotoTrainer(
            PhotoTrainConfig(capacity=128, sh_degree=0, tile_capacity=256),
            extent=2.0,
        )
        state = trainer.init_state(
            jax.random.PRNGKey(0),
            rng.randn(50, 3).astype(np.float32),
            rng.rand(50, 3).astype(np.float32),
        )
        state = state._replace(
            adam=state.adam._replace(
                mu=dict(state.adam.mu, opacity_logits=jnp.ones_like(
                    state.adam.mu["opacity_logits"]
                ))
            )
        )
        s2 = trainer.reset_opacity(state)
        op = np.asarray(jax.nn.sigmoid(s2.scene.opacity_logits))[:50]
        assert op.max() <= 0.01 + 1e-5
        assert float(s2.adam.mu["opacity_logits"].sum()) == 0.0


class TestLPIPS:
    def test_identity_zero_and_sensitivity(self):
        torch = pytest.importorskip("torch")
        from humangaussian_tpu.perceptual import (
            LPIPS,
            load_lpips_params,
            lpips_fn,
        )

        # synthetic torchvision-style VGG16 features state_dict
        rng = np.random.RandomState(0)
        conv_ids = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
        chans = [64, 64, 128, 128, 256, 256, 256, 512, 512, 512, 512, 512, 512]
        sd = {}
        cin = 3
        for tid, ch in zip(conv_ids, chans):
            sd[f"features.{tid}.weight"] = rng.randn(ch, cin, 3, 3).astype(np.float32) * 0.05
            sd[f"features.{tid}.bias"] = np.zeros(ch, np.float32)
            cin = ch
        params = load_lpips_params(sd)
        fn = lpips_fn(params)
        a = jnp.asarray(rng.rand(1, 32, 32, 3), jnp.float32)
        d_same = float(fn(a, a)[0])
        assert d_same == pytest.approx(0.0, abs=1e-6)
        b = jnp.clip(a + 0.3, 0, 1)
        assert float(fn(a, b)[0]) > 1e-5

    def test_vgg_conv_matches_torch(self):
        torch = pytest.importorskip("torch")
        import torch.nn.functional as F
        from humangaussian_tpu.perceptual import VGG16Features, load_lpips_params

        rng = np.random.RandomState(1)
        w = rng.randn(64, 3, 3, 3).astype(np.float32) * 0.1
        b = rng.randn(64).astype(np.float32)
        sd = {"features.0.weight": w, "features.0.bias": b}
        conv_ids = [2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
        chans = [64, 128, 128, 256, 256, 256, 512, 512, 512, 512, 512, 512]
        cin = 64
        for tid, ch in zip(conv_ids, chans):
            sd[f"features.{tid}.weight"] = np.zeros((ch, cin, 3, 3), np.float32)
            sd[f"features.{tid}.bias"] = np.zeros(ch, np.float32)
            cin = ch
        params = load_lpips_params(sd)
        x = rng.rand(1, 8, 8, 3).astype(np.float32)
        taps = VGG16Features().apply(
            {"params": params["params"]["vgg"]}, jnp.asarray(x)
        )
        with torch.no_grad():
            ref = F.relu(
                F.conv2d(
                    torch.tensor(x.transpose(0, 3, 1, 2)),
                    torch.tensor(w), torch.tensor(b), padding=1,
                )
            ).numpy()
        got = np.asarray(
            VGG16Features().apply(
                {"params": params["params"]["vgg"]}, jnp.asarray(x)
            )[0]
        )
        # tap 0 comes after conv_0 relu AND conv_1 relu; with conv_1 = 0
        # weights the output is relu(bias)=0, so compare the first conv
        # through a single-layer probe instead
        from flax import linen as fnn

        probe = fnn.Conv(64, (3, 3), padding=1)
        pp = {"params": params["params"]["vgg"]["conv_0"]}
        ours = np.asarray(fnn.relu(probe.apply(pp, jnp.asarray(x))))
        np.testing.assert_allclose(
            ours.transpose(0, 3, 1, 2), ref, atol=1e-5
        )
