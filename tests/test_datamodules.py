"""image/multiview datamodules + prompt debiasing, with synthetic assets."""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _write_png(path, arr):
    import imageio.v2 as imageio

    imageio.imwrite(path, (arr * 255).astype(np.uint8))


class TestSingleImage:
    def test_fixed_and_random_batches(self, tmp_path):
        from humangaussian_tpu.data.cameras import RandomCameraConfig
        from humangaussian_tpu.data.image import (
            SingleImageConfig,
            SingleImageDataModule,
        )

        rgba = np.zeros((32, 32, 4), np.float32)
        rgba[8:24, 8:24] = (0.8, 0.2, 0.1, 1.0)
        path = os.path.join(tmp_path, "ref_rgba.png")
        _write_png(path, rgba)

        dm = SingleImageDataModule(SingleImageConfig(
            image_path=path, height=16, width=16,
            random_camera=RandomCameraConfig(batch_size=2, height=16,
                                             width=16),
        ))
        b = dm.fixed_batch()
        assert b.rgb.shape == (1, 16, 16, 3)
        assert b.mask.shape == (1, 16, 16, 1)
        assert float(b.mask.sum()) > 0
        # rays through the image center point at the origin
        d_center = np.asarray(b.rays_d)[0, 8, 8]
        to_origin = -np.asarray(b.c2w)[0, :3, 3]
        to_origin /= np.linalg.norm(to_origin)
        assert float(np.dot(d_center, to_origin)) > 0.99
        # masked rgb premultiplied: outside the square is black
        assert float(b.rgb[0, 0, 0].sum()) == 0.0

        cams = dm.random_batch(jax.random.PRNGKey(0), 0)
        assert cams.c2w.shape == (2, 4, 4)

    def test_depth_and_normal_sidecars(self, tmp_path):
        from humangaussian_tpu.data.image import (
            SingleImageConfig,
            SingleImageDataModule,
        )

        rgba = np.ones((16, 16, 4), np.float32)
        _write_png(os.path.join(tmp_path, "x_rgba.png"), rgba)
        _write_png(os.path.join(tmp_path, "x_depth.png"),
                   np.full((16, 16, 3), 0.5, np.float32))
        _write_png(os.path.join(tmp_path, "x_normal.png"),
                   np.full((16, 16, 3), 0.5, np.float32))
        dm = SingleImageDataModule(SingleImageConfig(
            image_path=os.path.join(tmp_path, "x_rgba.png"),
            height=16, width=16, requires_depth=True, requires_normal=True,
        ))
        b = dm.fixed_batch()
        assert b.depth.shape == (1, 16, 16, 1)
        assert b.normal.shape == (1, 16, 16, 3)
        np.testing.assert_allclose(np.asarray(b.normal), 0.0, atol=0.02)


class TestMultiview:
    def _make_dataset(self, tmp_path, n=4):
        frames = []
        for i in range(n):
            img = np.full((16, 16, 3), i / n, np.float32)
            name = f"frame_{i}.png"
            _write_png(os.path.join(tmp_path, name), img)
            ang = 2 * np.pi * i / n
            c2w = np.eye(4)
            c2w[:3, 3] = [3 * np.cos(ang), 3 * np.sin(ang), 0.5]
            frames.append({
                "file_path": name, "transform_matrix": c2w.tolist(),
                "w": 16, "h": 16, "fl_x": 20.0, "fl_y": 20.0,
                "cx": 8.0, "cy": 8.0,
            })
        with open(os.path.join(tmp_path, "transforms.json"), "w") as f:
            json.dump({"camera_model": "OPENCV", "frames": frames}, f)

    def test_loads_and_recenters(self, tmp_path):
        from humangaussian_tpu.data.multiview import (
            MultiviewConfig,
            MultiviewDataModule,
        )

        self._make_dataset(tmp_path)
        dm = MultiviewDataModule(MultiviewConfig(
            dataroot=str(tmp_path), train_downsample_resolution=1,
        ))
        assert len(dm) == 4
        fr = dm.train_frame(0)
        assert fr.rgb.shape == (16, 16, 3)
        assert fr.rays_d.shape == (16, 16, 3)
        # recentred: mean camera position ~ 0
        mean_pos = np.mean(
            [np.asarray(dm.train_frame(i).c2w)[:3, 3] for i in range(4)],
            axis=0,
        )
        np.testing.assert_allclose(mean_pos, 0.0, atol=1e-5)
        # round-robin
        assert dm.train_frame(5) is dm.train_frame(1)

    def test_eval_interpolation(self, tmp_path):
        from humangaussian_tpu.data.multiview import (
            MultiviewConfig,
            MultiviewDataModule,
        )

        self._make_dataset(tmp_path)
        dm = MultiviewDataModule(MultiviewConfig(
            dataroot=str(tmp_path), train_downsample_resolution=1,
            eval_interpolation=(0, 1, 5),
        ))
        poses = dm.eval_poses()
        assert len(poses) == 5
        for p in poses:
            r = p[:3, :3]
            np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-5)


class TestPromptDebiasing:
    def test_debiasing_with_tiny_bert(self, tmp_path):
        torch = pytest.importorskip("torch")
        from transformers import BertConfig, BertForMaskedLM, BertTokenizer

        # tiny local BERT checkpoint with a hand-written WordPiece vocab
        vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
                 "side", "front", "back", "overhead", "this", "image",
                 "is", "depicting", "a", "view", "of", "man", "red",
                 "hat", "wearing"]
        vocab_file = os.path.join(tmp_path, "vocab.txt")
        with open(vocab_file, "w") as f:
            f.write("\n".join(vocab))
        tok = BertTokenizer(vocab_file, do_lower_case=True,
                            model_max_length=32)
        tok.save_pretrained(str(tmp_path))
        torch.manual_seed(0)
        model = BertForMaskedLM(BertConfig(
            vocab_size=len(vocab), hidden_size=32, num_hidden_layers=2,
            num_attention_heads=2, intermediate_size=64,
            max_position_embeddings=64,
        ))
        model.save_pretrained(str(tmp_path))

        from humangaussian_tpu.guidance.prompt import get_debiased_prompts

        out = get_debiased_prompts(
            "man wearing a red hat",
            ["side", "front", "back", "overhead"],
            str(tmp_path),
        )
        assert len(out) == 4
        # every debiased prompt is a subsequence of the original words
        orig = "man wearing a red hat".split()
        for p in out:
            words = p.split()
            it = iter(orig)
            assert all(w in it for w in words)
