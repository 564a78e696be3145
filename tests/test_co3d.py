"""co3d-datamodule on a synthetic CO3D-v2-layout sequence."""
import gzip
import json
import os

import numpy as np
import pytest


def _make_co3d(tmp_path, n_frames=6, h=40, w=48):
    """Dataset root: <root>/<category>/<sequence>/... with
    <category>/frame_annotations.jgz and image paths relative to root."""
    from PIL import Image

    root = tmp_path / "co3d"
    cat = root / "apple"
    seq = cat / "110_13051_23361"
    (seq / "images").mkdir(parents=True)
    (seq / "masks").mkdir(parents=True)
    (seq / "depths").mkdir(parents=True)

    frames = []
    rng = np.random.RandomState(0)
    for i in range(n_frames):
        ang = 2 * np.pi * i / n_frames
        # camera on a circle, PyTorch3D convention R, T (world->cam)
        cam_pos = np.array(
            [2.0 * np.cos(ang), 0.4, 2.0 * np.sin(ang)], np.float32
        )
        fwd = -cam_pos / np.linalg.norm(cam_pos)
        up = np.array([0.0, 1.0, 0.0])
        right = np.cross(up, fwd)
        right /= np.linalg.norm(right)
        up2 = np.cross(fwd, right)
        rot_w2c = np.stack([right, up2, fwd], axis=0)  # world -> cam rows
        # reference: pose[:3,:3]=R, pose[:3,3:]=-R@T builds c2w from the
        # stored (R, T); invert so stored values describe our w2c
        r_stored = rot_w2c.T
        t_stored = -(r_stored.T @ cam_pos)
        img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        Image.fromarray(img).save(seq / "images" / f"frame{i:06d}.jpg")
        mask = np.zeros((h, w), np.uint8)
        mask[h // 4 : 3 * h // 4, w // 4 : 3 * w // 4] = 255
        Image.fromarray(mask).save(seq / "masks" / f"frame{i:06d}.png")
        depth16 = np.full((h, w), np.float16(2.0).view(np.uint16), np.uint16)
        Image.fromarray(depth16, mode="I;16").save(
            seq / "depths" / f"frame{i:06d}.png"
        )
        frames.append(
            {
                "sequence_name": "110_13051_23361",
                "meta": {"frame_type": "train"},
                "image": {
                    "path": f"apple/110_13051_23361/images/frame{i:06d}.jpg",
                    "size": [h, w],
                },
                "mask": {
                    "path": f"apple/110_13051_23361/masks/frame{i:06d}.png"
                },
                "depth": {
                    "path": f"apple/110_13051_23361/depths/frame{i:06d}.png",
                    "scale_adjustment": 1.0,
                },
                "viewpoint": {
                    "focal_length": [2.0, 2.0],
                    "principal_point": [0.0, 0.0],
                    "R": r_stored.tolist(),
                    "T": t_stored.tolist(),
                },
            }
        )
    with gzip.open(cat / "frame_annotations.jgz", "wt") as fp:
        json.dump(frames, fp)
    return str(seq)


class TestCo3d:
    def test_loads_and_normalizes(self, tmp_path):
        from humangaussian_tpu.data.co3d import Co3dConfig, Co3dDataModule

        seq = _make_co3d(tmp_path)
        dm = Co3dDataModule(Co3dConfig(root_dir=seq, height=32, width=32))
        assert len(dm) == 6
        fr = dm.train_frame(0)
        assert fr.rgb.shape == (32, 32, 3)
        assert fr.mask.shape == (32, 32)
        assert fr.depth.shape == (32, 32)
        assert fr.rays_o.shape == (32, 32, 3)
        # similarity normalization: camera distances ~ scale_radius*0.95
        dists = [
            np.linalg.norm(dm.train_frame(i).c2w[:3, 3]) for i in range(6)
        ]
        assert 0.5 < np.median(dists) < 1.5
        # rays point at the recentred object
        d = fr.rays_d[16, 16]
        o = fr.rays_o[16, 16]
        # closest approach of the central ray to the origin is near 0
        t_close = -np.dot(o, d)
        assert np.linalg.norm(o + t_close * d) < 0.6
        assert np.isfinite(fr.rgb).all()

    def test_no_crop_path(self, tmp_path):
        from humangaussian_tpu.data.co3d import Co3dConfig, Co3dDataModule

        seq = _make_co3d(tmp_path)
        dm = Co3dDataModule(
            Co3dConfig(root_dir=seq, height=24, width=24, box_crop=False,
                       use_mask=False)
        )
        fr = dm.train_frame(2)
        assert fr.mask.min() == 1.0  # no mask -> all ones
        assert fr.rgb.shape == (24, 24, 3)

    def test_depth_decoding(self, tmp_path):
        from humangaussian_tpu.data.co3d import load_f16_depth_png

        from PIL import Image

        p = str(tmp_path / "d.png")
        d16 = np.full((8, 8), np.float16(1.5).view(np.uint16), np.uint16)
        Image.fromarray(d16, mode="I;16").save(p)
        d = load_f16_depth_png(p)
        np.testing.assert_allclose(d, 1.5)

    def test_registry(self):
        from humangaussian_tpu import registry

        assert registry.find("co3d-datamodule") is not None
        assert registry.find("single-image-datamodule") is not None
        assert registry.find("multiview-camera-datamodule") is not None
