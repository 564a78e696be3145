"""Multiview-frames datamodule (posed-video reconstruction workflows).

TPU-native port of /root/reference/threestudio/data/multiview.py: reads
an instant-ngp style `transforms.json` (OPENCV camera model, per-frame
`transform_matrix`/fl_x/fl_y/cx/cy) from `dataroot`, recenters the
camera cloud per `camera_layout` ("around" subtracts the mean position,
"front" additionally pushes along the mean -z by `camera_distance`,
multiview.py:109-122), downsamples frames, and serves per-step batches
of one posed image with its rays. Eval views interpolate between train
poses (multiview.py:196-355) — here a simple pose lerp with normalized
rotation rows.
"""
from __future__ import annotations

import dataclasses
import json
import os
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class MultiviewConfig:
    """Mirrors MultiviewsDataModuleConfig (multiview.py:61-72)."""

    dataroot: str = ""
    train_downsample_resolution: int = 4
    eval_downsample_resolution: int = 4
    train_data_interval: int = 1
    eval_data_interval: int = 1
    camera_layout: str = "around"  # "around" | "front"
    camera_distance: float = -1.0
    eval_interpolation: tuple | None = None  # (idx0, idx1, steps)


class MultiviewFrame(NamedTuple):
    rgb: jnp.ndarray  # [H,W,3]
    c2w: jnp.ndarray  # [4,4]
    intrinsic: jnp.ndarray  # [4,4] (fx, fy, cx, cy at downsampled scale)
    rays_o: jnp.ndarray  # [H,W,3]
    rays_d: jnp.ndarray  # [H,W,3]


def _rays_from_intrinsic(c2w, intrinsic, h, w):
    """OPENCV-model rays (x right, y down, z forward) rotated to world."""
    fx, fy = intrinsic[0, 0], intrinsic[1, 1]
    cx, cy = intrinsic[0, 2], intrinsic[1, 2]
    xs = (np.arange(w, dtype=np.float32) + 0.5 - cx) / fx
    ys = (np.arange(h, dtype=np.float32) + 0.5 - cy) / fy
    xx, yy = np.meshgrid(xs, ys)
    dirs = np.stack([xx, yy, np.ones_like(xx)], axis=-1)
    dirs = dirs @ c2w[:3, :3].T
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True) + 1e-9
    origins = np.broadcast_to(c2w[:3, 3], dirs.shape)
    return origins.astype(np.float32), dirs.astype(np.float32)


def _resize_nearest(img, h, w):
    ys = (np.arange(h) * img.shape[0] / h).astype(int)
    xs = (np.arange(w) * img.shape[1] / w).astype(int)
    return img[ys][:, xs]


def interpolate_pose(c2w0, c2w1, ratio):
    """Pose lerp with re-orthonormalized rotation (multiview.py:41-58
    inter_pose, simplified: positional lerp + rotation row lerp +
    Gram-Schmidt)."""
    pos = (1 - ratio) * c2w0[:3, 3] + ratio * c2w1[:3, 3]
    r = (1 - ratio) * c2w0[:3, :3] + ratio * c2w1[:3, :3]
    u, _, vt = np.linalg.svd(r)
    r = u @ vt
    out = np.eye(4, dtype=np.float32)
    out[:3, :3] = r
    out[:3, 3] = pos
    return out


class MultiviewDataModule:
    def __init__(self, cfg: MultiviewConfig):
        self.cfg = cfg
        with open(os.path.join(cfg.dataroot, "transforms.json")) as f:
            camera_dict = json.load(f)
        if camera_dict.get("camera_model", "OPENCV") != "OPENCV":
            raise ValueError("only the OPENCV camera model is supported")
        frames = camera_dict["frames"][:: cfg.train_data_interval]
        scale = cfg.train_downsample_resolution
        self.height = int(frames[0]["h"]) // scale
        self.width = int(frames[0]["w"]) // scale

        c2w_list = np.stack(
            [np.asarray(f["transform_matrix"], np.float32) for f in frames]
        )
        # recenter (multiview.py:109-122)
        c2w_list[:, :3, 3] -= c2w_list[:, :3, 3].mean(0, keepdims=True)
        if cfg.camera_layout == "front":
            if cfg.camera_distance <= 0:
                raise ValueError("front layout needs camera_distance > 0")
            z = np.array([0.0, 0.0, -1.0], np.float32)
            rot_z = (c2w_list[:, :3, :3] @ z).mean(0)
            c2w_list[:, :3, 3] -= rot_z * cfg.camera_distance
        elif cfg.camera_layout != "around":
            raise ValueError(f"unknown camera layout {cfg.camera_layout!r}")

        import imageio.v2 as imageio

        self.frames: list[MultiviewFrame] = []
        for i, fr in enumerate(frames):
            intr = np.eye(4, dtype=np.float32)
            intr[0, 0] = fr["fl_x"] / scale
            intr[1, 1] = fr["fl_y"] / scale
            intr[0, 2] = fr["cx"] / scale
            intr[1, 2] = fr["cy"] / scale
            img = np.asarray(
                imageio.imread(os.path.join(cfg.dataroot, fr["file_path"]))
            ).astype(np.float32) / 255.0
            img = _resize_nearest(img[..., :3], self.height, self.width)
            o, d = _rays_from_intrinsic(
                c2w_list[i], intr, self.height, self.width
            )
            self.frames.append(MultiviewFrame(
                rgb=jnp.asarray(img),
                c2w=jnp.asarray(c2w_list[i]),
                intrinsic=jnp.asarray(intr),
                rays_o=jnp.asarray(o),
                rays_d=jnp.asarray(d),
            ))

    def as_photo_dataset(self, test_every: int = 8):
        """Adapt the posed frames to train/photo.py's PhotoDataset so the
        launcher can drive photometric 3DGS training from a multiview
        capture (the reference registers this datamodule but ships no
        consumer; here it feeds the vanilla 3DGS trainer)."""
        import numpy as np

        from humangaussian_tpu.data.photo import PhotoDataset, PosedImage

        cv2gl = np.diag(np.array([1.0, -1.0, -1.0, 1.0], np.float32))
        posed = []
        for i, fr in enumerate(self.frames):
            intr = np.asarray(fr.intrinsic)
            fovy = 2.0 * np.arctan(0.5 * self.height / intr[1, 1])
            fovx = 2.0 * np.arctan(0.5 * self.width / intr[0, 0])
            posed.append(PosedImage(
                image=np.asarray(fr.rgb, np.float32),
                c2w=(np.asarray(fr.c2w) @ cv2gl).astype(np.float32),
                fovy=float(fovy), fovx=float(fovx), name=f"frame_{i}",
            ))
        train = [p for i, p in enumerate(posed) if i % test_every != 0]
        test = [p for i, p in enumerate(posed) if i % test_every == 0]
        return PhotoDataset(train=train or posed, test=test)

    def __len__(self):
        return len(self.frames)

    def train_frame(self, step: int) -> MultiviewFrame:
        """Deterministic round-robin (batch_size 1, multiview.py:176-194)."""
        return self.frames[step % len(self.frames)]

    def eval_poses(self):
        """Interpolated eval trajectory (or the train poses)."""
        cfg = self.cfg
        if cfg.eval_interpolation is None:
            return [np.asarray(f.c2w) for f in self.frames]
        i0, i1, steps = cfg.eval_interpolation
        a = np.asarray(self.frames[i0].c2w)
        b = np.asarray(self.frames[i1].c2w)
        return [
            interpolate_pose(a, b, r)
            for r in np.linspace(0.0, 1.0, int(steps))
        ]
