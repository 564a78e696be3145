"""Single-image-conditioned datamodule (image-to-3D workflows).

TPU-native port of /root/reference/threestudio/data/image.py: one fixed
reference view (RGBA image + optional depth/normal maps) plus random
novel-view camera batches for the SDS term. The torch version wraps a
DataLoader around host tensors; here the fixed view is loaded once into
arrays and the random views come from the same pure-PRNG sampler the
other systems use (data/cameras.py) — no loader processes.

Layout conventions match the reference (:53-136): the reference camera
is placed by (elevation, azimuth, distance) in the z-up world frame,
looks at the origin, and rays use pixel centers with the OpenGL
convention (nerf/renderer.get_rays).
"""
from __future__ import annotations

import dataclasses
import os
from typing import Any, NamedTuple

import jax.numpy as jnp
import numpy as np

from humangaussian_tpu.data.cameras import (
    RandomCameraConfig,
    sample_camera_batch,
)
from humangaussian_tpu.nerf.renderer import get_rays


@dataclasses.dataclass(frozen=True)
class SingleImageConfig:
    """Mirrors SingleImageDataModuleConfig (image.py:33-50)."""

    image_path: str = ""
    height: int = 96
    width: int = 96
    default_elevation_deg: float = 0.0
    default_azimuth_deg: float = -180.0
    default_camera_distance: float = 1.2
    default_fovy_deg: float = 60.0
    use_random_camera: bool = True
    requires_depth: bool = False
    requires_normal: bool = False
    random_camera: RandomCameraConfig = RandomCameraConfig(
        batch_size=1, height=96, width=96
    )


class SingleImageBatch(NamedTuple):
    rgb: jnp.ndarray  # [1,H,W,3]
    mask: jnp.ndarray  # [1,H,W,1]
    rays_o: jnp.ndarray  # [1,H,W,3]
    rays_d: jnp.ndarray  # [1,H,W,3]
    c2w: jnp.ndarray  # [1,4,4]
    elevation: jnp.ndarray  # [1]
    azimuth: jnp.ndarray  # [1]
    camera_distances: jnp.ndarray  # [1]
    fovy: jnp.ndarray  # [1] radians
    depth: Any = None  # [1,H,W,1] if requires_depth
    normal: Any = None  # [1,H,W,3] if requires_normal


def _camera_from_angles(elev_deg, azim_deg, distance):
    """z-up world, camera looking at the origin (image.py:75-106 /
    uncond.py:379-495 conventions)."""
    elev = np.deg2rad(elev_deg)
    azim = np.deg2rad(azim_deg)
    pos = np.array(
        [
            distance * np.cos(elev) * np.cos(azim),
            distance * np.cos(elev) * np.sin(azim),
            distance * np.sin(elev),
        ],
        np.float32,
    )
    center = np.zeros(3, np.float32)
    up = np.array([0.0, 0.0, 1.0], np.float32)
    lookat = center - pos
    lookat /= np.linalg.norm(lookat)
    right = np.cross(lookat, up)
    right /= np.linalg.norm(right)
    up2 = np.cross(right, lookat)
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, 0] = right
    c2w[:3, 1] = up2
    c2w[:3, 2] = -lookat
    c2w[:3, 3] = pos
    return c2w


def _load_rgba(path: str, height: int, width: int):
    import imageio.v2 as imageio

    img = np.asarray(imageio.imread(path)).astype(np.float32) / 255.0
    if img.shape[:2] != (height, width):
        # nearest-resize on host (cv2-free)
        ys = (np.arange(height) * img.shape[0] / height).astype(int)
        xs = (np.arange(width) * img.shape[1] / width).astype(int)
        img = img[ys][:, xs]
    if img.shape[-1] == 4:
        rgb, mask = img[..., :3], img[..., 3:4]
        rgb = rgb * mask  # premultiply like the reference (:168-172)
    else:
        rgb, mask = img[..., :3], np.ones_like(img[..., :1])
    return rgb, (mask > 0.5).astype(np.float32)


class SingleImageDataModule:
    """Holds the fixed reference view + hands out random-camera batches.

    `fixed_batch()` -> SingleImageBatch (the supervision view);
    `random_batch(key, step)` -> CameraBatch for the guidance term."""

    def __init__(self, cfg: SingleImageConfig):
        self.cfg = cfg
        rgb, mask = _load_rgba(cfg.image_path, cfg.height, cfg.width)
        c2w = _camera_from_angles(
            cfg.default_elevation_deg, cfg.default_azimuth_deg,
            cfg.default_camera_distance,
        )
        fovy = float(np.deg2rad(cfg.default_fovy_deg))
        rays_o, rays_d = get_rays(
            jnp.asarray(c2w), fovy, cfg.height, cfg.width
        )
        depth = normal = None
        stem, _ = os.path.splitext(cfg.image_path)
        base = stem[: -len("_rgba")] if stem.endswith("_rgba") else stem
        if cfg.requires_depth:
            d, _ = _load_rgba(base + "_depth.png", cfg.height, cfg.width)
            depth = jnp.asarray(d[..., :1])[None]
        if cfg.requires_normal:
            nrm, _ = _load_rgba(base + "_normal.png", cfg.height, cfg.width)
            normal = jnp.asarray(nrm * 2.0 - 1.0)[None]
        self._batch = SingleImageBatch(
            rgb=jnp.asarray(rgb)[None],
            mask=jnp.asarray(mask)[None],
            rays_o=rays_o[None],
            rays_d=rays_d[None],
            c2w=jnp.asarray(c2w)[None],
            elevation=jnp.asarray([cfg.default_elevation_deg]),
            azimuth=jnp.asarray([cfg.default_azimuth_deg]),
            camera_distances=jnp.asarray([cfg.default_camera_distance]),
            fovy=jnp.asarray([fovy]),
            depth=depth,
            normal=normal,
        )

    def fixed_batch(self) -> SingleImageBatch:
        return self._batch

    def random_batch(self, key, step):
        if not self.cfg.use_random_camera:
            raise ValueError("use_random_camera is disabled")
        return sample_camera_batch(key, step, self.cfg.random_camera)
