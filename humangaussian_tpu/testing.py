"""Shared miniature fixtures: tiny end-to-end system without model files.

Used by the test-suite and the driver entry points: a complete
GaussianDreamer stack (toy SMPL-X body, tiny randomly-initialized
dual-branch UNet + VAE, small scene capacity, 64x64 renders) that runs
the REAL code paths — tiled Pallas rasterizer, ANPG guidance,
densification — in seconds on a CPU mesh.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

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


def tiny_guidance():
    rng = jax.random.PRNGKey(0)
    unet = DualBranchUNet(TINY_TEST_CONFIG)
    x = jnp.zeros((1, 8, 8, 8))
    uparams = unet.init(
        rng, x, x, jnp.zeros((1,)), jnp.zeros((1, 7, 32)), jnp.zeros((1, 6))
    )
    vae = AutoencoderKL(tiny_vae_config())
    vparams = vae.init(rng, jnp.zeros((1, 16, 16, 3)), rng)
    return DualBranchGuidance(
        unet=unet,
        unet_params=uparams,
        vae=vae,
        vae_params=vparams,
        schedule=DiffusionSchedule.create(),
        cfg=GuidanceConfig(latent_size=8, image_size=16, guidance_scale=7.5),
    )


def tiny_prompt_embeddings():
    rng = jax.random.PRNGKey(0)
    return PromptEmbeddings(
        text_vd=jax.random.normal(rng, (4, 7, 32)),
        uncond_vd=jax.random.normal(jax.random.PRNGKey(1), (4, 7, 32)),
        text=jnp.zeros((7, 32)),
        uncond=jnp.zeros((7, 32)),
        null=jnp.zeros((7, 32)),
    )


def tiny_system(capacity: int = 2048, batch: int = 2,
                raster_cfg: RasterizeConfig | None = None
                ) -> GaussianDreamerSystem:
    skel = (
        Skeleton(style="humansd", apose=True).load_smplx(toy_model()).scale(-10)
    )
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
    if raster_cfg is None:
        raster_cfg = RasterizeConfig(tile=32, max_tiles_per_gaussian=16)
    return GaussianDreamerSystem(
        cfg,
        skel,
        tiny_guidance(),
        tiny_prompt_embeddings(),
        camera_cfg=cam_cfg,
        raster_cfg=raster_cfg,
    )
