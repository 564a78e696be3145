"""ControlNet-conditioned SDS guidance (the reference's alternative
skeleton-conditioning path, threestudio/models/guidance/
stable_diffusion_controlnet_guidance.py, `system.controlnet: true`).

Flax ControlNetModel (diffusers architecture): a copy of the UNet's down
path + mid block, a small conv stack embedding the 512^2 condition image
(the openpose skeleton render) into latent resolution, and zero-
initialized 1x1 convs on every residual output. The residuals are added
to the main UNet's skip connections (UNet2D below supports injection).

SD1.5 geometry by default (cross-attention dim 768, conv attention
projections, 8 heads/level) to match control_v11p_sd15_openpose; tiny
configs mirror guidance/unet.py for tests.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from humangaussian_tpu.guidance.schedule import DiffusionSchedule
from humangaussian_tpu.guidance.unet import (
    DownBlock,
    MidBlock,
    TimestepEmbedding,
    UNetConfig,
    UpBlock,
    _OutputHead,
    sinusoidal_embedding,
)

SD15_CONFIG = UNetConfig(
    in_channels=4,
    out_channels=4,
    cross_attention_dim=768,
    attn_heads=(8, 8, 8, 8),
    use_linear_projection=False,
    num_time_ids=0,  # SD1.5 has no size conditioning
)

TINY_SD_CONFIG = dataclasses.replace(
    SD15_CONFIG,
    block_out_channels=(32, 64),
    layers_per_block=1,
    cross_attention_dim=32,
    attn_heads=(2, 2),
    down_block_has_attn=(True, False),
    norm_num_groups=8,
    dtype=jnp.float32,
)


class UNet2D(nn.Module):
    """Standard single-stream UNet2DConditionModel with optional
    ControlNet residual injection."""

    cfg: UNetConfig = SD15_CONFIG

    @nn.compact
    def __call__(self, sample, timesteps, encoder_hidden_states,
                 down_residuals=None, mid_residual=None):
        c = self.cfg
        n = len(c.block_out_channels)
        t_emb = sinusoidal_embedding(timesteps, c.block_out_channels[0])
        emb = TimestepEmbedding(c.time_embed_dim, c.dtype, name="time_embedding")(
            t_emb.astype(c.dtype)
        )
        context = encoder_hidden_states.astype(c.dtype)
        h = nn.Conv(
            c.block_out_channels[0], (3, 3), padding=1, dtype=c.dtype,
            name="conv_in",
        )(sample.astype(c.dtype))
        res = [h]
        for i in range(n):
            blk = DownBlock(
                c.block_out_channels[i], c.layers_per_block,
                c.down_block_has_attn[i], c.attn_heads[i], c,
                add_downsample=i < n - 1, name=f"down_block_{i}",
            )
            h, rs = blk(h, emb, context)
            res += rs
        h = MidBlock(c, name="mid_block")(h, emb, context)
        if down_residuals is not None:
            res = [r + dr for r, dr in zip(res, down_residuals)]
        if mid_residual is not None:
            h = h + mid_residual
        rev_ch = list(reversed(c.block_out_channels))
        rev_attn = list(reversed(c.down_block_has_attn))
        rev_heads = list(reversed(c.attn_heads))
        for i in range(n):
            blk = UpBlock(
                rev_ch[i], c.layers_per_block + 1, rev_attn[i], rev_heads[i],
                c, add_upsample=i < n - 1, name=f"up_block_{i}",
            )
            h = blk(h, res, emb, context)
        return _OutputHead(c, name="head")(h).astype(jnp.float32)


class ControlNet(nn.Module):
    """Down path + mid of the UNet with zero-conv residual taps."""

    cfg: UNetConfig = SD15_CONFIG
    cond_embed_channels: Sequence[int] = (16, 32, 96, 256)

    @nn.compact
    def __call__(self, sample, timesteps, encoder_hidden_states, cond_image):
        c = self.cfg
        n = len(c.block_out_channels)
        t_emb = sinusoidal_embedding(timesteps, c.block_out_channels[0])
        emb = TimestepEmbedding(c.time_embed_dim, c.dtype, name="time_embedding")(
            t_emb.astype(c.dtype)
        )
        context = encoder_hidden_states.astype(c.dtype)

        # condition image (pixel space, [0,1]) -> latent-res features
        ce = cond_image.astype(c.dtype)
        ce = nn.Conv(self.cond_embed_channels[0], (3, 3), padding=1,
                     dtype=c.dtype, name="cond_conv_in")(ce)
        ce = nn.silu(ce)
        for i, ch in enumerate(self.cond_embed_channels[1:]):
            ce = nn.Conv(ch, (3, 3), padding=1, dtype=c.dtype,
                         name=f"cond_block_{i}a")(ce)
            ce = nn.silu(ce)
            ce = nn.Conv(ch, (3, 3), strides=2, padding=1, dtype=c.dtype,
                         name=f"cond_block_{i}b")(ce)
            ce = nn.silu(ce)
        ce = nn.Conv(
            c.block_out_channels[0], (3, 3), padding=1, dtype=c.dtype,
            kernel_init=nn.initializers.zeros, name="cond_conv_out",
        )(ce)

        h = nn.Conv(c.block_out_channels[0], (3, 3), padding=1, dtype=c.dtype,
                    name="conv_in")(sample.astype(c.dtype))
        h = h + ce
        res = [h]
        for i in range(n):
            blk = DownBlock(
                c.block_out_channels[i], c.layers_per_block,
                c.down_block_has_attn[i], c.attn_heads[i], c,
                add_downsample=i < n - 1, name=f"down_block_{i}",
            )
            h, rs = blk(h, emb, context)
            res += rs
        h = MidBlock(c, name="mid_block")(h, emb, context)

        down_out = []
        for i, r in enumerate(res):
            z = nn.Conv(
                r.shape[-1], (1, 1), dtype=c.dtype,
                kernel_init=nn.initializers.zeros,
                name=f"controlnet_down_block_{i}",
            )(r)
            down_out.append(z)
        mid_out = nn.Conv(
            h.shape[-1], (1, 1), dtype=c.dtype,
            kernel_init=nn.initializers.zeros, name="controlnet_mid_block",
        )(h)
        return down_out, mid_out


@dataclasses.dataclass
class ControlNetGuidance:
    """SDS through a ControlNet-conditioned SD UNet
    (stable_diffusion_controlnet_guidance.py:51,148-176): skeleton image
    conditions the score; plain 2-way CFG; reparameterized SDS loss."""

    unet: UNet2D
    unet_params: Any
    controlnet: ControlNet
    controlnet_params: Any
    vae: Any
    vae_params: Any
    schedule: DiffusionSchedule
    guidance_scale: float = 7.5
    weighting_strategy: str = "sds"
    image_size: int = 512
    condition_scale: float = 1.0

    def encode_images(self, imgs, rng, sample_idx=None):
        from humangaussian_tpu.guidance.dual_branch import (
            VAE_SCALE,
            per_sample_normal,
        )
        from humangaussian_tpu.guidance.vae import sample_latent

        mean, logvar = self.vae.apply(
            self.vae_params, imgs * 2.0 - 1.0, method=self.vae.encode
        )
        if sample_idx is None:
            return sample_latent(mean, logvar, rng) * VAE_SCALE
        eps = per_sample_normal(rng, sample_idx, mean.shape, mean.dtype)
        return (mean + jnp.exp(0.5 * logvar) * eps) * VAE_SCALE

    def __call__(self, control_image, rgb, text_embeddings, t, rng,
                 sample_idx=None):
        """control_image/rgb: [B,H,W,3]; text [2B,L,D] = [cond | uncond];
        returns {loss_sds, grad_norm}."""
        from humangaussian_tpu.guidance.dual_branch import per_sample_normal

        b = rgb.shape[0]
        s = self.image_size
        if sample_idx is None:
            sample_idx = jnp.arange(b, dtype=jnp.int32)
        k_enc, k_noise = jax.random.split(rng)
        rgb512 = jax.image.resize(rgb, (b, s, s, 3), "bilinear")
        cond512 = jax.image.resize(control_image, (b, s, s, 3), "bilinear")
        latents = self.encode_images(rgb512, k_enc, sample_idx)

        noise = per_sample_normal(k_noise, sample_idx, latents.shape)
        noisy = self.schedule.add_noise(
            jax.lax.stop_gradient(latents), noise, t
        )

        lat2 = jnp.tile(noisy, (2, 1, 1, 1))
        cond2 = jnp.tile(cond512, (2, 1, 1, 1))
        t2 = jnp.tile(t, (2,))
        down_res, mid_res = self.controlnet.apply(
            self.controlnet_params, lat2, t2, text_embeddings, cond2
        )
        down_res = [r * self.condition_scale for r in down_res]
        mid_res = mid_res * self.condition_scale
        pred = self.unet.apply(
            self.unet_params, lat2, t2, text_embeddings,
            down_residuals=down_res, mid_residual=mid_res,
        )
        e_text, e_uncond = jnp.split(pred, 2, axis=0)
        noise_pred = e_uncond + self.guidance_scale * (e_text - e_uncond)

        w = self.schedule.sds_weight(t, self.weighting_strategy)
        grad = jnp.nan_to_num(
            w.reshape(b, 1, 1, 1) * (noise_pred - noise)
        )
        target = jax.lax.stop_gradient(latents - grad)
        loss_sds = 0.5 * jnp.sum((latents - target) ** 2) / b
        return {"loss_sds": loss_sds, "grad_norm": jnp.linalg.norm(grad)}
