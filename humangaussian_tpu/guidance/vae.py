"""Flax AutoencoderKL (Stable Diffusion VAE), NHWC / TPU-native.

Re-implements the architecture the reference loads from
`stabilityai/sd-vae-ft-mse` via diffusers
(/root/reference/threestudio/models/guidance/dual_branch_guidance.py:110,
used for all image<->latent transport: encode_images :239-249, decode
:250-267). Layout is NHWC end-to-end (XLA's native conv layout on TPU;
the torch->flax weight converter in guidance/convert.py transposes
kernels), computation in bfloat16 with float32 accumulation by default —
the TPU analogue of the reference's fp16 weights.

Encoder: conv_in -> 4 down blocks (2 resnets each + strided-conv
downsample) -> mid (resnet, single-head attention, resnet) -> GN/silu ->
conv_out -> 2*latent moments -> quant_conv. Decoder mirrors it with 3
resnets per up block and nearest-neighbor upsampling. scaling_factor
0.18215 is applied by the guidance, not here.
"""
from __future__ import annotations

import dataclasses
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp



@dataclasses.dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 4
    block_out_channels: Sequence[int] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    scaling_factor: float = 0.18215
    dtype: jnp.dtype = jnp.bfloat16


def tiny_vae_config() -> VAEConfig:
    return VAEConfig(
        block_out_channels=(32, 64), layers_per_block=1, norm_num_groups=8,
        dtype=jnp.float32,
    )


class ResnetBlock(nn.Module):
    out_channels: int
    groups: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        # flax GroupNorm here, NOT the fused kernel: VAE-encode norms
        # sit on the gradient path and the fused analytic VJP measured
        # 0.62-0.67x XLA's autodiff backward (probe_groupnorm.py); the
        # fused form only wins where no grads flow (the UNet)
        h = nn.GroupNorm(self.groups, epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv1")(h)
        h = nn.GroupNorm(self.groups, epsilon=1e-6, dtype=self.dtype, name="norm2")(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv2")(h)
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="conv_shortcut")(x)
        return x + h


class AttnBlock(nn.Module):
    """Single-head full-channel spatial self-attention (VAE mid block)."""

    groups: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        res = x
        x = nn.GroupNorm(self.groups, epsilon=1e-6, dtype=self.dtype, name="group_norm")(x)
        x = x.reshape(b, h * w, c)
        q = nn.Dense(c, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(c, dtype=self.dtype, name="to_k")(x)
        v = nn.Dense(c, dtype=self.dtype, name="to_v")(x)
        attn = jax.nn.softmax(
            jnp.einsum("bqc,bkc->bqk", q, k, preferred_element_type=jnp.float32)
            / jnp.sqrt(c).astype(jnp.float32),
            axis=-1,
        ).astype(self.dtype)
        x = jnp.einsum("bqk,bkc->bqc", attn, v)
        x = nn.Dense(c, dtype=self.dtype, name="to_out")(x)
        return res + x.reshape(b, h, w, c)


class Encoder(nn.Module):
    cfg: VAEConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        h = nn.Conv(c.block_out_channels[0], (3, 3), padding=1, dtype=c.dtype, name="conv_in")(x)
        for i, ch in enumerate(c.block_out_channels):
            for j in range(c.layers_per_block):
                h = ResnetBlock(ch, c.norm_num_groups, c.dtype, name=f"down_{i}_resnet_{j}")(h)
            if i < len(c.block_out_channels) - 1:
                # diffusers pads (0,1,0,1) then convs stride 2
                h = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
                h = nn.Conv(ch, (3, 3), strides=2, padding="VALID", dtype=c.dtype, name=f"down_{i}_downsample")(h)
        ch = c.block_out_channels[-1]
        h = ResnetBlock(ch, c.norm_num_groups, c.dtype, name="mid_resnet_0")(h)
        h = AttnBlock(c.norm_num_groups, c.dtype, name="mid_attn")(h)
        h = ResnetBlock(ch, c.norm_num_groups, c.dtype, name="mid_resnet_1")(h)
        h = nn.GroupNorm(c.norm_num_groups, epsilon=1e-6, dtype=c.dtype, name="conv_norm_out")(h)
        h = nn.silu(h)
        h = nn.Conv(2 * c.latent_channels, (3, 3), padding=1, dtype=c.dtype, name="conv_out")(h)
        return h


class Decoder(nn.Module):
    cfg: VAEConfig

    @nn.compact
    def __call__(self, z):
        c = self.cfg
        ch = c.block_out_channels[-1]
        h = nn.Conv(ch, (3, 3), padding=1, dtype=c.dtype, name="conv_in")(z)
        h = ResnetBlock(ch, c.norm_num_groups, c.dtype, name="mid_resnet_0")(h)
        h = AttnBlock(c.norm_num_groups, c.dtype, name="mid_attn")(h)
        h = ResnetBlock(ch, c.norm_num_groups, c.dtype, name="mid_resnet_1")(h)
        for i, ch in enumerate(reversed(c.block_out_channels)):
            for j in range(c.layers_per_block + 1):
                h = ResnetBlock(ch, c.norm_num_groups, c.dtype, name=f"up_{i}_resnet_{j}")(h)
            if i < len(c.block_out_channels) - 1:
                b, hh, ww, cc = h.shape
                h = jax.image.resize(h, (b, hh * 2, ww * 2, cc), "nearest")
                h = nn.Conv(ch, (3, 3), padding=1, dtype=c.dtype, name=f"up_{i}_upsample")(h)
        h = nn.GroupNorm(c.norm_num_groups, epsilon=1e-6, dtype=c.dtype, name="conv_norm_out")(h)
        h = nn.silu(h)
        h = nn.Conv(c.out_channels, (3, 3), padding=1, dtype=c.dtype, name="conv_out")(h)
        return h


class AutoencoderKL(nn.Module):
    """encode() returns latent moments; sample with `sample_latent`."""

    cfg: VAEConfig = VAEConfig()

    def setup(self):
        self.encoder = Encoder(self.cfg, name="encoder")
        self.decoder = Decoder(self.cfg, name="decoder")
        self.quant_conv = nn.Conv(
            2 * self.cfg.latent_channels, (1, 1), dtype=self.cfg.dtype, name="quant_conv"
        )
        self.post_quant_conv = nn.Conv(
            self.cfg.latent_channels, (1, 1), dtype=self.cfg.dtype, name="post_quant_conv"
        )

    def encode(self, x):
        """[B,H,W,3] in [-1,1] -> (mean, logvar) [B,h,w,latent]."""
        moments = self.quant_conv(self.encoder(x))
        mean, logvar = jnp.split(moments.astype(jnp.float32), 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)

    def decode(self, z):
        """[B,h,w,latent] -> [B,H,W,3] (pre-clamp)."""
        return self.decoder(self.post_quant_conv(z)).astype(jnp.float32)

    def __call__(self, x, rng):
        mean, logvar = self.encode(x)
        z = sample_latent(mean, logvar, rng)
        return self.decode(z), mean, logvar


def sample_latent(mean, logvar, rng):
    return mean + jnp.exp(0.5 * logvar) * jax.random.normal(
        rng, mean.shape, mean.dtype
    )
