"""GAN volume renderer: low-res NeRF + VQGAN-style upsampling generator.

TPU-native port of the reference's `gan-volume-renderer`
(/root/reference/threestudio/models/renderers/gan_volume_renderer.py:19-159)
and its `utils/GAN/` network zoo (vae.py Encoder/Decoder, mobilenet.py
MobileNetV3 global encoder, discriminator.py NLayerDiscriminator,
distribution.py DiagonalGaussianDistribution, loss.py hinge losses).

Design notes (deliberate divergences, documented):
- Flax NHWC modules throughout (the torch code is NCHW); convs run on
  the MXU in bf16 when the caller casts params.
- The reference's `NLayerDiscriminator` defaults to BatchNorm
  (running-stats state, a poor fit for pure-functional jit); we use
  GroupNorm, which is the ActNorm-flavored statefree alternative the
  taming-transformers lineage also ships (`use_actnorm`).
- The reference Decoder *defines* mid blocks but comments them out of
  `forward` (vae.py:620-623); we simply don't build them.
- The global code conditions every ResnetBlock as `temb` exactly like
  the reference (vae.py:117-138 temb_proj path, temb_ch=64).
- `generator_level` / sub-sampling offsets for multi-level guidance are
  PRNG-driven *inside* jit via `lax.switch` (the torch code calls
  `torch.randint(...).item()` on host, a sync point XLA cannot trace).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


def _norm(x):
    g = min(32, x.shape[-1])
    while x.shape[-1] % g:
        g -= 1
    return nn.GroupNorm(num_groups=g, epsilon=1e-6)(x)


class GResBlock(nn.Module):
    """ResnetBlock of the GAN vae (vae.py:80-138): norm-swish-conv x2
    with optional 64-dim code injection after the first conv."""

    out_ch: int
    temb: bool = False

    @nn.compact
    def __call__(self, x, code=None):
        h = nn.silu(_norm(x))
        h = nn.Conv(self.out_ch, (3, 3))(h)
        if self.temb and code is not None:
            h = h + nn.Dense(self.out_ch)(nn.silu(code))[:, None, None, :]
        h = nn.silu(_norm(h))
        h = nn.Conv(self.out_ch, (3, 3))(h)
        if x.shape[-1] != self.out_ch:
            x = nn.Conv(self.out_ch, (1, 1))(x)
        return x + h


class LocalEncoder(nn.Module):
    """vae.py:379-497 Encoder: conv_in, ch_mult downsampling resnet
    pyramid, norm/swish/conv head emitting 2*z_channels (mean|logvar)."""

    ch: int = 32
    ch_mult: Sequence[int] = (1, 2, 4)
    num_res_blocks: int = 1
    z_channels: int = 4

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.ch, (3, 3))(x)
        for i, mult in enumerate(self.ch_mult):
            for _ in range(self.num_res_blocks):
                h = GResBlock(self.ch * mult)(h)
            if i != len(self.ch_mult) - 1:
                h = nn.Conv(h.shape[-1], (3, 3), strides=(2, 2))(h)
        h = GResBlock(h.shape[-1])(h)
        h = GResBlock(h.shape[-1])(h)
        h = nn.silu(_norm(h))
        return nn.Conv(2 * self.z_channels, (3, 3))(h)


class Generator(nn.Module):
    """vae.py:499-645 Decoder: consumes [lr_rgb(3) | z_map(z_channels)]
    at H/4, upsamples 2**(len(ch_mult)-1)x through code-conditioned
    resblocks, and emits a *logit-space residual* on the bilinearly
    upsampled low-res rgb (vae.py:643-644)."""

    ch: int = 64
    ch_mult: Sequence[int] = (1, 2, 4)
    num_res_blocks: int = 1
    z_channels: int = 4
    out_ch: int = 3

    @nn.compact
    def __call__(self, z, code):
        rgb = z[..., :3]
        h = nn.Conv(self.ch * self.ch_mult[-1], (3, 3))(z)  # conv_in3
        for i_level in reversed(range(len(self.ch_mult))):
            for _ in range(self.num_res_blocks + 1):
                h = GResBlock(self.ch * self.ch_mult[i_level], temb=True)(
                    h, code
                )
            if i_level != 0:
                b, hh, ww, c = h.shape
                h = jax.image.resize(h, (b, hh * 2, ww * 2, c), "nearest")
                h = nn.Conv(c, (3, 3))(h)
        h = nn.silu(_norm(h))
        h = nn.Conv(self.out_ch, (3, 3))(h)
        scale = 2 ** (len(self.ch_mult) - 1)
        b, hh, ww, _ = rgb.shape
        rgb_up = jax.image.resize(
            rgb, (b, hh * scale, ww * scale, 3), "bilinear"
        )
        logit = jnp.log(rgb_up.clip(1e-3, 1 - 1e-3) / (
            1.0 - rgb_up.clip(1e-3, 1 - 1e-3)))
        return jax.nn.sigmoid(logit + h)


class _InvertedResidual(nn.Module):
    """MobileNetV3 bneck (mobilenet.py:85-124): pw-expand, dw conv,
    squeeze-excite, pw-project, residual when stride 1 and same ch."""

    out_ch: int
    exp: int
    stride: int = 1
    se: bool = True

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.exp, (1, 1), use_bias=False)(x)
        h = nn.hard_swish(_norm(h))
        h = nn.Conv(self.exp, (3, 3), strides=(self.stride, self.stride),
                    feature_group_count=self.exp, use_bias=False)(h)
        h = nn.hard_swish(_norm(h))
        if self.se:
            s = jnp.mean(h, axis=(1, 2))
            s = nn.relu(nn.Dense(max(self.exp // 4, 8))(s))
            s = nn.hard_sigmoid(nn.Dense(self.exp)(s))
            h = h * s[:, None, None, :]
        h = nn.Conv(self.out_ch, (1, 1), use_bias=False)(h)
        h = _norm(h)
        if self.stride == 1 and x.shape[-1] == self.out_ch:
            h = h + x
        return h


class GlobalEncoder(nn.Module):
    """mobilenet.py:127-253 MobileNetV3(n_class=64): global style code
    from a 224^2 view of the image."""

    code_dim: int = 64

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(16, (3, 3), strides=(2, 2), use_bias=False)(x)
        h = nn.hard_swish(_norm(h))
        for out_ch, exp, stride in (
            (16, 16, 2), (24, 72, 2), (24, 88, 1),
            (40, 96, 2), (48, 144, 1), (96, 288, 2),
        ):
            h = _InvertedResidual(out_ch, exp, stride)(h)
        h = nn.hard_swish(_norm(nn.Conv(576, (1, 1), use_bias=False)(h)))
        h = jnp.mean(h, axis=(1, 2))
        h = nn.hard_swish(nn.Dense(256)(h))
        return nn.Dense(self.code_dim)(h)


class NLayerDiscriminator(nn.Module):
    """PatchGAN (discriminator.py:95-217): 4x4 stride-2 conv stack with
    leaky-relu, final 1-channel patch logits."""

    ndf: int = 64
    n_layers: int = 3

    @nn.compact
    def __call__(self, x):
        h = nn.leaky_relu(nn.Conv(self.ndf, (4, 4), strides=(2, 2))(x), 0.2)
        for n in range(1, self.n_layers + 1):
            mult = min(2 ** n, 8)
            stride = 2 if n < self.n_layers else 1
            h = nn.Conv(self.ndf * mult, (4, 4), strides=(stride, stride),
                        use_bias=False)(h)
            h = nn.leaky_relu(_norm(h), 0.2)
        return nn.Conv(1, (4, 4))(h)


# ---- DiagonalGaussianDistribution (distribution.py:24-102), pure fns --


def diag_gaussian_split(params):
    """params [..., 2z] -> (mean, logvar) with the reference's clamp."""
    mean, logvar = jnp.split(params, 2, axis=-1)
    return mean, jnp.clip(logvar, -30.0, 20.0)


def diag_gaussian_sample(params, key):
    mean, logvar = diag_gaussian_split(params)
    return mean + jnp.exp(0.5 * logvar) * jax.random.normal(
        key, mean.shape, mean.dtype)


def diag_gaussian_mode(params):
    return diag_gaussian_split(params)[0]


def diag_gaussian_kl(params):
    """KL to standard normal, summed over all but the batch axis
    (distribution.py:47-55)."""
    mean, logvar = diag_gaussian_split(params)
    kl = 0.5 * (mean ** 2 + jnp.exp(logvar) - 1.0 - logvar)
    return jnp.sum(kl, axis=tuple(range(1, kl.ndim)))


# ---- hinge GAN losses (loss.py:5-35) ---------------------------------


def hinge_d_loss(logits_real, logits_fake):
    return 0.5 * (jnp.mean(nn.relu(1.0 - logits_real))
                  + jnp.mean(nn.relu(1.0 + logits_fake)))


def generator_loss(disc_apply, disc_params, reconstructions):
    return -jnp.mean(disc_apply(disc_params, reconstructions))


def discriminator_loss(disc_apply, disc_params, inputs, reconstructions):
    logits_real = disc_apply(disc_params, jax.lax.stop_gradient(inputs))
    logits_fake = disc_apply(
        disc_params, jax.lax.stop_gradient(reconstructions))
    return hinge_d_loss(logits_real, logits_fake)


@dataclasses.dataclass(frozen=True)
class GANRendererConfig:
    ch_mult: Sequence[int] = (1, 2, 4)
    z_channels: int = 4
    code_dim: int = 64


class GANVolumeRenderer:
    """gan_volume_renderer.py:19-159: render the base volume renderer at
    H/scale with a latent-emitting material (3 rgb + 2*z latent
    channels), then decode to full resolution with the generator.

    `base` is any renderer exposing `render_image(params, c2w, fovy, h,
    w, ...)` whose comp_rgb carries 3 + 2*z_channels channels (pair with
    `hybrid-rgb-latent-material`)."""

    def __init__(self, base, cfg: GANRendererConfig = GANRendererConfig()):
        self.base = base
        self.cfg = cfg
        self.generator = Generator(
            ch=64, ch_mult=tuple(cfg.ch_mult), z_channels=cfg.z_channels)
        self.local_encoder = LocalEncoder(
            ch=32, ch_mult=tuple(cfg.ch_mult), z_channels=cfg.z_channels)
        self.global_encoder = GlobalEncoder(cfg.code_dim)
        self.discriminator = NLayerDiscriminator()

    @property
    def scale_ratio(self) -> int:
        return 2 ** (len(self.cfg.ch_mult) - 1)

    def init_params(self, rng, base_params, lr_size: int = 32):
        kg, kl, ke, kd = jax.random.split(rng, 4)
        hr = lr_size * self.scale_ratio
        z = jnp.zeros((1, lr_size, lr_size, 3 + self.cfg.z_channels))
        code = jnp.zeros((1, self.cfg.code_dim))
        return {
            "base": base_params,
            "generator": self.generator.init(kg, z, code),
            "local_encoder": self.local_encoder.init(
                kl, jnp.zeros((1, hr, hr, 3))),
            "global_encoder": self.global_encoder.init(
                ke, jnp.zeros((1, 224, 224, 3))),
            "discriminator": self.discriminator.init(
                kd, jnp.zeros((1, hr, hr, 3))),
        }

    def _decode(self, params, lr_rgb, z_map, code_src):
        code = self.global_encoder.apply(
            params["global_encoder"],
            jax.image.resize(
                code_src, (code_src.shape[0], 224, 224, 3), "bilinear"),
        )
        z = jnp.concatenate([lr_rgb, z_map], axis=-1)
        return self.generator.apply(params["generator"], z, code)

    def render_image(self, params, c2w, fovy, height: int, width: int,
                     rng=None, gt_rgb=None, multi_level_guidance=False,
                     **kwargs):
        """Single-camera render; batch via vmap over (c2w, fovy[, rng]).
        Mirrors gan_volume_renderer.py:70-148 including the three
        generator levels when `multi_level_guidance` and gt_rgb given."""
        s = self.scale_ratio
        out = self.base.render_image(
            params["base"], c2w, fovy, height // s, width // s,
            rng=rng, **kwargs)
        full = out["comp_rgb"][None]  # [1, h, w, 3+2z]
        lr_rgb = full[..., :3]
        latent = full[..., 3:]
        out["comp_lr_rgb"] = lr_rgb[0]

        k_lvl, k_z, k_z2 = (
            jax.random.split(rng, 3) if rng is not None
            else (None,) * 3)
        if multi_level_guidance and gt_rgb is not None and rng is not None:
            z_map = diag_gaussian_sample(latent, k_z)
            gt = gt_rgb[None]

            def level0(_):
                return self._decode(params, lr_rgb, z_map, lr_rgb)

            def level1(_):
                return self._decode(params, lr_rgb, z_map, gt)

            def level2(_):
                enc = self.local_encoder.apply(params["local_encoder"], gt)
                z2 = diag_gaussian_sample(enc, k_z2)
                return self._decode(params, lr_rgb, z2, gt)

            level = jax.random.randint(k_lvl, (), 0, 3)
            gan_rgb = jax.lax.switch(level, [level0, level1, level2], None)
            out["generator_level"] = level
            out["posterior_kl"] = diag_gaussian_kl(latent)[0]
        else:
            z_map = diag_gaussian_mode(latent)
            gan_rgb = self._decode(params, lr_rgb, z_map, lr_rgb)
            out["generator_level"] = jnp.zeros((), jnp.int32)
            out["posterior_kl"] = diag_gaussian_kl(latent)[0]

        out["comp_gan_rgb"] = gan_rgb[0]
        out["comp_rgb"] = jax.image.resize(
            lr_rgb, (1, height, width, 3), "bilinear")[0]
        return out
