"""Minimal torch mirror of the diffusers AutoencoderKL the reference
loads (`stabilityai/sd-vae-ft-mse`, dual_branch_guidance.py:110).

State-dict keys match diffusers exactly so the production converter
(convert_vae_state_dict) runs on a REAL torch state dict; the forward
executes the real architecture for numeric parity with the Flax VAE.
Note the encoder downsampler's ASYMMETRIC (0,1,0,1) padding — the VAE
convention, distinct from the UNet's symmetric padding=1.
"""
from __future__ import annotations

import torch
import torch.nn as nn
import torch.nn.functional as F


class VAEResnet(nn.Module):
    def __init__(self, in_ch, out_ch, groups):
        super().__init__()
        self.norm1 = nn.GroupNorm(groups, in_ch, eps=1e-6)
        self.conv1 = nn.Conv2d(in_ch, out_ch, 3, padding=1)
        self.norm2 = nn.GroupNorm(groups, out_ch, eps=1e-6)
        self.conv2 = nn.Conv2d(out_ch, out_ch, 3, padding=1)
        self.conv_shortcut = (
            nn.Conv2d(in_ch, out_ch, 1) if in_ch != out_ch else None
        )

    def forward(self, x):
        h = self.conv1(F.silu(self.norm1(x)))
        h = self.conv2(F.silu(self.norm2(h)))
        if self.conv_shortcut is not None:
            x = self.conv_shortcut(x)
        return x + h


class VAEAttention(nn.Module):
    """Single-head full-channel spatial self-attention (post-0.18
    diffusers `Attention` with to_q/to_k/to_v/to_out naming)."""

    def __init__(self, ch, groups):
        super().__init__()
        self.group_norm = nn.GroupNorm(groups, ch, eps=1e-6)
        self.to_q = nn.Linear(ch, ch)
        self.to_k = nn.Linear(ch, ch)
        self.to_v = nn.Linear(ch, ch)
        self.to_out = nn.ModuleList([nn.Linear(ch, ch)])

    def forward(self, x):
        b, c, hh, ww = x.shape
        res = x
        h = self.group_norm(x).permute(0, 2, 3, 1).reshape(b, hh * ww, c)
        q, k, v = self.to_q(h), self.to_k(h), self.to_v(h)
        attn = torch.softmax(q @ k.transpose(-1, -2) / c**0.5, dim=-1)
        h = self.to_out[0](attn @ v)
        return res + h.reshape(b, hh, ww, c).permute(0, 3, 1, 2)


class _Down(nn.Module):
    def __init__(self, in_ch, out_ch, layers, groups, add_downsample):
        super().__init__()
        self.resnets = nn.ModuleList(
            [VAEResnet(in_ch if i == 0 else out_ch, out_ch, groups)
             for i in range(layers)]
        )
        if add_downsample:
            conv = nn.Conv2d(out_ch, out_ch, 3, stride=2, padding=0)
            wrap = nn.Module()
            wrap.conv = conv
            self.downsamplers = nn.ModuleList([wrap])
        else:
            self.downsamplers = None

    def forward(self, x):
        for r in self.resnets:
            x = r(x)
        if self.downsamplers is not None:
            x = F.pad(x, (0, 1, 0, 1))  # diffusers VAE asymmetric pad
            x = self.downsamplers[0].conv(x)
        return x


class _Up(nn.Module):
    def __init__(self, in_ch, out_ch, layers, groups, add_upsample):
        super().__init__()
        self.resnets = nn.ModuleList(
            [VAEResnet(in_ch if i == 0 else out_ch, out_ch, groups)
             for i in range(layers)]
        )
        if add_upsample:
            conv = nn.Conv2d(out_ch, out_ch, 3, padding=1)
            wrap = nn.Module()
            wrap.conv = conv
            self.upsamplers = nn.ModuleList([wrap])
        else:
            self.upsamplers = None

    def forward(self, x):
        for r in self.resnets:
            x = r(x)
        if self.upsamplers is not None:
            x = F.interpolate(x, scale_factor=2.0, mode="nearest")
            x = self.upsamplers[0].conv(x)
        return x


class _Mid(nn.Module):
    def __init__(self, ch, groups):
        super().__init__()
        self.resnets = nn.ModuleList(
            [VAEResnet(ch, ch, groups), VAEResnet(ch, ch, groups)]
        )
        self.attentions = nn.ModuleList([VAEAttention(ch, groups)])

    def forward(self, x):
        x = self.resnets[0](x)
        x = self.attentions[0](x)
        return self.resnets[1](x)


class TorchEncoder(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        chs = list(cfg.block_out_channels)
        g = cfg.norm_num_groups
        self.conv_in = nn.Conv2d(cfg.in_channels, chs[0], 3, padding=1)
        self.down_blocks = nn.ModuleList()
        for i, ch in enumerate(chs):
            self.down_blocks.append(_Down(
                chs[max(i - 1, 0)], ch, cfg.layers_per_block, g,
                add_downsample=i < len(chs) - 1,
            ))
        self.mid_block = _Mid(chs[-1], g)
        self.conv_norm_out = nn.GroupNorm(g, chs[-1], eps=1e-6)
        self.conv_out = nn.Conv2d(chs[-1], 2 * cfg.latent_channels, 3, padding=1)

    def forward(self, x):
        h = self.conv_in(x)
        for b in self.down_blocks:
            h = b(h)
        h = self.mid_block(h)
        return self.conv_out(F.silu(self.conv_norm_out(h)))


class TorchDecoder(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        chs = list(cfg.block_out_channels)
        rev = list(reversed(chs))
        g = cfg.norm_num_groups
        self.conv_in = nn.Conv2d(cfg.latent_channels, rev[0], 3, padding=1)
        self.mid_block = _Mid(rev[0], g)
        self.up_blocks = nn.ModuleList()
        for i, ch in enumerate(rev):
            self.up_blocks.append(_Up(
                rev[max(i - 1, 0)], ch, cfg.layers_per_block + 1, g,
                add_upsample=i < len(rev) - 1,
            ))
        self.conv_norm_out = nn.GroupNorm(g, rev[-1], eps=1e-6)
        self.conv_out = nn.Conv2d(rev[-1], cfg.out_channels, 3, padding=1)

    def forward(self, z):
        h = self.conv_in(z)
        h = self.mid_block(h)
        for b in self.up_blocks:
            h = b(h)
        return self.conv_out(F.silu(self.conv_norm_out(h)))


class TorchAutoencoderKL(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.encoder = TorchEncoder(cfg)
        self.decoder = TorchDecoder(cfg)
        self.quant_conv = nn.Conv2d(
            2 * cfg.latent_channels, 2 * cfg.latent_channels, 1
        )
        self.post_quant_conv = nn.Conv2d(
            cfg.latent_channels, cfg.latent_channels, 1
        )

    def encode_moments(self, x):
        return self.quant_conv(self.encoder(x))

    def decode(self, z):
        return self.decoder(self.post_quant_conv(z))
