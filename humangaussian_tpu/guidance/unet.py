"""Flax dual-branch SD2 UNet (Texture-Structure Joint Model), NHWC.

From-scratch JAX re-implementation of the reference's modified diffusers
`UNet2DConditionModel`
(/root/reference/threestudio/models/guidance/models/unet_rgbdepth.py):
a Stable-Diffusion-2-base UNet (320/640/1280/1280 channels, 2 layers per
block, cross-attention dim 1024, linear attention projections) extended
with a structure (depth) branch:

- branch copies of conv_in, the first `copy_first_n` down blocks, the
  last `copy_last_n` up blocks, conv_norm_out and conv_out
  (unet_rgbdepth.py:292-294,494-499,591-596,606-624);
- the two stems are FUSED (avg) after `copy_first_n` down blocks
  (:1035-1048); the shared trunk + mid + shared up blocks run once;
- the branch up block(s) re-run on a copy of the shared feature using
  the branch's own skip stack (branch stem skips + shared trunk skips,
  :1102-1160);
- `addition_embed_type="time"` micro-conditioning embeds 6 size ids
  (orig HxW, crop, target HxW) through a 256-dim sinusoid + MLP added to
  the time embedding (:405-411,915-924);
- forward consumes 8-channel inputs (4 noisy latent + 4 pose-conditioning
  latent, channel-concatenated by the guidance,
  dual_branch_guidance.py:364-369) and returns the channel-concat of the
  rgb and depth predictions (:1194-1202).

Layout is NHWC (TPU-native); weights bfloat16 by default with fp32
normalization/softmax, mirroring the reference's fp16 inference.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from humangaussian_tpu.ops.groupnorm import GroupNormAct


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    in_channels: int = 8
    out_channels: int = 4
    block_out_channels: Sequence[int] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    cross_attention_dim: int = 1024
    attn_heads: Sequence[int] = (5, 10, 20, 20)  # per level
    down_block_has_attn: Sequence[bool] = (True, True, True, False)
    norm_num_groups: int = 32
    addition_time_embed_dim: int = 256
    num_time_ids: int = 6
    encoder_hid_dim: int | None = None  # e.g. 4096 for DeepFloyd's T5
    branch_num: int = 1
    copy_first_n_block: int = 1
    copy_last_n_block: int = 1
    fusion: str = "avg"
    use_linear_projection: bool = True
    flash_attention: bool = False  # Pallas flash kernel for self-attention
    dtype: jnp.dtype = jnp.bfloat16

    @property
    def time_embed_dim(self) -> int:
        return self.block_out_channels[0] * 4


SD2_BASE_CONFIG = UNetConfig(flash_attention=True)

TINY_TEST_CONFIG = UNetConfig(
    block_out_channels=(32, 64),
    layers_per_block=1,
    cross_attention_dim=32,
    attn_heads=(2, 2),
    down_block_has_attn=(True, False),
    norm_num_groups=8,
    addition_time_embed_dim=16,
    dtype=jnp.float32,
)


def sinusoidal_embedding(
    timesteps, dim: int, flip_sin_to_cos: bool = True, freq_shift: float = 0.0
):
    """diffusers Timesteps: half sin / half cos, optionally flipped."""
    half = dim // 2
    exponent = -math.log(10000.0) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - freq_shift)
    emb = jnp.exp(exponent)[None, :] * timesteps.astype(jnp.float32)[:, None]
    sin, cos = jnp.sin(emb), jnp.cos(emb)
    if flip_sin_to_cos:
        return jnp.concatenate([cos, sin], axis=-1)
    return jnp.concatenate([sin, cos], axis=-1)


class TimestepEmbedding(nn.Module):
    out_dim: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.out_dim, dtype=self.dtype, name="linear_1")(x)
        x = nn.silu(x)
        return nn.Dense(self.out_dim, dtype=self.dtype, name="linear_2")(x)


class ResnetBlock2D(nn.Module):
    out_channels: int
    groups: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x, temb):
        h = GroupNormAct(self.groups, epsilon=1e-5, dtype=self.dtype,
                         silu=True, name="norm1")(x)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv1")(h)
        t = nn.Dense(self.out_channels, dtype=self.dtype, name="time_emb_proj")(
            nn.silu(temb)
        )
        h = h + t[:, None, None, :]
        h = GroupNormAct(self.groups, epsilon=1e-5, dtype=self.dtype,
                         silu=True, name="norm2")(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv2")(h)
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="conv_shortcut")(x)
        return x + h


class Attention(nn.Module):
    heads: int
    dim_head_total: int  # query dim (= channels)
    context_dim: int | None
    dtype: jnp.dtype
    use_flash: bool = False

    @nn.compact
    def __call__(self, x, context=None):
        ctx = x if context is None else context
        inner = self.dim_head_total
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(ctx)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(ctx)
        b, n, _ = q.shape
        m = k.shape[1]
        h = self.heads
        d = inner // h
        q = q.reshape(b, n, h, d)
        k = k.reshape(b, m, h, d)
        v = v.reshape(b, m, h, d)
        if self.use_flash and context is None and n % 128 == 0:
            # Tuned Pallas attention (ops/attention.py): the naive path
            # materializes [b,h,4096,4096] logits for the level-0
            # self-attention — gigabytes of HBM traffic per UNet call —
            # and the stock flash kernel runs this D=64 shape at <10%
            # MFU (60.6 ms vs 7.5 ms measured for [24,5,4096,64]).
            from ..ops.attention import self_attention

            out = self_attention(q, k, v).reshape(b, n, inner).astype(
                self.dtype)
        else:
            logits = jnp.einsum(
                "bnhd,bmhd->bhnm", q, k, preferred_element_type=jnp.float32
            ) / math.sqrt(d)
            attn = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
            out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(b, n, inner)
        return nn.Dense(inner, dtype=self.dtype, name="to_out")(out)


class FeedForward(nn.Module):
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        h = nn.Dense(dim * 8, dtype=self.dtype, name="proj_in")(x)  # geglu
        h, gate = jnp.split(h, 2, axis=-1)
        h = h * nn.gelu(gate, approximate=False)  # torch F.gelu is exact erf
        return nn.Dense(dim, dtype=self.dtype, name="proj_out")(h)


class BasicTransformerBlock(nn.Module):
    heads: int
    context_dim: int
    dtype: jnp.dtype
    use_flash: bool = False

    @nn.compact
    def __call__(self, x, context):
        dim = x.shape[-1]
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        x = x + Attention(
            self.heads, dim, None, self.dtype, self.use_flash, name="attn1"
        )(h)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        x = x + Attention(self.heads, dim, self.context_dim, self.dtype, name="attn2")(
            h, context
        )
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm3")(x)
        return x + FeedForward(self.dtype, name="ff")(h)


class Transformer2D(nn.Module):
    heads: int
    context_dim: int
    groups: int
    use_linear_projection: bool
    dtype: jnp.dtype
    use_flash: bool = False

    @nn.compact
    def __call__(self, x, context):
        b, hh, ww, c = x.shape
        res = x
        h = GroupNormAct(self.groups, epsilon=1e-6, dtype=self.dtype,
                         name="norm")(x)
        h = h.reshape(b, hh * ww, c)
        if self.use_linear_projection:
            h = nn.Dense(c, dtype=self.dtype, name="proj_in")(h)
        else:
            h = nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_in")(
                h.reshape(b, hh, ww, c)
            ).reshape(b, hh * ww, c)
        h = BasicTransformerBlock(
            self.heads, self.context_dim, self.dtype, self.use_flash,
            name="block_0",
        )(h, context)
        if self.use_linear_projection:
            h = nn.Dense(c, dtype=self.dtype, name="proj_out")(h)
            h = h.reshape(b, hh, ww, c)
        else:
            h = nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_out")(
                h.reshape(b, hh, ww, c)
            )
        return h + res


class DownBlock(nn.Module):
    out_channels: int
    layers: int
    has_attn: bool
    heads: int
    cfg: UNetConfig
    add_downsample: bool

    @nn.compact
    def __call__(self, x, temb, context):
        c = self.cfg
        res_out = []
        for i in range(self.layers):
            x = ResnetBlock2D(
                self.out_channels, c.norm_num_groups, c.dtype, name=f"resnet_{i}"
            )(x, temb)
            if self.has_attn:
                x = Transformer2D(
                    self.heads, c.cross_attention_dim, c.norm_num_groups,
                    c.use_linear_projection, c.dtype, c.flash_attention,
                    name=f"attn_{i}",
                )(x, context)
            res_out.append(x)
        if self.add_downsample:
            # diffusers UNet Downsample2D: Conv2d(3x3, stride 2, padding=1)
            # (unet_rgbdepth.py:178 downsample_padding=1). NOT the VAE's
            # asymmetric (0,1) pad — caught by tests/test_torch_parity.py.
            x = nn.Conv(
                self.out_channels, (3, 3), strides=2, padding=1,
                dtype=c.dtype, name="downsample",
            )(x)
            res_out.append(x)
        return x, res_out


class UpBlock(nn.Module):
    out_channels: int
    layers: int
    has_attn: bool
    heads: int
    cfg: UNetConfig
    add_upsample: bool

    @nn.compact
    def __call__(self, x, res_stack, temb, context):
        c = self.cfg
        for i in range(self.layers):
            x = jnp.concatenate([x, res_stack.pop()], axis=-1)
            x = ResnetBlock2D(
                self.out_channels, c.norm_num_groups, c.dtype, name=f"resnet_{i}"
            )(x, temb)
            if self.has_attn:
                x = Transformer2D(
                    self.heads, c.cross_attention_dim, c.norm_num_groups,
                    c.use_linear_projection, c.dtype, c.flash_attention,
                    name=f"attn_{i}",
                )(x, context)
        if self.add_upsample:
            b, hh, ww, ch = x.shape
            x = jax.image.resize(x, (b, hh * 2, ww * 2, ch), "nearest")
            x = nn.Conv(
                self.out_channels, (3, 3), padding=1, dtype=c.dtype, name="upsample"
            )(x)
        return x


class MidBlock(nn.Module):
    cfg: UNetConfig

    @nn.compact
    def __call__(self, x, temb, context):
        c = self.cfg
        ch = c.block_out_channels[-1]
        heads = c.attn_heads[-1]
        x = ResnetBlock2D(ch, c.norm_num_groups, c.dtype, name="resnet_0")(x, temb)
        x = Transformer2D(
            heads, c.cross_attention_dim, c.norm_num_groups,
            c.use_linear_projection, c.dtype, c.flash_attention,
            name="attn_0",
        )(x, context)
        return ResnetBlock2D(ch, c.norm_num_groups, c.dtype, name="resnet_1")(x, temb)


class _OutputHead(nn.Module):
    cfg: UNetConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        x = GroupNormAct(
            c.norm_num_groups, epsilon=1e-5, dtype=c.dtype, silu=True,
            name="conv_norm_out",
        )(x)
        return nn.Conv(
            c.out_channels, (3, 3), padding=1, dtype=c.dtype, name="conv_out"
        )(x)


class SingleUNet(nn.Module):
    """Plain diffusers `UNet2DConditionModel` (no depth branch, no size
    micro-conditioning) — the backbone of the standalone
    stable-diffusion guidance
    (/root/reference/threestudio/models/guidance/stable_diffusion_guidance.py:52-80
    loads `stabilityai/stable-diffusion-2-1-base`'s UNet). Shares every
    block with DualBranchUNet, so the same torch->flax converter and
    parity tests cover it."""

    cfg: UNetConfig = SD2_BASE_CONFIG

    @nn.compact
    def __call__(self, sample, timesteps, encoder_hidden_states):
        c = self.cfg
        n = len(c.block_out_channels)
        t_emb = sinusoidal_embedding(timesteps, c.block_out_channels[0])
        emb = TimestepEmbedding(c.time_embed_dim, c.dtype, name="time_embedding")(
            t_emb.astype(c.dtype)
        )
        context = encoder_hidden_states.astype(c.dtype)
        if c.encoder_hid_dim is not None:
            # diffusers encoder_hid_proj (text_proj): T5 width -> cross
            # attention width (the DeepFloyd IF configuration)
            context = nn.Dense(
                c.cross_attention_dim, dtype=c.dtype, name="encoder_hid_proj"
            )(context)
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
        rev_ch = list(reversed(c.block_out_channels))
        rev_attn = list(reversed(c.down_block_has_attn))
        rev_heads = list(reversed(c.attn_heads))
        for i in range(n):
            blk = UpBlock(
                rev_ch[i], c.layers_per_block + 1, rev_attn[i],
                rev_heads[i], c, add_upsample=i < n - 1,
                name=f"up_block_{i}",
            )
            h = blk(h, res, emb, context)
        out = _OutputHead(c, name="head")(h)
        return out.astype(jnp.float32)


SD2_SINGLE_CONFIG = dataclasses.replace(
    SD2_BASE_CONFIG, in_channels=4
)

TINY_SINGLE_CONFIG = dataclasses.replace(
    TINY_TEST_CONFIG, in_channels=4
)


class DualBranchUNet(nn.Module):
    cfg: UNetConfig = SD2_BASE_CONFIG

    def _down_blocks(self, prefix: str):
        c = self.cfg
        n = len(c.block_out_channels)
        return [
            DownBlock(
                c.block_out_channels[i],
                c.layers_per_block,
                c.down_block_has_attn[i],
                c.attn_heads[i],
                c,
                add_downsample=i < n - 1,
                name=f"{prefix}_{i}",
            )
            for i in range(n)
        ]

    def _up_blocks(self, prefix: str):
        c = self.cfg
        n = len(c.block_out_channels)
        rev_ch = list(reversed(c.block_out_channels))
        rev_attn = list(reversed(c.down_block_has_attn))
        rev_heads = list(reversed(c.attn_heads))
        return [
            UpBlock(
                rev_ch[i],
                c.layers_per_block + 1,
                rev_attn[i],
                rev_heads[i],
                c,
                add_upsample=i < n - 1,
                name=f"{prefix}_{i}",
            )
            for i in range(n)
        ]

    @nn.compact
    def __call__(
        self,
        sample,  # [B,h,w,in_channels] noisy rgb latent (+ pose cond)
        sample_branch,  # [B,h,w,in_channels] noisy depth latent (+ pose
        #     cond); a tuple/list of branch_num inputs when branch_num > 1
        timesteps,  # [B] int/float
        encoder_hidden_states,  # [B,L,cross_attention_dim]
        time_ids,  # [B,num_time_ids]
    ):
        c = self.cfg
        n_down = len(c.block_out_channels)
        first_n = c.copy_first_n_block
        last_n = c.copy_last_n_block

        # ---- time + size embedding (unet_rgbdepth.py:405-411,915-924) --
        t_emb = sinusoidal_embedding(timesteps, c.block_out_channels[0])
        emb = TimestepEmbedding(c.time_embed_dim, c.dtype, name="time_embedding")(
            t_emb.astype(c.dtype)
        )
        b = time_ids.shape[0]
        size_emb = sinusoidal_embedding(
            time_ids.reshape(-1), c.addition_time_embed_dim
        ).reshape(b, c.num_time_ids * c.addition_time_embed_dim)
        emb = emb + TimestepEmbedding(c.time_embed_dim, c.dtype, name="add_embedding")(
            size_emb.astype(c.dtype)
        )

        context = encoder_hidden_states.astype(c.dtype)

        # ---- stems -----------------------------------------------------
        # branch module names: branch 0 keeps the historical un-indexed
        # names (conv_in_branch, down_block_branch_*, head_branch);
        # branches i >= 1 insert the index before the level underscore
        # (conv_in_branch1, down_block_branch1_*, head_branch1) —
        # mirrors torch's `*_branch.{i}` ModuleLists (unet_rgbdepth.py
        # :292-294,494-499,591-596) without breaking saved checkpoints.
        branches = (
            list(sample_branch)
            if isinstance(sample_branch, (list, tuple))
            else [sample_branch]
        )
        if len(branches) != c.branch_num:
            raise ValueError(
                f"got {len(branches)} branch inputs for branch_num="
                f"{c.branch_num}"
            )
        sfx = ["" if i == 0 else str(i) for i in range(c.branch_num)]

        h = nn.Conv(
            c.block_out_channels[0], (3, 3), padding=1, dtype=c.dtype, name="conv_in"
        )(sample.astype(c.dtype))
        h_brs = [
            nn.Conv(
                c.block_out_channels[0], (3, 3), padding=1, dtype=c.dtype,
                name=f"conv_in_branch{sfx[i]}",
            )(branches[i].astype(c.dtype))
            for i in range(c.branch_num)
        ]

        res_main = [h]
        res_brs = [[hb] for hb in h_brs]

        down_blocks = self._down_blocks("down_block")

        for blk in down_blocks[:first_n]:
            h, rs = blk(h, emb, context)
            res_main += rs
        for i in range(c.branch_num):
            for blk in self._down_blocks(
                f"down_block_branch{sfx[i]}"
            )[:first_n]:
                h_brs[i], rs = blk(h_brs[i], emb, context)
                res_brs[i] += rs

        # ---- fusion (unet_rgbdepth.py:1035-1048) -----------------------
        if c.fusion == "avg":
            h = sum(h_brs, h) / (1.0 + c.branch_num)
        elif c.fusion == "sum":
            h = sum(h_brs, h)
        elif c.fusion == "learn":
            # fusion_conv: 3x3 conv over the channel-concat of the
            # branch features (unet_rgbdepth.py:282,1044-1046)
            h = nn.Conv(
                c.block_out_channels[c.copy_first_n_block - 1], (3, 3),
                padding=1, dtype=c.dtype, name="fusion_conv",
            )(jnp.concatenate([h] + h_brs, axis=-1))
        else:
            raise NotImplementedError(f"fusion {c.fusion!r}")

        for blk in down_blocks[first_n:]:
            h, rs = blk(h, emb, context)
            res_main += rs
            for rb in res_brs:
                rb += rs

        h = MidBlock(c, name="mid_block")(h, emb, context)

        # ---- shared up trunk -------------------------------------------
        up_blocks = self._up_blocks("up_block")
        layers_up = c.layers_per_block + 1

        for blk in up_blocks[: n_down - last_n]:
            h = blk(h, res_main, emb, context)
            for rb in res_brs:  # branch stacks popped in lockstep
                del rb[-layers_up:]

        # ---- branch-specific last block(s) on copies --------------------
        h_bs = []
        for i in range(c.branch_num):
            h_b = h
            for blk in self._up_blocks(
                f"up_block_branch{sfx[i]}"
            )[n_down - last_n:]:
                h_b = blk(h_b, res_brs[i], emb, context)
            h_bs.append(h_b)
        for blk in up_blocks[n_down - last_n :]:
            h = blk(h, res_main, emb, context)

        out = _OutputHead(c, name="head")(h)
        outs = [out.astype(jnp.float32)] + [
            _OutputHead(c, name=f"head_branch{sfx[i]}")(h_bs[i]).astype(
                jnp.float32
            )
            for i in range(c.branch_num)
        ]
        return jnp.concatenate(outs, axis=-1)
