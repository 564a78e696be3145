"""ControlNet guidance: zero-init taps, residual injection, SDS grads."""
import jax
import jax.numpy as jnp
import numpy as np

from humangaussian_tpu.guidance.controlnet import (
    ControlNet,
    ControlNetGuidance,
    TINY_SD_CONFIG,
    UNet2D,
)
from humangaussian_tpu.guidance.schedule import DiffusionSchedule
from humangaussian_tpu.guidance.vae import AutoencoderKL, tiny_vae_config

RNG = jax.random.PRNGKey(0)


def build():
    unet = UNet2D(TINY_SD_CONFIG)
    x = jnp.ones((2, 8, 8, 4))
    ctx = jnp.ones((2, 7, 32))
    up = unet.init(RNG, x, jnp.array([1.0, 2.0]), ctx)
    cn = ControlNet(TINY_SD_CONFIG, cond_embed_channels=(8, 16))
    cond = jnp.ones((2, 16, 16, 3))
    cp = cn.init(RNG, x, jnp.array([1.0, 2.0]), ctx, cond)
    return unet, up, cn, cp, x, ctx, cond


class TestControlNet:
    def test_zero_init_taps_are_identity(self):
        unet, up, cn, cp, x, ctx, cond = build()
        t = jnp.array([1.0, 2.0])
        base = unet.apply(up, x, t, ctx)
        dres, mres = cn.apply(cp, x, t, ctx, cond)
        assert all(float(jnp.abs(r).max()) == 0.0 for r in dres)
        assert float(jnp.abs(mres).max()) == 0.0
        injected = unet.apply(
            up, x, t, ctx, down_residuals=dres, mid_residual=mres
        )
        np.testing.assert_allclose(np.asarray(injected), np.asarray(base))

    def test_residual_count_matches_skips(self):
        unet, up, cn, cp, x, ctx, cond = build()
        dres, _ = cn.apply(cp, x, jnp.array([1.0, 2.0]), ctx, cond)
        # conv_in + (layers + maybe downsample) per level for tiny config:
        # level0: 1 resnet + downsample, level1: 1 resnet -> 1+2+1 = 4
        assert len(dres) == 4

    def test_nonzero_taps_change_output(self):
        unet, up, cn, cp, x, ctx, cond = build()
        t = jnp.array([1.0, 2.0])
        dres, mres = cn.apply(cp, x, t, ctx, cond)
        base = unet.apply(up, x, t, ctx)
        bumped = unet.apply(
            up, x, t, ctx,
            down_residuals=[r + 0.1 for r in dres],
            mid_residual=mres + 0.1,
        )
        assert float(jnp.abs(bumped - base).max()) > 1e-4


class TestControlNetGuidance:
    def test_sds_loss_and_grad(self):
        unet, up, cn, cp, _, _, _ = build()
        vae = AutoencoderKL(tiny_vae_config())
        vp = vae.init(RNG, jnp.zeros((1, 16, 16, 3)), RNG)
        g = ControlNetGuidance(
            unet=unet, unet_params=up, controlnet=cn, controlnet_params=cp,
            vae=vae, vae_params=vp,
            schedule=DiffusionSchedule.create(prediction_type="epsilon"),
            image_size=16,
        )
        text2 = jax.random.normal(jax.random.PRNGKey(1), (4, 7, 32))

        def loss(rgb):
            return g(
                jnp.zeros((2, 16, 16, 3)), rgb, text2,
                jnp.array([300, 600]), jax.random.PRNGKey(2),
            )["loss_sds"]

        l, grad = jax.value_and_grad(loss)(jnp.full((2, 16, 16, 3), 0.5))
        assert np.isfinite(float(l))
        assert float(jnp.abs(grad).max()) > 0

    def test_converter_key_coverage(self):
        """Synthetic diffusers-style controlnet state dict converts onto
        the tiny flax module with full coverage."""
        from humangaussian_tpu.guidance.convert import (
            convert_controlnet_state_dict,
        )

        _, _, cn, cp, *_ = build()
        flat = jax.tree_util.tree_flatten_with_path(cp)[0]
        ref_paths = {
            "/".join(str(p)[2:-2] for p in path): leaf.shape
            for path, leaf in flat
        }

        def inv_conv(k):
            return np.transpose(np.asarray(k), (3, 2, 0, 1))

        sd = {}
        p = cp["params"]
        name_map = {
            "conv_in": "conv_in",
            "cond_conv_in": "controlnet_cond_embedding.conv_in",
            "cond_conv_out": "controlnet_cond_embedding.conv_out",
            "cond_block_0a": "controlnet_cond_embedding.blocks.0",
            "cond_block_0b": "controlnet_cond_embedding.blocks.1",
            "controlnet_mid_block": "controlnet_mid_block",
        }
        for i in range(4):
            name_map[f"controlnet_down_block_{i}"] = f"controlnet_down_blocks.{i}"
        for ours, theirs in name_map.items():
            sd[f"{theirs}.weight"] = inv_conv(p[ours]["kernel"])
            sd[f"{theirs}.bias"] = np.asarray(p[ours]["bias"])
        for te in ("linear_1", "linear_2"):
            sd[f"time_embedding.{te}.weight"] = np.transpose(
                np.asarray(p["time_embedding"][te]["kernel"])
            )
            sd[f"time_embedding.{te}.bias"] = np.asarray(
                p["time_embedding"][te]["bias"]
            )
        # down/mid blocks reuse the UNet exporter from test_guidance
        from test_guidance import _RESNET_SC, _RESNET_T, _TRANS_T, _torch_leaves

        _torch_leaves(p["down_block_0"]["resnet_0"], "down_blocks.0.resnets.0", _RESNET_T, sd)
        _torch_leaves(p["down_block_0"]["attn_0"], "down_blocks.0.attentions.0", _TRANS_T, sd)
        sd["down_blocks.0.downsamplers.0.conv.weight"] = inv_conv(
            p["down_block_0"]["downsample"]["kernel"]
        )
        sd["down_blocks.0.downsamplers.0.conv.bias"] = np.asarray(
            p["down_block_0"]["downsample"]["bias"]
        )
        _torch_leaves(p["down_block_1"]["resnet_0"], "down_blocks.1.resnets.0", _RESNET_SC, sd)
        _torch_leaves(p["mid_block"]["resnet_0"], "mid_block.resnets.0", _RESNET_T, sd)
        _torch_leaves(p["mid_block"]["attn_0"], "mid_block.attentions.0", _TRANS_T, sd)
        _torch_leaves(p["mid_block"]["resnet_1"], "mid_block.resnets.1", _RESNET_T, sd)

        converted, unmatched = convert_controlnet_state_dict(sd)
        assert unmatched == [], unmatched
        conv_flat = jax.tree_util.tree_flatten_with_path(converted)[0]
        conv_paths = {
            "/".join(str(pp)[2:-2] for pp in path): leaf.shape
            for path, leaf in conv_flat
        }
        assert set(conv_paths) == set(ref_paths)
        for k in ref_paths:
            assert conv_paths[k] == ref_paths[k], k
