"""DeepFloyd IF guidance + fusion='learn' coverage."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from humangaussian_tpu.guidance.deep_floyd import (
    DeepFloydConfig,
    DeepFloydGuidance,
    TINY_IF_CONFIG,
    if_schedule,
)
from humangaussian_tpu.guidance.unet import SingleUNet
from test_sd_guidance import make_embeddings


def make_if_guidance(**cfg_kw):
    rng = jax.random.PRNGKey(0)
    unet = SingleUNet(TINY_IF_CONFIG)
    uparams = unet.init(
        rng, jnp.zeros((1, 16, 16, 3)), jnp.zeros((1,)),
        jnp.zeros((1, 7, TINY_IF_CONFIG.encoder_hid_dim)),
    )
    return DeepFloydGuidance(
        unet=unet, unet_params=uparams, schedule=if_schedule(),
        cfg=DeepFloydConfig(image_size=16, guidance_scale=20.0, **cfg_kw),
    )


def make_t5_embeddings(rng=0, dim=48):
    r = np.random.RandomState(rng)
    mk = lambda *s: jnp.asarray(r.randn(*s).astype(np.float32))
    from humangaussian_tpu.guidance.prompt import PromptEmbeddings

    return PromptEmbeddings(
        text_vd=mk(4, 7, dim), uncond_vd=mk(4, 7, dim),
        text=mk(7, dim), uncond=mk(7, dim), null=mk(7, dim),
    )


class TestDeepFloyd:
    def test_cosine_schedule(self):
        s = if_schedule()
        a = np.asarray(s.alphas_cumprod)
        assert a[0] > 0.99
        assert a[-1] < 0.01
        assert (np.diff(a) < 1e-9).all()  # monotone decreasing

    def test_pixel_space_sds_and_grads(self):
        g = make_if_guidance()
        emb = make_t5_embeddings()
        rng = jax.random.PRNGKey(1)
        elev = jnp.array([10.0, -5.0])
        azim = jnp.array([20.0, 170.0])
        t = jnp.array([300, 600])

        def loss(rgb):
            return g(rgb, emb, elev, azim, t, rng)["loss_sds"]

        rgb = jax.random.uniform(jax.random.PRNGKey(2), (2, 32, 32, 3))
        val, grad = jax.value_and_grad(loss)(rgb)
        assert np.isfinite(float(val))
        assert np.isfinite(np.asarray(grad)).all()
        assert float(jnp.abs(grad).max()) > 0

    def test_variance_half_is_dropped(self):
        """The 6-channel UNet output splits into (eps, variance); only
        eps reaches the gradient (deep_floyd_guidance.py:210-213)."""
        g = make_if_guidance()
        x = jnp.zeros((2, 16, 16, 3))
        out = g.unet.apply(g.unet_params, x, jnp.zeros((2,)),
                           jnp.zeros((2, 7, 48)))
        assert out.shape[-1] == 6
        eps = g._unet_eps(x, jnp.zeros((2,)), jnp.zeros((2, 7, 48)))
        assert eps.shape[-1] == 3
        np.testing.assert_allclose(
            np.asarray(eps), np.asarray(out[..., :3]), atol=1e-6
        )

    def test_perp_neg_path(self):
        g = make_if_guidance(use_perp_neg=True)
        emb = make_t5_embeddings()
        rng = jax.random.PRNGKey(3)
        out = g(jax.random.uniform(rng, (2, 16, 16, 3)), emb,
                jnp.array([0.0, 0.0]), jnp.array([45.0, 120.0]),
                jnp.array([400, 500]), rng)
        assert np.isfinite(float(out["loss_sds"]))

    def test_rgb_as_latents_rejected(self):
        g = make_if_guidance()
        with pytest.raises(ValueError):
            g(jnp.zeros((1, 16, 16, 3)), make_t5_embeddings(),
              jnp.zeros(1), jnp.zeros(1), jnp.array([10]),
              jax.random.PRNGKey(0), rgb_as_latents=True)

    def test_registry(self):
        from humangaussian_tpu import registry

        assert registry.find("deep-floyd-guidance") is not None


class TestLearnFusion:
    def test_learn_fusion_forward_and_convert(self):
        torch = pytest.importorskip("torch")
        from humangaussian_tpu.guidance.unet import (
            DualBranchUNet,
            TINY_TEST_CONFIG,
        )
        from humangaussian_tpu.guidance.convert import convert_unet_state_dict

        cfg = dataclasses.replace(TINY_TEST_CONFIG, fusion="learn")
        rng = jax.random.PRNGKey(4)
        unet = DualBranchUNet(cfg)
        x = jnp.zeros((1, 16, 16, 8))
        params = unet.init(rng, x, x, jnp.zeros((1,)), jnp.zeros((1, 7, 32)),
                           jnp.zeros((1, 6)))
        assert "fusion_conv" in params["params"]
        out = unet.apply(params, x, x, jnp.zeros((1,)),
                         jnp.zeros((1, 7, 32)), jnp.zeros((1, 6)))
        assert out.shape == (1, 16, 16, 8)
        # converter accepts fusion_conv keys
        w = np.zeros((32, 64, 3, 3), np.float32)
        conv, unmatched = convert_unet_state_dict(
            {"fusion_conv.weight": w, "fusion_conv.bias": np.zeros(32)},
            num_levels=2,
        )
        assert unmatched == []
        assert conv["params"]["fusion_conv"]["kernel"].shape == (3, 3, 64, 32)
