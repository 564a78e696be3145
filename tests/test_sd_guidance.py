"""Standalone Stable-Diffusion guidance: formula and parity tests."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from humangaussian_tpu.guidance.prompt import (
    PromptEmbeddings,
    get_text_embeddings_perp_neg,
    perpendicular_component,
)
from humangaussian_tpu.guidance.stable_diffusion import (
    SDGuidanceConfig,
    StableDiffusionGuidance,
    sd_eps_schedule,
)
from humangaussian_tpu.guidance.unet import SingleUNet, TINY_SINGLE_CONFIG
from humangaussian_tpu.guidance.vae import AutoencoderKL, tiny_vae_config


def make_embeddings(rng=0):
    r = np.random.RandomState(rng)
    mk = lambda *s: jnp.asarray(r.randn(*s).astype(np.float32))
    return PromptEmbeddings(
        text_vd=mk(4, 7, 32), uncond_vd=mk(4, 7, 32),
        text=mk(7, 32), uncond=mk(7, 32), null=mk(7, 32),
    )


def make_sd_guidance(**cfg_kw):
    rng = jax.random.PRNGKey(0)
    unet = SingleUNet(TINY_SINGLE_CONFIG)
    uparams = unet.init(
        rng, jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,)), jnp.zeros((1, 7, 32))
    )
    vae = AutoencoderKL(tiny_vae_config())
    vparams = vae.init(rng, jnp.zeros((1, 16, 16, 3)), rng)
    cfg = SDGuidanceConfig(
        latent_size=8, image_size=16, guidance_scale=7.5, **cfg_kw
    )
    return StableDiffusionGuidance(
        unet=unet, unet_params=uparams, vae=vae, vae_params=vparams,
        schedule=sd_eps_schedule(), cfg=cfg,
    )


class TestSDGuidance:
    def test_loss_and_gradient_flow(self):
        g = make_sd_guidance()
        emb = make_embeddings()
        rng = jax.random.PRNGKey(3)
        elev = jnp.array([10.0, 20.0])
        azim = jnp.array([30.0, 160.0])
        t = jnp.array([300, 700])

        def loss(rgb):
            out = g(rgb, emb, elev, azim, t, rng)
            return out["loss_sds"]

        rgb = jax.random.uniform(jax.random.PRNGKey(4), (2, 16, 16, 3))
        val, grad = jax.value_and_grad(loss)(rgb)
        assert np.isfinite(float(val))
        assert np.isfinite(np.asarray(grad)).all()
        assert float(jnp.abs(grad).max()) > 0

    def test_sds_formula_matches_reference(self):
        """grad must be w(t)*(e_text + s*(e_text-e_uncond) - noise)
        on a 2-way [cond|uncond] batch (stable_diffusion_guidance.py:
        243-251,264-267) with rgb_as_latents (no VAE in the loop)."""
        g = make_sd_guidance(view_dependent_prompting=False)
        emb = make_embeddings()
        rng = jax.random.PRNGKey(5)
        elev = jnp.array([0.0])
        azim = jnp.array([0.0])
        t = jnp.array([400])
        lat_img = jax.random.normal(jax.random.PRNGKey(6), (1, 8, 8, 4)) * 0.2
        out = g(lat_img, emb, elev, azim, t, rng, rgb_as_latents=True)

        # manual recomputation
        b = 1
        _, k_noise = jax.random.split(rng)
        from humangaussian_tpu.guidance.dual_branch import per_sample_normal

        latents = jax.image.resize(lat_img, (1, 8, 8, 4), "bilinear")
        noise = per_sample_normal(
            k_noise, jnp.arange(1, dtype=jnp.int32), latents.shape
        )
        noisy = g.schedule.add_noise(latents, noise, t)
        text3 = emb.get_text_embeddings(elev, azim, None, False)
        pred = g._unet_eps(
            jnp.tile(noisy, (2, 1, 1, 1)), jnp.tile(t, (2,)), text3[:2]
        )
        e_text, e_unc = jnp.split(pred, 2, axis=0)
        noise_pred = e_text + 7.5 * (e_text - e_unc)
        w = g.schedule.sds_weight(t, "sds").reshape(1, 1, 1, 1)
        grad = w * (noise_pred - noise)
        expected = 0.5 * jnp.sum(
            (latents - jax.lax.stop_gradient(latents - grad)) ** 2
        )
        np.testing.assert_allclose(
            float(out["loss_sds"]), float(expected), rtol=1e-5
        )

    def test_perp_neg_path(self):
        g = make_sd_guidance(use_perp_neg=True)
        emb = make_embeddings()
        rng = jax.random.PRNGKey(7)
        elev = jnp.array([5.0, 5.0])
        azim = jnp.array([30.0, 150.0])
        t = jnp.array([500, 500])
        rgb = jax.random.uniform(jax.random.PRNGKey(8), (2, 16, 16, 3))
        out = g(rgb, emb, elev, azim, t, rng)
        assert np.isfinite(float(out["loss_sds"]))
        # perp component really is perpendicular
        x = jax.random.normal(jax.random.PRNGKey(9), (2, 4, 4, 4))
        y = jax.random.normal(jax.random.PRNGKey(10), (2, 4, 4, 4))
        p = perpendicular_component(x, y)
        dots = jnp.sum(p * y, axis=(1, 2, 3))
        np.testing.assert_allclose(np.asarray(dots), 0.0, atol=1e-4)

    def test_eps_schedule_is_not_zero_snr(self):
        s = sd_eps_schedule()
        assert s.prediction_type == "epsilon"
        assert float(s.alphas_cumprod[-1]) > 0.0  # no terminal-SNR rescale


class TestSingleUNetTorchParity:
    def test_tiny_single_unet(self):
        torch = pytest.importorskip("torch")
        from torch_unet_mirror import TorchSingleUNet
        from humangaussian_tpu.guidance.convert import convert_unet_state_dict

        cfg = TINY_SINGLE_CONFIG
        torch.manual_seed(11)
        tm = TorchSingleUNet(cfg).eval()
        sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
        params, unmatched = convert_unet_state_dict(
            sd, num_levels=len(cfg.block_out_channels)
        )
        assert unmatched == [], unmatched

        r = np.random.RandomState(12)
        x = r.randn(2, 16, 16, 4).astype(np.float32)
        t = np.array([11.0, 600.0], np.float32)
        ctx = r.randn(2, 7, cfg.cross_attention_dim).astype(np.float32)
        out_flax = SingleUNet(cfg).apply(
            params, jnp.asarray(x), jnp.asarray(t), jnp.asarray(ctx)
        )
        with torch.no_grad():
            out_torch = tm(
                torch.tensor(np.moveaxis(x, -1, 1).copy()),
                torch.tensor(t), torch.tensor(ctx),
            )
        out_torch = np.moveaxis(out_torch.numpy(), 1, -1)
        scale = np.abs(out_torch).max() + 1e-8
        np.testing.assert_allclose(
            np.asarray(out_flax) / scale, out_torch / scale, atol=2e-5
        )
