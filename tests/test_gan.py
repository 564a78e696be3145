"""gan-volume-renderer: networks, distribution, losses, full render.

Covers the reference block at
/root/reference/threestudio/models/renderers/gan_volume_renderer.py and
/root/reference/threestudio/utils/GAN/{vae,mobilenet,discriminator,
distribution,loss}.py.
"""
import jax
import jax.numpy as jnp
import numpy as np

from humangaussian_tpu.nerf import (
    ImplicitVolume,
    ImplicitVolumeConfig,
    NerfVolumeRenderer,
    RendererConfig,
    SolidColorBackground,
)
from humangaussian_tpu.nerf.encoding import HashGridConfig
from humangaussian_tpu.nerf.gan import (
    GANRendererConfig,
    GANVolumeRenderer,
    Generator,
    GlobalEncoder,
    LocalEncoder,
    NLayerDiscriminator,
    diag_gaussian_kl,
    diag_gaussian_mode,
    diag_gaussian_sample,
    discriminator_loss,
    generator_loss,
    hinge_d_loss,
)
from humangaussian_tpu.nerf.material import HybridRGBLatentMaterial
from humangaussian_tpu.registry import find

Z = 2  # small latent for tests (reference default z_channels=4)


def _gan_renderer():
    geo = ImplicitVolume(ImplicitVolumeConfig(
        encoding="hashgrid",
        hash_cfg=HashGridConfig(n_levels=2, log2_hashmap_size=10,
                                base_resolution=4),
        n_neurons=16, n_hidden_layers=1,
        n_feature_dims=3 + 2 * Z,
    ))
    base = NerfVolumeRenderer(
        geo, HybridRGBLatentMaterial(),
        SolidColorBackground(color=(1.0,) * (3 + 2 * Z)),
        RendererConfig(num_samples_per_ray=8, randomized=False),
    )
    return GANVolumeRenderer(base, GANRendererConfig(
        ch_mult=(1, 2, 4), z_channels=Z))


class TestNetworks:
    def test_generator_upsamples_4x_and_stays_in_01(self):
        gen = Generator(ch=8, ch_mult=(1, 2, 4), z_channels=Z)
        z = jax.random.uniform(jax.random.PRNGKey(0), (1, 8, 8, 3 + Z))
        code = jnp.zeros((1, 64))
        out = gen.apply(gen.init(jax.random.PRNGKey(1), z, code), z, code)
        assert out.shape == (1, 32, 32, 3)
        assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0

    def test_local_encoder_downsamples_to_2z(self):
        enc = LocalEncoder(ch=8, ch_mult=(1, 2, 4), z_channels=Z)
        x = jnp.zeros((1, 32, 32, 3))
        out = enc.apply(enc.init(jax.random.PRNGKey(0), x), x)
        assert out.shape == (1, 8, 8, 2 * Z)

    def test_global_encoder_code_dim(self):
        enc = GlobalEncoder(code_dim=64)
        x = jnp.zeros((1, 224, 224, 3))
        out = enc.apply(enc.init(jax.random.PRNGKey(0), x), x)
        assert out.shape == (1, 64)

    def test_discriminator_patch_logits(self):
        d = NLayerDiscriminator(ndf=8, n_layers=3)
        x = jnp.zeros((2, 64, 64, 3))
        out = d.apply(d.init(jax.random.PRNGKey(0), x), x)
        assert out.shape[0] == 2 and out.shape[-1] == 1
        assert out.shape[1] < 64  # patch grid, not per-pixel


class TestDistribution:
    def test_mode_is_mean_and_sample_varies(self):
        p = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 4, 2 * Z))
        mode = diag_gaussian_mode(p)
        np.testing.assert_allclose(mode, p[..., :Z])
        s1 = diag_gaussian_sample(p, jax.random.PRNGKey(1))
        s2 = diag_gaussian_sample(p, jax.random.PRNGKey(2))
        assert float(jnp.abs(s1 - s2).max()) > 0.0

    def test_kl_zero_at_standard_normal(self):
        p = jnp.zeros((1, 4, 4, 2 * Z))  # mean 0, logvar 0
        np.testing.assert_allclose(diag_gaussian_kl(p), 0.0, atol=1e-6)
        shifted = p.at[..., :Z].set(1.0)
        assert float(diag_gaussian_kl(shifted)[0]) > 0.0


class TestLosses:
    def test_hinge_d_loss_perfect_discriminator(self):
        # real logits >= 1, fake <= -1 -> zero loss (loss.py:16-20)
        assert float(hinge_d_loss(jnp.full((4,), 2.0),
                                  jnp.full((4,), -2.0))) == 0.0
        assert float(hinge_d_loss(jnp.zeros((4,)), jnp.zeros((4,)))) == 1.0

    def test_gen_and_disc_losses_oppose(self):
        d = NLayerDiscriminator(ndf=8, n_layers=2)
        x = jax.random.uniform(jax.random.PRNGKey(0), (1, 32, 32, 3))
        dp = d.init(jax.random.PRNGKey(1), x)
        apply = lambda p, im: d.apply(p, im)
        g = generator_loss(apply, dp, x)
        dl = discriminator_loss(apply, dp, x, x)
        assert np.isfinite(g) and np.isfinite(dl)
        # identical real/fake: 0.5*(relu(1-l)+relu(1+l)) >= 1 pointwise
        assert float(dl) >= 1.0 - 1e-5


class TestGANVolumeRenderer:
    def test_render_shapes_and_range(self):
        r = _gan_renderer()
        params = r.init_params(
            jax.random.PRNGKey(0),
            r.base.init_params(jax.random.PRNGKey(1)), lr_size=8)
        c2w = jnp.eye(4)[:3].at[2, 3].set(2.5)
        out = r.render_image(params, c2w, 0.8, 32, 32,
                             rng=jax.random.PRNGKey(2))
        assert out["comp_gan_rgb"].shape == (32, 32, 3)
        assert out["comp_rgb"].shape == (32, 32, 3)
        assert out["comp_lr_rgb"].shape == (8, 8, 3)
        assert float(out["comp_gan_rgb"].min()) >= 0.0
        assert float(out["comp_gan_rgb"].max()) <= 1.0
        assert np.isfinite(float(out["posterior_kl"]))

    def test_multi_level_guidance_switches_levels(self):
        r = _gan_renderer()
        params = r.init_params(
            jax.random.PRNGKey(0),
            r.base.init_params(jax.random.PRNGKey(1)), lr_size=8)
        c2w = jnp.eye(4)[:3].at[2, 3].set(2.5)
        gt = jnp.full((32, 32, 3), 0.5)
        levels = set()
        for seed in range(8):
            out = r.render_image(
                params, c2w, 0.8, 32, 32, rng=jax.random.PRNGKey(seed),
                gt_rgb=gt, multi_level_guidance=True)
            levels.add(int(out["generator_level"]))
            assert out["comp_gan_rgb"].shape == (32, 32, 3)
        assert len(levels) >= 2  # PRNG-driven lax.switch actually varies

    def test_gradients_flow_to_generator_and_base(self):
        r = _gan_renderer()
        params = r.init_params(
            jax.random.PRNGKey(0),
            r.base.init_params(jax.random.PRNGKey(1)), lr_size=8)
        c2w = jnp.eye(4)[:3].at[2, 3].set(2.5)

        def loss(p):
            out = r.render_image(p, c2w, 0.8, 32, 32,
                                 rng=jax.random.PRNGKey(2))
            return jnp.mean((out["comp_gan_rgb"] - 0.3) ** 2)

        g = jax.grad(loss)(params)
        gen_norm = sum(
            float(jnp.abs(x).sum()) for x in jax.tree.leaves(g["generator"]))
        base_norm = sum(
            float(jnp.abs(x).sum()) for x in jax.tree.leaves(g["base"]))
        assert gen_norm > 0.0
        assert base_norm > 0.0

    def test_registry(self):
        assert find("gan-volume-renderer") is GANVolumeRenderer
